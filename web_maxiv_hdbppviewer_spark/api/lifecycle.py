"""The three query lifecycles of the reference server, engine-side
(SURVEY §3): /query raw+resampled data, /image pre-render aggregates,
/attributes catalog search.

Spark lifecycle (SURVEY §3.1 "Spark lifecycle equivalent"): request ->
DataFrame expression -> Catalyst optimized plan (partition pruning replaces
the reference's hand-built day fan-out, pushdown replaces its incremental
lower-bound scan) -> only bounded aggregates (pixels, extrema, capped
search) ever reach the driver.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import (
    datetime_to_epoch_us, epoch_us, push_time_filter, utc_ts_lit,
)
from ..operators.extrema import pad_range, series_extrema
from ..operators.raster import bin_2d, hover_stats
from ..operators.resample import freq_to_us, resample_mean
from ..sources.hdbpp import HdbppCatalog, day_partitions


def _split_attr(full_name: str) -> tuple[str, str]:
    """'cs/domain/family/member/name' -> (cs, attr), right-anchored like the
    reference's split_cs_and_attribute (reference hdbpp.py:90-92
    ``attr.rsplit("/", 4)``): real Tango cs names contain slashes
    (``tango://host:10000``), so the cs is everything before the LAST four
    separators, never the prefix before the first one. Like the reference,
    raises ValueError for names with fewer than four separators."""
    cs, domain, family, member, name = full_name.rsplit("/", 4)
    return cs, "/".join((domain, family, member, name))


def _covered_day_span_utc(
    t0: datetime, t1: datetime, zone: str
) -> tuple[datetime, datetime]:
    """[start, end) naive-UTC instants of the ``zone``-local calendar days
    covering [t0, t1] (reference hdbpp.py:304-308: periods are LOCAL
    dates, timestamps UTC). Inputs are the engine's naive-UTC datetimes;
    for zone='UTC' this is plain midnight flooring.

    Documented divergence (ADVICE r13): ``zone`` models the INTENDED
    semantics - "periods are the storage partition's local calendar
    dates" - not the reference's literal mechanism. The reference
    attaches tzlocal to its naive request instants via ``replace()``
    (hdbpp.py:298-306), an identity conversion, so its covered days are
    always the naive timestamp's OWN calendar date regardless of the
    deployment zone; this engine genuinely converts UTC instants into
    ``zone`` before taking the date, so a non-UTC zone can cover a
    shifted day set near local midnight (e.g. 23:30 UTC -> the next CET
    day). The default zone='UTC' is instant-for-instant identical to the
    reference's behavior on a UTC-clock deployment - the only
    configuration the engine's naive-UTC timestamps describe; a non-UTC
    ``zone`` is the correct day-partition fan-out such a deployment
    WOULD want, which the reference can't express."""
    from zoneinfo import ZoneInfo

    from ..sources.hdbpp import _as_naive_utc

    tz = ZoneInfo(zone)
    utc = timezone.utc
    # aware datetimes are CONVERTED to UTC first (r19 review, the
    # day_partitions fix): a bare replace() would reinterpret a non-UTC
    # offset as UTC wall-clock and disagree with the ts predicate
    d0 = _as_naive_utc(t0).replace(tzinfo=utc).astimezone(tz).date()
    d1 = _as_naive_utc(t1).replace(tzinfo=utc).astimezone(tz).date() + timedelta(days=1)
    to_naive_utc = lambda d: (  # noqa: E731
        datetime(d.year, d.month, d.day, tzinfo=tz)
        .astimezone(utc)
        .replace(tzinfo=None)
    )
    return to_naive_utc(d0), to_naive_utc(d1)


#: basic CSS/matplotlib color names -> RGB; the reference hands color
#: strings straight to datashader/matplotlib, which accepts any
#: matplotlib color - the engine supports the core named set plus
#: #rgb/#rrggbb hex (r19 review: 3-digit shorthand and named colors
#: previously raised ValueError and 500'd the whole /image request)
_NAMED_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "lime": (0, 255, 0), "blue": (0, 0, 255),
    "yellow": (255, 255, 0), "cyan": (0, 255, 255), "aqua": (0, 255, 255),
    "magenta": (255, 0, 255), "fuchsia": (255, 0, 255),
    "orange": (255, 165, 0), "purple": (128, 0, 128),
    "gray": (128, 128, 128), "grey": (128, 128, 128),
    "silver": (192, 192, 192), "maroon": (128, 0, 0),
    "olive": (128, 128, 0), "navy": (0, 0, 128), "teal": (0, 128, 128),
    "brown": (165, 42, 42), "pink": (255, 192, 203),
}


def _parse_color(color: str) -> tuple[int, int, int]:
    """Color spec -> (r, g, b): #rrggbb, #rgb shorthand (each digit
    doubled, CSS semantics), or a basic color name. Raises ValueError
    naming the spec for anything else - a clear 4xx-shaped error
    instead of the bare int() traceback."""
    name = color.strip().lower()
    if name in _NAMED_COLORS:
        return _NAMED_COLORS[name]
    c = name.lstrip("#")
    try:
        if len(c) == 3:
            return tuple(int(ch * 2, 16) for ch in c)
        if len(c) == 6:
            return tuple(int(c[i : i + 2], 16) for i in (0, 2, 4))
    except ValueError:
        pass
    raise ValueError(f"unsupported color spec {color!r}")


class HdbppQueryEngine:
    """Query surface over an HdbppCatalog + unified datapoints DataFrame.

    ``parameters``/``history`` (optional) are the att_parameter /
    att_history tables (schemas.ATT_PARAMETER_SCHEMA / ATT_HISTORY_SCHEMA)
    backing the reference's parameter and event-history lookups
    (reference hdbpp.py:166-191, 243-270).

    ``period_zone`` is the deployment's storage-partition zone (the
    reference pins a local zone for its day periods, hdbpp.py:304-308 +
    Dockerfile; the engine default is UTC per SURVEY §7.3) - it decides
    which calendar days "whole covered day-periods" means for
    restrict_time=False requests.
    """

    def __init__(
        self,
        catalog: HdbppCatalog,
        datapoints: DataFrame,
        parameters: DataFrame | None = None,
        history: DataFrame | None = None,
        period_zone: str = "UTC",
    ):
        self.catalog = catalog
        self.datapoints = datapoints
        self.parameters = parameters
        self.history = history
        self.period_zone = period_zone

    def _time_window(
        self, df: DataFrame, t0: datetime, t1: datetime,
        upper_inclusive: bool = False,
    ) -> DataFrame:
        """Sargable request-window scan (r19 review): push_time_filter
        expresses the bounds on the raw ``_ts_ns`` integer scan column
        where it exists (X2 - a predicate on the DERIVED timestamp is
        opaque to parquet row-group statistics, so /query and the
        /image extrema+line scans previously read full history on
        ns-backed stores), and when the store carries the reference's
        ``period`` day-partition column, the covered local-date keys
        are added as an IN-list - the reference's day fan-out
        (hdbpp.py:303-321) as a PRUNING predicate, without which the
        planner enumerates every day directory of the documented
        (data_type, period)-partitioned 100 TB layout."""
        out = push_time_filter(
            df, t0=t0, t1=t1, upper_inclusive=upper_inclusive
        )
        if "period" in df.columns:
            p1 = t1 if upper_inclusive else t1 - timedelta(microseconds=1)
            out = out.where(
                F.col("period").isin(
                    day_partitions(t0, max(t0, p1), self.period_zone)
                )
            )
        return out

    # --- routing ---------------------------------------------------------

    def _resolve(self, attributes: list[str]) -> dict[str, int]:
        """Lower-cased name -> att_conf_id via the broadcast-joined catalog
        (J1). Names absent from the catalog are dropped, like the
        reference's None results (reference data.py:107,113 F7)."""
        # names are lowered HERE, once (_split_attr over a.lower());
        # the explicit schema keeps an EMPTY attribute list a valid
        # request resolving to {} - the reference returns an empty
        # result for it, while schema inference over [] raised
        # ValueError and 500'd the endpoint (r19 review)
        wanted = [(a, *_split_attr(a.lower())) for a in attributes]
        spark = self.datapoints.sparkSession
        req = spark.createDataFrame(
            wanted, schema="orig_name string, cs_name string, att_name string"
        )
        routed = self.catalog.route(req)
        rows = routed.where(F.col("att_conf_id").isNotNull()).collect()
        return {r["orig_name"]: r["att_conf_id"] for r in rows}

    # --- /query lifecycle (SURVEY §3.2) ----------------------------------

    def query_raw_df(
        self,
        attributes: list[str],
        t0: datetime,
        t1: datetime,
        interval: str | None = None,
        restrict_time: bool = True,
        _ids: dict[str, int] | None = None,
    ) -> DataFrame:
        """SINGLE-PLAN /query: one ``isin`` scan (+ one grouped resample)
        covers every requested attribute; series stay keyed by name as a
        column (J2). One Spark job regardless of attribute count - the
        reference instead gathered 50 concurrent day-queries
        (hdbpp.py:312-321); Catalyst's task scheduler subsumes that.

        Returns (name, t, value_r) ordered by (name, t); t is int64 µs for
        raw queries, DOUBLE (mean member timestamp) when resampled.
        """
        ids = _ids if _ids is not None else self._resolve(attributes)
        spark = self.datapoints.sparkSession
        name_dim = spark.createDataFrame(
            list(ids.items()) or [("", -1)], ["name", "att_conf_id"]
        ).where(F.col("att_conf_id") >= 0)
        df = self.datapoints.where(F.col("att_conf_id").isin(list(ids.values()) or [-1]))
        if restrict_time:
            df = self._time_window(df, t0, t1, upper_inclusive=True)
        else:
            # /httpquery semantics (reference server.py:167-181 ->
            # get_data restrict_time=False): WHOLE covered day-periods,
            # never the full history - the reference fetches only the
            # periods overlapping [t0, t1] (hdbpp.py:304-308) and skips
            # the exact trim. "Day" means the deployment's period zone
            # (self.period_zone; the reference's periods are local-time
            # dates while timestamps are UTC) - the bounds are the
            # zone-local midnights converted back to the engine's naive
            # UTC, still one sargable ts-range predicate, so partition
            # pruning holds at scale.
            day0, day1 = _covered_day_span_utc(t0, t1, self.period_zone)
            df = self._time_window(df, day0, day1, upper_inclusive=False)
        if interval:
            width = freq_to_us(interval)
            res = resample_mean(df, width, value_col="value_r", keys=["att_conf_id"])
            # resampled t = the MEAN of the member timestamps, not the
            # bucket time: the reference's groupby().mean() averages the
            # t column too and its renderers export that average while
            # the bucket key stays in the dropped index (data.py:47,
            # 52-55, 71-72). Raw t is int64 µs, resampled t is DOUBLE -
            # the same dtype split the reference emits.
            out = res.select(
                "att_conf_id",
                F.col("mean_t").alias("t"),
                F.col("mean_v").alias("value_r"),
            )
        else:
            out = df.select("att_conf_id", epoch_us("ts").alias("t"), "value_r")
        return (
            out.join(F.broadcast(name_dim), "att_conf_id")
            .select("name", "t", "value_r")
            .orderBy("name", "t")
        )

    def query_raw(
        self,
        attributes: list[str],
        t0: datetime,
        t1: datetime,
        interval: str | None = None,
        restrict_time: bool = True,
    ) -> dict[str, DataFrame]:
        """Raw or resampled (t, value_r) series per attribute.

        restrict_time=False returns whole covered days (the reference's
        over-fetch-for-cache behavior, hdbpp.py:16-21); True trims exactly
        (F1, data.py:102-108).

        The per-attribute frames are views over the ONE combined plan of
        ``query_raw_df`` - collect the combined frame (renderers do) for a
        single job; the dict form exists for per-series consumers and is
        byte-identical per attribute.
        """
        ids = self._resolve(attributes)
        combined = self.query_raw_df(attributes, t0, t1, interval, restrict_time, _ids=ids)
        return {
            name: combined.where(F.col("name") == name).select("t", "value_r").orderBy("t")
            for name in ids
        }

    # --- /image lifecycle (SURVEY §3.1, pre-render aggregates) -----------

    def image_aggregates(
        self,
        attributes: list[dict],
        t0: datetime,
        t1: datetime,
        size: tuple[int, int],
        axes: dict[str, dict] | None = None,
    ) -> dict:
        """Everything the /image endpoint needs BEFORE pixel encoding:
        per-axis y_range (extrema + padding + manual overrides,
        plot.py:74-188), the 2-D binned raster aggregate (A6) and per-column
        hover stats (A8). Driver receives <= w*h rows per axis.

        ``attributes``: [{"name": full_name, "y_axis": 0|1}, ...]
        ``axes``: {"0": {"scale": "linear"|"log", "min": x?, "max": x?}}
        """
        w, h = size
        axes = axes or {}
        by_axis: dict[int, list[str]] = {}
        for spec in attributes:
            by_axis.setdefault(int(spec.get("y_axis", 0)), []).append(spec["name"])

        # timezone-independent epoch (naive datetimes are engine-wide UTC);
        # .timestamp() would shift the pixel x-axis by the host's UTC offset
        x0_us = datetime_to_epoch_us(t0)
        x1_us = datetime_to_epoch_us(t1)
        span_us = float(x1_us - x0_us)
        result: dict = {}

        # ONE catalog resolve for the whole request (r14: the per-axis
        # _resolve was ~0.8 s of catalog-join collect PER AXIS - the
        # largest single line in the lifecycle_image profile, PLANS.md);
        # per-axis routing below is a driver-side dict slice. Same
        # drop-unknown-names semantics (F7), one broadcast-join job.
        all_ids = self._resolve([spec["name"] for spec in attributes])

        # ONE extrema job per distinct axis SCALE, not per axis
        # (optimization r19): series_extrema groups by att_conf_id, so
        # the per-series rows over the union of a scale-group's ids are
        # identical to the per-axis runs - one collect instead of one
        # per axis (the 2-axis fixture halves the extrema jobs; the
        # log-positivity filter is the only per-axis plan difference,
        # hence the grouping key). Driver result stays <= |attributes|
        # rows.
        scale_of = {
            axis: axes.get(str(axis), {}).get("scale") == "log"
            for axis in by_axis
        }
        # keyed by (log_scale, id), NOT id alone: the same attribute may
        # be requested on two axes with different scales (nothing upstream
        # prevents it), and the log group's positivity-filtered row must
        # not overwrite the linear group's (ADVICE r19)
        ext_rows: dict[tuple[bool, int], dict] = {}
        for log_scale in sorted(set(scale_of.values())):
            grp_ids = [
                all_ids[n]
                for axis in by_axis
                if scale_of[axis] == log_scale
                for n in by_axis[axis]
                if n in all_ids
            ]
            if not grp_ids:
                continue
            routed_grp = self.datapoints.where(
                F.col("att_conf_id").isin(grp_ids)
            )
            view_grp = self._time_window(
                routed_grp, t0, t1, upper_inclusive=False
            )
            for r in series_extrema(
                view_grp, ["att_conf_id"], "value_r", log_scale
            ).collect():
                ext_rows[(log_scale, r["att_conf_id"])] = r

        for axis, names in by_axis.items():
            cfg = axes.get(str(axis), {})
            log_scale = scale_of[axis]
            ids = {n: all_ids[n] for n in names if n in all_ids}
            if not ids:
                continue
            id_to_name = {v: k for k, v in ids.items()}
            routed = self.datapoints.where(
                F.col("att_conf_id").isin(list(ids.values()))
            )
            # reference /image windows (r13 parity): get_images fetches
            # WHOLE covered day-periods (get_data restrict_time defaults
            # False, server.py:124 -> data.py:78-114), computes extrema
            # over the HALF-OPEN request slice [t0, t1) (plot.py:88-90
            # searchsorted both sides), and rasterizes from the full
            # whole-days frame with the canvas clipping to [t0, t1]
            # INCLUSIVE (so line segments enter the view from off-screen
            # anchor points, and a point exactly at t1 is drawn but not
            # counted in extrema). Both windows stay sargable ts ranges.
            day0, day1 = _covered_day_span_utc(t0, t1, self.period_zone)
            days = self._time_window(routed, day0, day1, upper_inclusive=False)

            # per-series extrema (A2, log filter F3) - sliced from the
            # scale-group collect above WITH this axis's own scale key,
            # values identical per series
            ext = {
                i: ext_rows[(log_scale, i)]
                for i in ids.values()
                if (log_scale, i) in ext_rows
            }
            descs = {
                id_to_name[i]: {
                    "total_points": r["n"],
                    "min_value": r["vmin"],
                    "max_value": r["vmax"],
                }
                for i, r in ext.items()
            }
            # axis fold (A3) + manual overrides (J4) + padding (plot.py:160-188)
            mins = [r["vmin"] for r in ext.values() if r["vmin"] is not None]
            maxs = [r["vmax"] for r in ext.values() if r["vmax"] is not None]
            # manual bounds are float()-coerced like the reference
            # (plot.py:103-104) - JSON clients send axis config numbers
            # as strings; a computed fallback passes through unchanged.
            # Divergence note: the reference does axes[str(y_axis)] when
            # ANY axes config exists and 500s on an axis the config
            # omits; the engine treats a missing axis entry as {} (the
            # malformed-input degradation rule, SURVEY §7.3).
            vmin = cfg.get("min")
            vmax = cfg.get("max")
            vmin = float(vmin) if vmin is not None else (min(mins) if mins else None)
            vmax = float(vmax) if vmax is not None else (max(maxs) if maxs else None)
            y0, y1 = pad_range(vmin, vmax, log_scale)

            plot_data = days
            # log axes bin on log10 POSITIONS while aggregating RAW
            # values - datashader Canvas(y_axis_type='log'), reference
            # plot.py:24 (r19 review: the raster previously binned log
            # axes in LINEAR value space, collapsing an exponential
            # decade spread into the bottom pixels). Positivity filter
            # (F3) guarantees log10 is defined; pad_range's log clamp
            # keeps y0 > 0. bin_range/bin_col carry the transformed
            # geometry to the line raster in render_image.
            if log_scale:
                plot_data = plot_data.where(F.col("value_r") > 0)
                plot_data = plot_data.withColumn(
                    "_v_bin", F.log10(F.col("value_r"))
                )
                if y0 > 0 and y1 > 0:
                    bin_lo, bin_hi = math.log10(y0), math.log10(y1)
                else:
                    # pad_range's total-surface fallbacks for no-data /
                    # zero-constant axes ((0,1), (-0.5,0.5)) are not
                    # log-representable; the positivity filter leaves
                    # such rasters EMPTY, so any valid log band renders
                    # identically - one decade keeps the surface total
                    bin_lo, bin_hi = 0.0, 1.0
                bin_col = "_v_bin"
            else:
                bin_lo, bin_hi = y0, y1
                bin_col = None
            raster = bin_2d(
                plot_data, x0_us, span_us, w, bin_lo, bin_hi, h,
                value_col="value_r", keys=["att_conf_id"], bin_col=bin_col,
            )
            # hover clips on raw values (monotone-equivalent to the bin-
            # space clip) and never y-bins, so it stays in data space
            hover = hover_stats(
                plot_data, x0_us, span_us, w, y0, y1,
                value_col="value_r", keys=["att_conf_id"],
            )
            result[axis] = {
                "y_range": (y0, y1),
                "x_range": (x0_us, x1_us),
                "bin_range": (bin_lo, bin_hi),
                "bin_col": bin_col or "value_r",
                "raster": raster,
                "hover": hover,
                "descs": descs,
                # resolved routing + the filtered window plan, exposed so
                # downstream passes (render_image's line raster) reuse them
                # instead of re-collecting the catalog and rebuilding the scan
                "ids": ids,
                "data": plot_data,
            }
        return result

    def render_image(
        self,
        attributes: list[dict],
        t0: datetime,
        t1: datetime,
        size: tuple[int, int],
        axes: dict[str, dict] | None = None,
    ) -> dict:
        """The complete /image response (reference server.py:92-148):
        {"images": {axis: {image: base64 PNG, y_range, x_range}},
         "descs": {attr: hover stats}}.

        The line raster (A7) runs as a pandas kernel per series; the driver
        only ever sees pixel rows and the tiny extrema results.
        """
        from concurrent.futures import ThreadPoolExecutor

        from ..operators.rasterline import rasterize_lines
        from .png import render_png_base64

        w, h = size
        aggs = self.image_aggregates(attributes, t0, t1, size, axes)
        descs: dict = {}

        # per-axis line raster + PNG encode are INDEPENDENT chains
        # (separate ids, separate bin geometry) - overlap them from a
        # small thread pool (guide-standard concurrent-jobs pattern) so
        # axis 1's kernel tasks back-fill executors freed by axis 0's
        # stragglers instead of running serially. Job-group properties
        # are thread-local; copy the caller's into each worker so
        # run_cancellable's tag (X10) still covers every job.
        sc = self.datapoints.sparkSession.sparkContext
        job_props = {
            p: sc.getLocalProperty(p)
            for p in (
                "spark.jobGroup.id",
                "spark.job.description",
                "spark.job.interruptOnCancel",
            )
        }

        def _axis_image(item):
            axis, ax = item
            for p, v in job_props.items():
                if v is not None:
                    sc.setLocalProperty(p, v)
            # reuse the axis' resolved ids and filtered window plan from the
            # aggregate pass - no second catalog collect, no rebuilt scan
            ids = ax["ids"]
            y0, y1 = ax["y_range"]
            # the line raster draws in the BIN space (log10 positions on
            # a log axis - the aggregate pass already projected _v_bin)
            b0, b1 = ax["bin_range"]
            x0 = ax["x_range"][0]
            pixel_rows = rasterize_lines(
                ax["data"], x0, float(ax["x_range"][1] - x0), w, b0, b1, h,
                value_col=ax["bin_col"],
            ).collect()
            colors = {}
            widths = {}
            # z-order follows the request's attribute listing (reference
            # plot.py tf.stack over attributes.items()), not catalog id
            order = [ids[spec["name"]] for spec in attributes if spec["name"] in ids]
            for spec in attributes:
                if spec["name"] not in ids:
                    continue
                if spec.get("color"):
                    colors[ids[spec["name"]]] = _parse_color(spec["color"])
                if spec.get("width"):
                    # per-series line widening (reference tf.spread px=width)
                    widths[ids[spec["name"]]] = int(spec["width"])
            return axis, {
                "image": render_png_base64(
                    pixel_rows, w, h, colors or None, widths=widths or None,
                    order=order,
                ),
                "y_range": [y0, y1],
                "x_range": list(ax["x_range"]),
            }

        if len(aggs) > 1:
            with ThreadPoolExecutor(max_workers=min(len(aggs), 3)) as pool:
                images = dict(pool.map(_axis_image, aggs.items()))
        else:
            images = dict(map(_axis_image, aggs.items()))
        for ax in aggs.values():
            descs.update(ax["descs"])
        return {"images": images, "descs": descs}

    # --- parameter / history lifecycles (S5/S6) ---------------------------

    def get_parameters(self, attr: str, end_time: datetime):
        """Latest parameter snapshot strictly before ``end_time`` (reference
        get_parameters, hdbpp.py:261-270; prepared 'parameter' CQL
        hdbpp.py:166-172: ORDER BY recv_time DESC LIMIT 1). Returns a Row or
        None - an as-of lookup (S5/O3) via the window top-1 operator."""
        from ..operators.asof import latest_before

        if self.parameters is None:
            return None
        ids = self._resolve([attr])
        if attr not in ids:
            return None
        rows = latest_before(
            self.parameters.where(F.col("att_conf_id") == ids[attr]),
            end_time,
            keys=["att_conf_id"],
            ts_col="recv_time",
        ).collect()
        return rows[0] if rows else None

    def get_history(
        self,
        attr: str,
        time_window: tuple[datetime, datetime] | None = None,
        limit: int = 10,
    ) -> list[dict]:
        """Attribute lifecycle events (add/remove/start/stop...), reference
        get_history (hdbpp.py:243-259): windowed queries cap at 10 events
        ('no point trying to display too many'); unwindowed returns all.
        Output rows {'timestamp': epoch seconds float, 'event': str} exactly
        like the reference's time + time_us * 1e-6 assembly."""
        if self.history is None:
            return []
        ids = self._resolve([attr])
        if attr not in ids:
            return []
        df = self.history.where(F.col("att_conf_id") == ids[attr])
        if time_window is not None:
            t0, t1 = time_window
            df = df.where((F.col("time") > utc_ts_lit(t0)) & (F.col("time") < utc_ts_lit(t1)))
            df = df.orderBy("time").limit(limit)
        else:
            df = df.orderBy("time")
        return [
            {"timestamp": r["t_us"] / 1_000_000.0, "event": r["event"]}
            for r in df.select(epoch_us("time").alias("t_us"), "event").collect()
        ]

    # --- /attributes lifecycle (SURVEY §3.3) ------------------------------

    def search(self, cs: str, pattern: str, max_n: int = 100, contains: bool = False):
        return self.catalog.search(cs, pattern, max_n, contains)

    def controlsystems(self):
        return self.catalog.controlsystems()

    # --- staleness control (X10) ------------------------------------------

    def run_cancellable(self, tag: str, fn):
        """Run ``fn`` with every Spark job it launches tagged by ``tag``.

        The reference client silently drops responses superseded by a newer
        request (reference js/actions.js:125-190) - the stale server work
        still runs to completion. Engine-side we can do better: a
        superseding request calls ``cancel(tag)`` and the stale request's
        jobs are interrupted instead of burning cluster time.

        The cleanup RESTORES the caller's previous thread-local job
        properties - all THREE that setJobGroup sets, including
        ``spark.job.interruptOnCancel`` (r19 review: clearing only
        group/description leaked interruptOnCancel=true onto every later
        job on the thread - executor-side Thread.interrupt that Spark
        defaults OFF because it can wedge storage clients - and
        resetting to None instead of the previous values untagged the
        outer request's remaining jobs under nesting).
        """
        sc = self.datapoints.sparkSession.sparkContext
        props = (
            "spark.jobGroup.id",
            "spark.job.description",
            "spark.job.interruptOnCancel",
        )
        prev = {p: sc.getLocalProperty(p) for p in props}
        sc.setJobGroup(tag, f"hdbpp request {tag}", interruptOnCancel=True)
        try:
            return fn()
        finally:
            for p in props:
                sc.setLocalProperty(p, prev[p])

    def cancel(self, tag: str) -> None:
        """Cancel all running Spark jobs tagged with ``tag`` (X10)."""
        self.datapoints.sparkSession.sparkContext.cancelJobGroup(tag)
