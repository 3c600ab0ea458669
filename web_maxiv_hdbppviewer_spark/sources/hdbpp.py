"""HDB++ logical-model source layer: catalogs, routing, partition layout.

Replaces the reference's Cassandra access layer (reference hdbpp.py) with
DataFrame-native equivalents:

  - catalogs (``att_conf``, ``att_names``) are small cached dimensions; the
    reference fetches them wholesale every 60 s (hdbpp.py:213-241) - we
    cache and refresh via ``cache.TtlDimension``.
  - name -> (att_conf_id, data_type) routing is a BROADCAST join (J1,
    reference does a python dict lookup hdbpp.py:404) so request fan-out
    stays distributed.
  - day-partition enumeration (X1, reference hdbpp.py:303-321 hand-builds
    one CQL future per local-calendar day) becomes partition PRUNING: data
    is stored partitioned by (data_type, period) and the planner emits a
    ``period IN (...)`` predicate; Catalyst prunes directories statically.

Storage layout for 100 TB (write_datapoints):
  - partitionBy(data_type, period): ~26 types x 365 days/yr directories;
    each day of one type holds every attribute's points for that day -
    range scans touch exactly the requested days (the reference's
    per-(attr, day) Cassandra partitions, without the per-attribute
    request fan-out).
  - within a partition, files are sorted by (att_conf_id, ts) via
    sortWithinPartitions so parquet row-group min/max statistics prune
    non-requested attributes and time sub-ranges (subsumes the
    reference's searchsorted slicing, plot.py:86-90).
  - bucketBy(att_conf_id) into a table (write_datapoints_bucketed) for
    shuffle-free per-attribute joins/aggregations at cluster scale.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.names import attr_full_name
from ..functions.time import utc_ts_lit

#: the reference pins Europe/Stockholm for period derivation
#: (reference Dockerfile:14-17); ours is explicit and per-deployment
DEFAULT_PERIOD_ZONE = "UTC"


def _as_naive_utc(t: datetime) -> datetime:
    """Engine convention: naive datetimes ARE UTC. An AWARE datetime is
    CONVERTED to UTC first (r19 review) - the previous bare
    ``replace(tzinfo=UTC)`` silently reinterpreted a non-UTC offset as
    UTC wall-clock, so the period day keys disagreed with the ts
    predicate (which Spark converts correctly) and edge-day rows were
    silently pruned away."""
    if t.tzinfo is None:
        return t
    return t.astimezone(ZoneInfo("UTC")).replace(tzinfo=None)


def day_partitions(t0: datetime, t1: datetime, zone: str = DEFAULT_PERIOD_ZONE) -> list[str]:
    """Enumerate local-calendar-date period keys covering [t0, t1].

    Mirrors the reference's day splitting (hdbpp.py:303-308: UTC instants
    -> local dates) but is only used to build a pruning predicate - Spark's
    planner does the rest; no per-day query fan-out.
    """
    tz = ZoneInfo(zone)
    d0 = _as_naive_utc(t0).replace(tzinfo=ZoneInfo("UTC")).astimezone(tz).date()
    d1 = _as_naive_utc(t1).replace(tzinfo=ZoneInfo("UTC")).astimezone(tz).date()
    days = []
    d = d0
    while d <= d1:
        days.append(d.isoformat())
        d += timedelta(days=1)
    return days


def derive_period(ts_col, zone: str = DEFAULT_PERIOD_ZONE):
    """Storage-boundary period derivation: UTC event time -> local date
    string (SURVEY §7.3: all computation UTC; local time only here)."""
    return F.date_format(F.from_utc_timestamp(ts_col, zone), "yyyy-MM-dd")


class HdbppCatalog:
    """The two dimension tables + routing/search over them."""

    def __init__(self, att_conf: DataFrame, att_names: DataFrame):
        self.att_conf = att_conf
        self.att_names = att_names

    def controlsystems(self) -> DataFrame:
        """Distinct control systems, sorted (reference server.py:63-70)."""
        return self.att_conf.select("cs_name").distinct().orderBy("cs_name")

    def full_names(self) -> DataFrame:
        """cs + formatted 'domain/family/member/name' (reference server.py:83-84)."""
        return self.att_names.select(
            "cs_name",
            attr_full_name("domain", "family", "member", "name").alias("name"),
        )

    def search(
        self,
        cs: str,
        pattern: str,
        max_n: int | str | None = 100,
        contains: bool = False,
    ) -> DataFrame:
        """Glob/substring attribute search, sorted + capped (reference
        server.py:73-89; the cap is enforced here unlike the reference).

        DOCUMENTED DIVERGENCE (SURVEY O5): the reference PARSES ``max``
        (server.py:77 ``request.query.get("max", 100)``) but never
        applies it - its ``matches`` list goes out uncapped. The engine
        enforces the cap for real (an uncapped name list over a
        100k-attribute archive is the exact unbounded-response class the
        API layer must not ship). ``max_n=None`` requests the
        reference's true uncapped shape - byte-shape comparisons against
        the reference must pass it so the comparison excludes the cap
        (tests/test_round15.py pins both sides).

        ``max_n`` accepts a STRING like the reference's query param
        (str when the client sends one, int 100 otherwise) and
        int()-coerces it - the coercion the reference would need had it
        applied the cap it parses. A non-numeric string raises
        ValueError at the API edge rather than silently scanning
        uncapped."""
        from ..operators.search import search_names

        names = self.full_names().where(F.col("cs_name") == cs)
        return search_names(
            names,
            pattern,
            "name",
            contains=contains,
            limit=None if max_n is None else int(max_n),
        )

    def route(self, requests: DataFrame) -> DataFrame:
        """Resolve (cs_name, att_name) request rows to (att_conf_id,
        data_type) via broadcast join (J1; reference dict lookup
        hdbpp.py:399-411)."""
        return requests.join(
            F.broadcast(self.att_conf), ["cs_name", "att_name"], "left"
        )


def write_datapoints(df: DataFrame, path: str, zone: str = DEFAULT_PERIOD_ZONE) -> None:
    """Write the unified datapoint stream in the 100 TB layout.

    The within-partition sort LEADS with the partition columns (r19
    review): FileFormatWriter requires its input ordered on the
    partition columns and inserts its OWN sort when it is not - a
    planner sort that is not guaranteed stable, so at spill scale the
    documented within-file (att_conf_id, ts) clustering (and with it
    S1/X2 row-group pruning) would silently degrade. Declaring the full
    (data_type, period, att_conf_id, ts) order satisfies the writer's
    requirement, so no extra sort is inserted and the clustering is
    guaranteed (the bucketed writer below is safe by its sortBy)."""
    out = df
    if "period" not in df.columns:
        out = out.withColumn("period", derive_period(F.col("ts"), zone))
    (
        out.repartition("data_type", "period")
        .sortWithinPartitions("data_type", "period", "att_conf_id", "ts")
        .write.partitionBy("data_type", "period")
        .mode("overwrite")
        .parquet(path)
    )


def write_datapoints_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int = 64,
    path: str | None = None,
    zone: str = DEFAULT_PERIOD_ZONE,
) -> None:
    """Write datapoints as a bucketed table: partitionBy(data_type, period)
    for pruning + bucketBy(att_conf_id) sorted by (att_conf_id, ts).

    Bucketing pre-shuffles ONCE at write time: every per-attribute
    aggregation, as-of join, or datapoint-to-datapoint join thereafter
    reads hash-partitioned, sorted buckets and plans with NO exchange and
    NO sort - at 100 TB that converts the dominant per-query shuffle into
    a one-time write cost. ``num_buckets`` should be sized so one bucket
    of one (type, day) partition fits an executor core (e.g. 1 TB/day of
    doubles -> 64-256 buckets).
    """
    out = df
    if "period" not in df.columns:
        out = out.withColumn("period", derive_period(F.col("ts"), zone))
    w = (
        out.repartition(num_buckets, "att_conf_id")
        .write.partitionBy("data_type", "period")
        .bucketBy(num_buckets, "att_conf_id")
        .sortBy("att_conf_id", "ts")
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def prune_window(
    df: DataFrame,
    att_conf_ids: list[int] | None = None,
    t0: datetime | None = None,
    t1: datetime | None = None,
    zone: str = DEFAULT_PERIOD_ZONE,
) -> DataFrame:
    """The engine's ONE store-pruning predicate (r19 review - previously
    three divergence-prone copies across the readers): the ``period``
    day-key IN-list when BOTH bounds exist (an open-ended bound cannot
    enumerate days), the ``ts`` bounds applied INDEPENDENTLY - a single
    bound previously disabled time filtering entirely, silently
    returning the full-history scan - and the attribute IN-list."""
    if t0 is not None and t1 is not None:
        df = df.where(F.col("period").isin(day_partitions(t0, t1, zone)))
    if t0 is not None:
        df = df.where(F.col("ts") >= utc_ts_lit(t0))
    if t1 is not None:
        df = df.where(F.col("ts") <= utc_ts_lit(t1))
    if att_conf_ids is not None:
        df = df.where(F.col("att_conf_id").isin([int(i) for i in att_conf_ids]))
    return df


def read_datapoints_bucketed(
    spark,
    table: str,
    att_conf_ids: list[int] | None = None,
    t0: datetime | None = None,
    t1: datetime | None = None,
    zone: str = DEFAULT_PERIOD_ZONE,
) -> DataFrame:
    """Pruned scan of the bucketed table (see ``read_datapoints`` for the
    predicate semantics; bucket pruning additionally skips non-matching
    ``att_conf_id`` bucket files before any IO)."""
    return prune_window(spark.table(table), att_conf_ids, t0, t1, zone)


def read_datapoints(
    spark,
    path: str,
    att_conf_ids: list[int] | None = None,
    t0: datetime | None = None,
    t1: datetime | None = None,
    zone: str = DEFAULT_PERIOD_ZONE,
) -> DataFrame:
    """Partition-pruned, predicate-pushed scan of the datapoint store.

    The ``period IN (...)`` predicate prunes day directories statically
    (X1); ``ts`` bounds push down to parquet row groups (X2); attribute
    filtering rides the row-group sort (S1).
    """
    return prune_window(spark.read.parquet(path), att_conf_ids, t0, t1, zone)
