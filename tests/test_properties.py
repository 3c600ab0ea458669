"""Hypothesis property tests for the pure-Python kernels (no SparkSession:
these run in milliseconds and fuzz the logic that oracle parity can only
probe at the fixed testdata points).

The BPE kernels are the subtlest driver-side code in the repo - greedy
non-overlapping merge application and incremental pair-count maintenance -
so they get randomized coverage against independent twins: the trainer vs a
recount-everything greedy implementation, the merge application vs its
algebraic invariants.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from web_maxiv_hdbppviewer_spark.operators.bpe import (
    _apply_merge_local,
    train_merges_local,
)

# tiny alphabet forces pair collisions, overlapping runs ("aaaa") and
# tie-breaks - the corners where greedy/non-overlap/ordering bugs live
_WORDS = st.text(alphabet="ab", min_size=1, max_size=8)


@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "aa"]), max_size=12),
    lhs=st.sampled_from(["a", "b", "ab", "ba", "aa"]),
    rhs=st.sampled_from(["a", "b", "ab", "ba", "aa"]),
)
@settings(max_examples=300, deadline=None)
def test_apply_merge_invariants(syms, lhs, rhs):
    """Greedy left-to-right non-overlapping merge: (1) concatenation is
    preserved, (2) no adjacent (lhs, rhs) pair survives - after a merge the
    glued token can never itself be ``lhs`` (it is strictly longer), and an
    unconsumed ``lhs`` before an ``rhs`` would have merged."""
    out = _apply_merge_local(syms, lhs, rhs)
    assert "".join(out) == "".join(syms)
    assert all(not (out[i] == lhs and out[i + 1] == rhs) for i in range(len(out) - 1))
    assert len(out) <= len(syms)


@given(
    wf=st.dictionaries(_WORDS, st.integers(1, 5), min_size=1, max_size=10),
    n_merges=st.integers(1, 8),
)
@settings(max_examples=150, deadline=None)
def test_incremental_trainer_matches_recount_trainer(wf, n_merges):
    """The incremental trainer (patch only affected words) must equal a
    recount-everything greedy trainer - an INDEPENDENT implementation of the
    same spec - on random vocabularies, including early pair exhaustion."""
    wordfreqs = sorted(wf.items())

    def recount(wordfreqs, n_merges):
        syms = [list(w) for w, _ in wordfreqs]
        freqs = [f for _, f in wordfreqs]
        merges = []
        for step in range(1, n_merges + 1):
            counts = {}
            for s, f in zip(syms, freqs):
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
            if not counts:
                break
            (lhs, rhs), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((step, lhs, rhs, n))
            syms = [_apply_merge_local(s, lhs, rhs) for s in syms]
        return merges

    assert train_merges_local(wordfreqs, n_merges) == recount(wordfreqs, n_merges)


@given(
    st.integers(min_value=0, max_value=2_592_000_000_000 * 3),
    st.sampled_from([100, 200, 400, 800, 1000]),
)
@settings(max_examples=300, deadline=None)
def test_streaming_raster_synthetic_ts_reconstruction_is_exact(off_us, nx):
    """The append-mode raster's contract (streaming/incremental.py):
    windowing on the synthetic time x0 + xbin(ts)*col_us and recovering
    xb as floor((win.start - x0)/col_us) must reproduce the batch float
    xbin value EXACTLY for every event time - including the boundary
    events where float xbin disagrees with exact integer gridding. Pure
    arithmetic twin of both expressions (k*col_us stays below 2^53, so
    the division round-trips)."""
    import math

    x0 = 1_704_067_200_000_000
    span = 2_592_000_000_000.0  # 30 days
    if span / nx != int(span / nx):
        return
    col = int(span / nx)
    t = x0 + off_us
    xb_batch = math.floor((t - x0) / span * nx)
    synth = x0 + xb_batch * col
    xb_recovered = math.floor((synth - x0) / float(col))
    assert xb_recovered == xb_batch
    # the synthetic time stays within one column width of the real event
    # time in either direction (float binning can round a boundary down
    # or a near-boundary up), bounding the watermark-lateness slack
    assert -col <= t - synth < 2 * col


def test_nearest_bucket_matches_python_round_on_random_and_tie_instants(spark):
    """nearest_bucket's contract is 'the bucket index python round would
    give the reference' (functions/time.py): verify over random
    timestamps PLUS every constructed half-tie instant in a window, for
    several widths, in one vectorized job per width. Python round on a
    float is IEEE half-even over the same double quotient Spark's
    bround sees, so equality must be exact."""
    import random

    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.functions.time import nearest_bucket

    rng = random.Random(12)
    for w_s in (60, 600, 43200, 86400):
        w = w_s * 1_000_000
        ts = [rng.randrange(1_600_000_000_000_000, 1_800_000_000_000_000) for _ in range(2000)]
        ts += [k * (w // 2) for k in range(26_000_000 // w_s, 26_000_000 // w_s + 40)]
        df = spark.createDataFrame([(t,) for t in ts], "t_us long")
        got = [
            r["b"]
            for r in df.select(
                F.col("t_us"), nearest_bucket(F.col("t_us"), w).alias("b")
            ).orderBy("t_us").collect()
        ]
        want = [round(t / w) for t in sorted(ts)]
        assert got == want, f"width {w_s}s: first diff at {next(i for i,(g,x) in enumerate(zip(got,want)) if g!=x)}"


def test_resample_mean_t_is_exact_member_mean(spark):
    """resample_mean's mean_t contract (r13, reference data.py:47: the
    exported per-bucket timestamp is the MEAN of the member timestamps):
    over random µs instants, mean_t must BIT-EQUAL the replayed
    arithmetic float(bucket*w) + float(sum_int_offsets)/n - the offset
    sum is exact int64, and the one double multiply/divide/add sequence
    is the same IEEE ops in the same order on both sides. Null values
    must not shrink the t-mean's member set (pandas' per-column
    NaN-skipping mean keeps every row's t)."""
    import random

    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators.resample import resample_mean

    rng = random.Random(13)
    w = 43_200_000_000  # 12 h
    rows = []
    for i in range(3000):
        t = rng.randrange(1_700_000_000_000_000, 1_705_000_000_000_000)
        v = None if i % 7 == 0 else rng.uniform(-50.0, 50.0)
        rows.append((t, v))
    df = spark.createDataFrame(rows, "t_us long, value double").select(
        F.timestamp_micros("t_us").alias("ts"), "value"
    )
    got = {
        r["bucket"]: (r["mean_t"], r["n"])
        for r in resample_mean(df, w).collect()
    }

    groups: dict[int, list[int]] = {}
    for t, _ in rows:
        groups.setdefault(round(t / w), []).append(t)
    assert got.keys() == groups.keys()
    for b, ts in groups.items():
        s_off = sum(t - b * w for t in ts)  # exact int
        expect = float(b * w) + float(s_off) / len(ts)
        assert got[b][0] == expect, (b, got[b][0], expect)
        assert got[b][1] == len(ts)  # nulls still counted


def test_bin2d_matches_numpy_canvas_twin_on_edge_heavy_corpus(spark):
    """Randomized canvas property (r13): bin_2d must agree cell-for-cell
    with an exact numpy twin of the datashader canvas semantics -
    inclusive [x0, x1] x [ymin, ymax] clip, floor float binning in the
    same IEEE order, upper edges snapped into the last bin - on a corpus
    salted with exact edge instants/values and near-boundary points."""
    import math
    import random

    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators.raster import bin_2d

    rng = random.Random(17)
    x0, span, nx = 1_704_067_200_000_000, 2_592_000_000_000.0, 100
    ymin, ymax, ny = 0.0, 500.0, 80
    x1 = x0 + int(span)
    col = int(span) // nx
    pts = []
    for _ in range(4000):
        t = rng.randrange(x0 - col, x1 + col)  # spills past both edges
        v = rng.uniform(-20.0, 520.0)
        pts.append((t, v))
    # exact edges and boundaries
    pts += [(x0, ymin), (x1, ymax), (x0, ymax), (x1, ymin)]
    pts += [(x0 + k * col, 250.0) for k in range(0, nx + 1, 7)]
    pts += [(x1 - 1, ymax), (x1 + 1, 250.0), (x0 - 1, 250.0)]

    expect: dict[tuple[int, int], int] = {}
    for t, v in pts:
        if not (x0 <= t <= x1 and ymin <= v <= ymax):
            continue
        xb = min(int(math.floor((t - x0) / span * nx)), nx - 1)
        yb = min(int(math.floor((v - ymin) / (ymax - ymin) * ny)), ny - 1)
        expect[(xb, yb)] = expect.get((xb, yb), 0) + 1

    df = spark.createDataFrame(pts, "t_us long, value double").select(
        F.timestamp_micros("t_us").alias("ts"), "value"
    )
    got = {
        (r["xb"], r["yb"]): r["cnt"]
        for r in bin_2d(df, x0, span, nx, ymin, ymax, ny).collect()
    }
    assert got == expect
