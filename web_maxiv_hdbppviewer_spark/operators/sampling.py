"""Deterministic sampling/splitting for training-data pipelines.

The 100 TB corpus operations every training run needs:

  - ``hash_split``: train/val/test assignment by hashing the document id -
    stable across runs, machines, and engines (no RNG state), embarrassingly
    parallel (pure projection, zero shuffles), and exactly reproducible by
    any SQL engine with md5 - which is what the DuckDB oracle does.
  - ``stratified_sample``: per-stratum keep fractions (domain mixing /
    up-down-weighting by source) with the same hash-bucket construction -
    a filter, not a shuffle; changing the mix never reshuffles the corpus.

Both use bucket = md5_int60("seed:id") mod 10_000 so fractions have 4
decimal digits of resolution; buckets are uniform because the 60-bit hash
is. Spark's own df.sample/sampleBy were deliberately NOT used: they are
seeded per-partition, so results change with partitioning/cluster size -
a silent reproducibility hazard in any multi-run training pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.texthash import md5_int60, words

#: bucket resolution: fractions are exact multiples of 1/10000
BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: str) -> Column:
    """Stable bucket in [0, BUCKETS) from a seeded portable hash of the id."""
    return md5_int60(id_col.cast("string"), salt=seed) % BUCKETS


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket ranges.

    ``fractions`` maps split name -> fraction; they must sum to 1.0 (within
    bucket resolution). Assignment is a pure projection - the 100 TB corpus
    is never shuffled, and the same (id, seed) always lands in the same
    split on any engine.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    # per-entry validation (r19 review): {'train': 1.1, 'val': -0.1}
    # sums to 1.0 but silently routes EVERY row to 'train' - each
    # fraction must be a valid share on its own, as stratified_sample
    # already enforces
    for name, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {name!r} outside [0, 1]: {v}")
    bucket = hash_bucket(F.col(id_col), seed)
    cum = 0.0
    expr = None
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows (domain mixing).

    ``fractions`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed keep ``default_fraction``. A row is kept iff its hash bucket is
    below fraction*BUCKETS - a codegen filter with no shuffle and no RNG,
    so mixes are reproducible and monotone (raising a fraction only ADDS
    documents, it never swaps the kept set - critical for incremental
    corpus builds).
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} outside [0, 1]: {v}")
    bucket = hash_bucket(F.col(id_col), seed)
    thresh = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in fractions.items():
        thresh = (
            F.when(F.col(strata_col) == value, int(round(frac * BUCKETS)))
            .otherwise(thresh)
        )
    return df.where(bucket < thresh)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
    by: list[str] | None = None,
    length: Column | None = None,
) -> DataFrame:
    """Assign every document a contiguous token span inside a packed
    training shard (GPT-style packing: concatenate documents in a
    deterministic pseudo-random order, then cut fixed ``seq_len`` windows).

    Output: (id, shard, start_tok, end_tok, seq_id) where ``start_tok`` is
    the document's offset in its shard's token stream and ``seq_id`` =
    floor(start_tok / seq_len) - the training sequence its first token
    lands in (documents may straddle sequence boundaries, as packed
    pretraining datasets do).

    Scale shape: ONE shuffle by shard + a per-shard window cumsum; shards
    are hash-assigned, so ``n_shards`` is the parallelism dial (size it to
    ~executor count x a small constant; each task sorts |corpus|/n_shards
    rows). Order within a shard is (FULL 60-bit seeded hash, id) -
    deterministic across engines and cluster sizes, so the packed layout
    is reproducible bit-for-bit, unlike RNG-shuffled packing. The full
    hash, not the 10,000-valued bucket (r19 review): a large shard
    ordered by the coarse bucket degenerates into |shard|/10k-document
    doc_id-ascending RUNS - adjacent ingestion-order ids packed
    contiguously, correlating training sequences with crawl batches
    exactly as RNG-free packing must not (token_budget_fill already
    orders by the full hash for the same reason). Shard ASSIGNMENT
    still derives from the bucket, so shard membership is unchanged.

    ``by`` adds grouping columns (e.g. the ``split`` from ``hash_split``)
    so token streams tile each (*by, shard) independently - pack WITHIN a
    split, or removing another split's documents would leave holes in the
    stream. ``length`` overrides the per-document token count expression
    (default: whitespace tokens) - pipe_pack_bpe passes the BPE
    pre-tokenizer count, the unit LLM training actually budgets by.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    by = list(by or [])
    h = md5_int60(F.col(id_col).cast("string"), salt=seed)
    base = df.select(
        F.col(id_col),
        *by,
        h.alias("_h"),
        ((h % BUCKETS) % n_shards).alias("shard"),
        (
            length if length is not None else F.size(words(F.col(text_col)))
        ).cast("long").alias("_n"),
    )
    w = (
        Window.partitionBy(*by, "shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.withColumn("start_tok", F.coalesce(F.sum("_n").over(w), F.lit(0)))
        .select(
            id_col,
            *by,
            "shard",
            "start_tok",
            (F.col("start_tok") + F.col("_n")).alias("end_tok"),
            F.floor(F.col("start_tok") / seq_len).alias("seq_id"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    packed: DataFrame,
    path: str,
    id_col: str = "doc_id",
) -> None:
    """Materialize the packed training corpus: documents joined to their
    pack assignments, written as parquet partitioned by (split, shard) with
    rows ordered by ``start_tok`` inside every file - the layout a training
    data-loader streams sequentially (one directory per split/shard, token
    spans contiguous on disk).

    ``packed`` is ``pack_sequences`` output, optionally carrying a
    ``split`` column from ``hash_split`` (defaults to a single 'train'
    partition when absent). One shuffle total: repartition by the write
    partitions, then sortWithinPartitions - Spark writes each (split,
    shard) directory from a single sorted task, so files are span-ordered
    without a global sort.

    ``docs`` columns that collide with ``packed``'s assignment columns
    (e.g. a caller passing hash_split output as docs) are DROPPED from
    the docs side - the pack assignment is authoritative; before this
    the duplicate 'split' made the repartition throw an
    ambiguous-reference AnalysisException (r19 review).
    """
    cols = packed.columns
    if "split" not in cols:
        packed = packed.withColumn("split", F.lit("train"))
    overlap = sorted((set(docs.columns) & set(packed.columns)) - {id_col})
    if overlap:
        docs = docs.drop(*overlap)
    out = (
        docs.join(packed, id_col)
        .repartition(F.col("split"), F.col("shard"))
        .sortWithinPartitions("split", "shard", "start_tok")
    )
    out.write.mode("overwrite").partitionBy("split", "shard").parquet(path)


def temperature_rebalance(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "temper",
) -> DataFrame:
    """Temperature-based domain rebalancing (the XLM-R / mC4 alpha-sampling
    mix): target share q_d proportional to p_d^alpha flattens the domain
    distribution; realized as DOWNSAMPLE-ONLY per-domain keep fractions
    f_d = (n_min / n_d)^(1 - alpha) - the rarest domain keeps everything,
    head domains shed mass. Keep decisions use the same md5 hash-bucket
    rule as ``stratified_sample`` (pure filter, monotone, no RNG).

    Returns the per-domain audit table (strata, n_total, keep_bp, n_kept).
    For the default alpha = 0.5 the fraction is sqrt(n_min / n_d): every
    step (divide, sqrt, scale, half-up round to integer basis points) is
    IEEE correctly rounded, so any engine reproduces keep_bp bit-for-bit.
    Scale shape: one count aggregation, a K-row broadcast of thresholds
    back onto the corpus filter, one kept-count aggregation.

    A NULL stratum is a real domain (r19 review): the joins are
    null-safe, so unlabeled rows keep by their own threshold and appear
    in the audit instead of silently keeping NOTHING while their count
    still depresses n_min for everyone else. alpha outside [0, 1]
    raises - alpha > 1 silently inverted the rebalance into a
    keep-everything no-op."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_total"))
    n_min = counts.agg(F.min("n_total").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_total")
    frac = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    th = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            strata_col,
            "n_total",
            F.round(frac * BUCKETS).cast("int").alias("keep_bp"),
        )
    )
    bucket = hash_bucket(F.col(id_col), seed)
    thr = th.select(F.col(strata_col).alias("_s"), "keep_bp")
    kept = (
        df.select(F.col(strata_col), bucket.alias("_b"))
        .join(F.broadcast(thr), F.col(strata_col).eqNullSafe(F.col("_s")))
        .where(F.col("_b") < F.col("keep_bp"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .select(F.col(strata_col).alias("_s2"), "n_kept")
    )
    return (
        th.join(kept, F.col(strata_col).eqNullSafe(F.col("_s2")), "left")
        .select(
            strata_col,
            F.col("n_total").cast("long").alias("n_total"),
            "keep_bp",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def mixture_schedule(
    df: DataFrame,
    total_slots: int = 100_000,
    strata_col: str = "source",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a training-slot
    budget across domains: given per-domain corpus counts n_d, allocate
    ``total_slots`` training examples so that every domain receives
    floor(T * n_d / N) slots plus at most one extra, extras going to the
    largest fractional remainders - the slots sum to EXACTLY T (the
    defining property of the method) and the whole computation is
    integer, so any engine reproduces it bit-for-bit. This is the
    schedule a data-mixing loader consumes: ``pipe_temperature_mix``
    decides the mixture WEIGHTS, this turns weights into an exact
    integer batch composition (no accumulated rounding drift over a
    training run, unlike per-step independent sampling).

        quota_d = T * n_d / N          (exact rational)
        base_d  = (T * n_d) div N      (integer division)
        rem_d   = (T * n_d) mod N      (integer remainder)
        extras: the T - sum(base_d) domains with the largest rem_d
                (ties: strata ascending) get +1

    Output: (strata, n_docs, base_slots, rem, extra, slots), one row per
    domain. Scale shape: one corpus-linear count aggregation; everything
    after runs on K = #domains rows (the ranking window is a
    single-partition sort of K rows - bounded by the domain vocabulary,
    never the corpus, the same boundedness argument as the codebook
    collects)."""
    if total_slots <= 0:
        raise ValueError(f"total_slots must be positive, got {total_slots}")
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").alias("nn"))
    q = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            "n_docs",
            F.expr(f"({total_slots} * n_docs) div nn").alias("base_slots"),
            F.expr(f"({total_slots} * n_docs) % nn").alias("rem"),
        )
    )
    leftover = q.agg(
        (F.lit(total_slots) - F.sum("base_slots")).alias("leftover")
    )
    w = Window.orderBy(F.desc("rem"), F.asc(strata_col))  # K rows, bounded
    return (
        q.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            strata_col,
            "n_docs",
            "base_slots",
            "rem",
            F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
            (
                F.col("base_slots")
                + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long").alias("slots"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    exponential-key trick (Efraimidis & Spirakis 2006): each row draws a
    deterministic uniform u = (h + 1) / 2^60 from the seeded portable
    hash, and the k rows with the largest u^(1/w) win. Ranking by
    ln(u)/w is the same order (ln and ^(1/w) are monotone) and avoids
    the pow() call.

    Key resolution (r19 review): ln(u) is snapped to integer NANO-NATS
    - round(ln(u) * 1e9) as a long, the dsir/lm fixed-point discipline
    - and the ranking key is that exact integer divided by the weight
    (one correctly-rounded IEEE division, identical on any engine). The
    previous round-6 of the QUOTIENT quantized absolutely: with weights
    ~2000, every key lay within [-0.021, 0] and ~0.1% of a large corpus
    tied at the exact top bin, silently degrading E-S selection to
    smallest-doc_id order - invisible at bench scale, fatal at 1e8
    docs. Nano-nat snapping is relative to ln(u) itself, so top-of-
    ranking keys stay distinct to ~1e9 docs; residual exact ties break
    by id ascending as before.

    This is THE primitive for importance-weighted corpus subsampling
    (sample documents proportional to token count / quality / domain
    weight) with no RNG state: re-running on any cluster layout returns
    the identical sample, and adding documents never evicts a kept one
    unless it out-keys it (the top-k is a pure function of the ids).

    Scale shape: a pure projection followed by a global top-k -
    TakeOrderedAndProject, partial per-partition heaps of k rows, never
    a global sort. Ties on the rounded key break by id ascending.

    Weights must be strictly positive (E-S is undefined at w <= 0): a
    zero weight yields a NULL key in Spark (x/0 -> NULL under ANSI-off)
    but -inf in a SQL oracle, and a negative weight silently INVERTS the
    ranking - both diverge from E-S semantics without erroring. The
    operator therefore enforces the contract itself and drops w <= 0
    rows before keying (r10 advisor finding).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        md5_int60(F.col(id_col).cast("string"), salt=seed) + 1
    ) / F.lit(float(1 << 60))
    lnu_fp = F.round(F.log(u) * F.lit(1.0e9), 0).cast("long")
    key = lnu_fp / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("w_key_r", F.round(key, 6))
        .withColumn("_key", key)
        .orderBy(F.desc("_key"), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )


def token_budget_fill(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "budget",
) -> DataFrame:
    """Greedy per-group corpus fill under a token budget: walk each
    group's documents in a seeded-hash order (a deterministic uniform
    shuffle - no RNG state, engine-replayable) and keep documents while
    the running token total stays within ``budget``.

    This is the "give me ~N tokens per domain" selection every training
    mix needs once domain budgets are set in TOKENS rather than document
    counts (documents vary 10x in length, so a doc-count quota skews the
    realized token mix). The hash order makes the kept set a uniform
    sample of the group, stable across runs, partitionings, and engines;
    re-running with a larger budget only ever ADDS documents (the walk
    order is budget-independent), so budget sweeps are monotone the same
    way ``stratified_sample`` fractions are.

    Output: (id, group, n_tokens, cum_tokens, selected) - one row per
    document; ``selected`` is the greedy-prefix rule ``cum_tokens <=
    budget`` (a document that would cross the budget line is dropped,
    and so is everything after it in hash order).

    Scale shape (100 TB): token counts are a JVM-side projection; the
    only shuffle is the per-GROUP window (partitionBy group, never a
    global window), and with ~1k domains the window state per partition
    is one running long. Skewed domains spill to disk in the sort, not
    in memory - the same shape as pipe_pack's within-split cumsum.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tokens = F.size(words(F.col(text_col))).cast("long")
    order = md5_int60(F.col(id_col).cast("string"), salt=seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy("budget_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            id_col,
            group_col,
            n_tokens.alias("n_tokens"),
            order.alias("budget_h"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            id_col,
            group_col,
            "n_tokens",
            "cum_tokens",
            (F.col("cum_tokens") <= budget).alias("selected"),
        )
    )


DSIR_BUCKETS = 256
_DSIR_U_DOM = 1 << 52  # 2^52: (h % 2^52 + 0.5) / 2^52 is EXACT in double


def dsir_select(
    df: DataFrame,
    k: int,
    target_col: str = "lang",
    target_value: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023, DSIR):
    pick the pool documents that look most like a small TARGET corpus by
    (1) fitting hashed bag-of-token models to target and pool, (2)
    scoring every pool document with the per-token log importance ratio
    ln p_target(t) - ln p_pool(t), and (3) Gumbel-top-k resampling on
    the scores - the standard pretraining-corpus targeting step (select
    web documents that look like Wikipedia/books).

    Determinism discipline: the token feature space is HASHED to
    ``n_buckets`` buckets (the paper's hashed n-gram trick) with the
    portable seeded md5 hash, per-bucket log-ratios are published as
    int64 micro-nats (the nbayes fixed-point discipline), so every
    per-document sum is integer-exact in any engine and order. The
    Gumbel noise is a pure function of the id: u = (h mod 2^52 + 0.5) /
    2^52 is EXACT in float64 and strictly inside (0,1) (a raw 60-bit h
    cast to double can round up to 2^60 and make u = 1.0 -> -ln(-ln 1)
    = inf), g_fp = round(-ln(-ln u) * 1e6). Re-running on any layout
    returns the identical selection.

    Scale shape (100 TB): TWO exploded corpus passes - one feeds the
    ``n_buckets``-row conditional count aggregate (map-side combinable,
    model size FIXED by construction - the reason DSIR hashes), the
    second scores the pool by broadcast-joining that model and reducing
    with ONE groupBy(doc) aggregate (model-fit-then-score is the
    standard DSIR shape; materializing the exploded token frame to save
    the second scan would store more than the corpus itself); selection
    is a global top-k (TakeOrderedAndProject, per-partition heaps).
    Documents that tokenize to nothing carry no evidence and are
    excluded (documented; DSIR is undefined on empty feature vectors).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if n_buckets <= 0:
        # % 0 yields NULL buckets, the model join matches nothing, and
        # the selection silently returns EMPTY (r19 review)
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    # NULL labels are POOL, explicitly: a bare `col == value` is NULL for
    # NULL labels, and a NULL is_t silently vanishes from Spark's
    # conditional count sums while a SQL CASE WHEN routes it to ELSE -
    # the engines would diverge on unlabeled documents without this.
    toks = df.select(
        F.col(id_col),
        F.coalesce(F.col(target_col) == target_value, F.lit(False)).alias("is_t"),
        F.explode(words(F.col(text_col))).alias("token"),
    ).select(
        id_col, "is_t",
        (md5_int60(F.col("token"), salt=seed) % n_buckets).alias("b"),
    )
    counts = toks.groupBy("b").agg(
        F.sum(F.col("is_t").cast("long")).alias("ct"),
        F.sum((~F.col("is_t")).cast("long")).alias("cr"),
    )
    tot = counts.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"),
        F.coalesce(F.sum("cr"), F.lit(0)).alias("tr"),
    )
    model = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(n_buckets)))
             - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(n_buckets))))
            * F.lit(1e6),
            0,
        ).cast("long").alias("lr_fp"),
    )
    pool = (
        toks.where(~F.col("is_t"))
        .join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_fp").alias("logratio_fp"),
        )
    )
    u = (
        (md5_int60(F.col(id_col).cast("string"), salt=f"{seed}-g") % _DSIR_U_DOM)
        + F.lit(0.5)
    ) / F.lit(float(_DSIR_U_DOM))
    g_fp = F.round(-F.log(-F.log(u)) * F.lit(1e6), 0).cast("long")
    return (
        pool.select(
            id_col, "n_tokens", "logratio_fp",
            g_fp.alias("gumbel_fp"),
            (F.col("logratio_fp") + g_fp).alias("key_fp"),
        )
        .orderBy(F.desc("key_fp"), F.col(id_col).asc())
        .limit(k)
    )
