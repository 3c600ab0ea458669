"""Similarity search over embedding columns (SURVEY §7.1 M6).

Two paths:
  - brute-force cosine top-k: the correctness baseline - broadcast the
    (small) query set against the full corpus, rank per query. At 100 TB
    the corpus side streams; only queries x k rows survive the window.
  - LSH-bucketed ANN: sign-bit buckets partition the corpus; the join is
    bucket-equi (co-partitioned, no cross product), trading recall for a
    candidate set ~1/2^nbits of the corpus per query. This is the scale
    path; swap the bucket function for learned IVF centroids without
    touching the query shape.

Ranking is by ROUND(cosine, 6) desc with id tiebreak - rounding first makes
the rank deterministic across engines despite float-sum ordering.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine, norm


def with_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, vec as double array, norm) - materialize once, reuse in joins."""
    v = as_double_array(vec_col)
    return df.select(F.col(id_col).alias("id"), v.alias("vec"), norm(v).alias("nrm"))


def topk_cosine(
    df: DataFrame,
    k: int,
    query_ids_below: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (id < query_ids_below),
    the k nearest other vectors. Output (q_id, cand_id, cos_r, rank)."""
    base = with_norms(df, id_col, vec_col)
    q = base.select(F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm"))
    q = q.where(F.col("q_id") < query_ids_below)
    c = base.select(F.col("id").alias("cand_id"), F.col("vec").alias("c_vec"), F.col("nrm").alias("c_nrm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("q_id"))
        .select(
            "q_id",
            "cand_id",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cos_r"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def sign_bucket(vec_col, nbits: int = 8, offset: int = 0):
    """Sign-bit LSH bucket: bit i set iff vec[offset + i] >= 0.

    A stand-in for random-hyperplane LSH that is exactly reproducible in any
    engine (no shared RNG needed); production would use H random
    hyperplanes - the query shape below is unchanged.
    """
    bits = [
        F.when(F.element_at(vec_col, offset + i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(nbits)
    ]
    bit_sum = bits[0]
    for b in bits[1:]:
        bit_sum = bit_sum + b
    return bit_sum


def ann_topk_lsh(
    df: DataFrame,
    k: int,
    query_ids_below: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's sign
    bucket. Output (q_id, cand_id, cos_r, rank) - recall < 1 by design."""
    base = with_norms(df, id_col, vec_col).withColumn("bkt", sign_bucket(F.col("vec"), nbits))
    q = base.where(F.col("id") < query_ids_below).select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), F.col("nrm").alias("q_nrm"), "bkt"
    )
    c = base.select(
        F.col("id").alias("cand_id"), F.col("vec").alias("c_vec"), F.col("nrm").alias("c_nrm"), "bkt"
    )
    scored = (
        c.join(F.broadcast(q), "bkt")
        .where(F.col("cand_id") != F.col("q_id"))
        .select(
            "q_id",
            "cand_id",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cos_r"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col("cand_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)


def ann_topk_ivf(
    df: DataFrame,
    k: int,
    query_ids_below: int = 10,
    n_cells: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: assign every vector to its nearest of
    ``n_cells`` centroid cells, then search the query's ``nprobe`` nearest
    cells. Output (q_id, cand_id, cos_r, rank) - recall < 1 by design and
    rises with ``nprobe`` (the standard IVF recall/cost dial: probing p of
    K cells scans ~p/K of the corpus; each candidate keeps exactly one
    cell, so multi-probe never duplicates a (query, candidate) pair).

    Default centroids are the first ``n_cells`` vectors (deterministic,
    training-free seeding so any engine reproduces the cells bit-for-bit);
    pass ``centroids`` = a (cid, cvec) table - e.g. from
    ``train_ivf_centroids`` - to plug in a TRAINED quantizer with the
    identical assignment/probe plan shape. Scale shape: assignment is a
    BROADCAST of the tiny centroid table against the streaming corpus
    (n x K cosines, one pass, no shuffle), the probe is a cell-equi join -
    the same plan IVF indexes execute.
    """
    base = with_norms(df, id_col, vec_col)
    if centroids is None:
        cents = base.where(F.col("id") < n_cells).select(
            F.col("id").alias("cid"), F.col("vec").alias("cvec"), F.col("nrm").alias("cnrm")
        )
    else:
        cents = centroids.select(
            "cid", "cvec", norm(F.col("cvec")).alias("cnrm")
        )
    sim = F.round(cosine(F.col("vec"), F.col("cvec"), F.col("nrm"), F.col("cnrm")), 6)
    scored_assign = base.crossJoin(F.broadcast(cents)).select(
        "id", "vec", "nrm", "cid", sim.alias("sim")
    )
    # Argmax cell per vector as a map-side-combinable aggregation: the n x K
    # broadcast-join rows collapse to n rows BEFORE the exchange (partial
    # max_by per partition), instead of shuffling+sorting all n x K
    # vector-carrying rows through a Window - the K-fold amplification that
    # made this the one structural scale flaw. Ordering key struct(sim, -cid)
    # reproduces the Window's (sim desc, cid asc) tiebreak exactly, so ranks
    # and hashes are unchanged.
    best = F.max_by(
        F.struct(F.col("cid"), F.col("vec"), F.col("nrm")),
        F.struct(F.col("sim"), (-F.col("cid")).alias("ncid")),
    )
    cells = (
        scored_assign.groupBy("id")
        .agg(best.alias("b"))
        .select("id", F.col("b.vec").alias("vec"), F.col("b.nrm").alias("nrm"),
                F.col("b.cid").alias("cell"))
    )
    # Query probes (nprobe nearest cells): the query set is tiny (filtered
    # BEFORE aggregation), so collect the per-id cell list and slice the
    # (sim desc, cid asc) prefix - same order the Window produced.
    q = (
        scored_assign.where(F.col("id") < query_ids_below)
        .groupBy("id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("sim")).alias("ns"), F.col("cid").alias("cid"))
                    )
                ),
                1,
                nprobe,
            ).alias("probes"),
            F.max_by(F.struct(F.col("vec"), F.col("nrm")), F.col("cid")).alias("v"),
        )
        .select(
            F.col("id").alias("q_id"),
            F.col("v.vec").alias("q_vec"),
            F.col("v.nrm").alias("q_nrm"),
            F.explode("probes").alias("p"),
        )
        .select("q_id", "q_vec", "q_nrm", F.col("p.cid").alias("cell"))
    )
    c = cells.select(
        F.col("id").alias("cand_id"), F.col("vec").alias("c_vec"), F.col("nrm").alias("c_nrm"), "cell"
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("cand_id") != F.col("q_id"))
        .select(
            "q_id",
            "cand_id",
            F.round(
                cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")), 6
            ).alias("cos_r"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col("cand_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)


def near_dup_pairs(
    df: DataFrame,
    min_cos: float,
    bands: int = 8,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= min_cos).

    Banded sign-LSH candidate generation + exact cosine verification - the
    same shape as MinHash+LSH dedup: a pair is a candidate iff it agrees on
    ALL bits of at least one of ``bands`` disjoint ``band_bits``-bit sign
    bands (default 8x8 = all 64 dims), then only candidates get the exact
    cosine. Each band is an equi-join on its bucket value - co-partitioned
    shuffle joins, never a cross product; candidate volume is ~bands/2^bits
    of all pairs for unrelated vectors, while near-identical vectors collide
    in every band. Recall < 1 by design for background-level min_cos (like
    ``ann_topk_lsh``); truly near-duplicate vectors (cos ~ 1) are recalled
    with overwhelming probability. The DuckDB oracle reproduces the banding
    as one naive OR-join, so parity checks the algorithm, not the plan.
    """
    base = with_norms(df, id_col, vec_col)
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sign_bucket(F.col("vec"), band_bits, b * band_bits).alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    left = banded.select(F.col("id").alias("id_a"), "band", "bv")
    right = banded.select(F.col("id").alias("id_b"), "band", "bv")
    cands = (
        left.join(right, ["band", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = base.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= min_cos)
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means for the IVF quantizer: (cid, cvec).

    Init = the first ``n_cells`` vectors; each iteration assigns every
    vector to its max-ROUND(cosine,6) centroid (cid tiebreak) and recomputes
    centroids as the element-wise member mean, ROUNDED to 6 decimals -
    the same determinism discipline as ranking: rounding collapses
    float-sum-order noise so any engine reproduces the trained centroids
    bit-for-bit (the DuckDB oracle unrolls the identical iterations).
    Cells that lose all members drop out (both sides agree).

    Scale shape: per iteration, assignment is a broadcast of the K-row
    centroid table against the streaming corpus (the IVF plan shape), and
    the update is one posexplode + (cell, dim) aggregation - corpus-linear.
    The K x dim centroid table round-trips through the driver between
    iterations (bounded by K, never by the corpus - the same shape MLlib
    uses for k-means centroids).

    Centroids deliberately flow as DATA (broadcast join), not as literal
    expressions: an inline-literal argmax projection was measured and
    REJECTED - with the folds inlined into the argmax cascade the analyzer
    cost exploded (42 s/run), and even with sims materialized as columns
    the per-iteration recompile (literals change every round) made it
    slower than the constant-shape broadcast plan, which also scales to
    large K where literal expressions cannot.
    """
    base = with_norms(df, id_col, vec_col).localCheckpoint()
    cents = base.where(F.col("id") < n_cells).select(
        F.col("id").alias("cid"), F.col("vec").alias("cvec")
    )
    for _ in range(iters):
        c = cents.select(
            "cid", "cvec", norm(F.col("cvec")).alias("cnrm")
        )
        sim = F.round(cosine(F.col("vec"), F.col("cvec"), F.col("nrm"), F.col("cnrm")), 6)
        # map-side max_by argmax (same rewrite as ann_topk_ivf): n x K
        # broadcast rows partial-aggregate to n per partition before the one
        # exchange, paid once per Lloyd iteration; struct(sim, -cid) keeps
        # the (sim desc, cid asc) tiebreak so trained centroids are
        # bit-identical to the Window formulation.
        members = (
            base.crossJoin(F.broadcast(c))
            .select("id", "vec", "cid", sim.alias("sim"))
            .groupBy("id")
            .agg(
                F.max_by(
                    F.struct(F.col("cid"), F.col("vec")),
                    F.struct(F.col("sim"), (-F.col("cid")).alias("ncid")),
                ).alias("b")
            )
            .select("id", F.col("b.cid").alias("cid"), F.col("b.vec").alias("vec"))
        )
        dims = members.select("cid", F.posexplode("vec").alias("idx", "x"))
        means = (
            dims.groupBy("cid", "idx")
            .agg(F.round(F.avg("x"), 6).alias("av"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "av"))),
                    lambda s: s["av"],
                ).alias("cvec")
            )
        )
        # K rows of dim doubles: flatten the iteration boundary through the
        # driver so plan depth stays constant across iterations
        spark = df.sparkSession
        cents = spark.createDataFrame(
            [(r["cid"], r["cvec"]) for r in means.collect()],
            "cid long, cvec array<double>",
        )
    return cents
