"""Deduplication operators for large-scale document pipelines.

Four families, each a first-class engine operator (SURVEY §7.1 M6):

  - exact:      hash-groupBy on normalized text (one shuffle on the hash)
  - n-gram Jaccard: exact pairwise similarity restricted to pairs sharing
                a shingle (inverted-index self-join)
  - MinHash+LSH: shingle -> 12 portable minhashes -> 4 bands x 3 rows ->
                band-bucket self-join -> exact-Jaccard verification of the
                candidates only
  - SimHash:    60-bit fingerprint; candidate pairs via 4x15-bit band
                buckets, which by pigeonhole is EXACT for hamming <= 3
                (a pair differing in <= 3 bits must agree on >= 1 of 4
                disjoint bands), then verified with bit_count(xor).

Scale notes:
  - All joins key on shingle/band/bucket values - shuffle joins whose key
    cardinality grows with corpus size, so no broadcast is assumed.
  - Ultra-frequent shingles (stopword bigrams) are the skew hazard of the
    inverted-index join at 100 TB: cap document frequency with
    ``max_shingle_df`` (drops shingles present in more than that many docs
    from CANDIDATE GENERATION only; verification still uses all shingles,
    so similarity values stay exact).
  - Everything is built-in expressions (md5/conv/bit ops/higher-order
    functions); no Python executes per-row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import md5_int60, word_bigrams, words

NUM_PERM = 12
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on normalized (lower-cased) text.

    Returns one row per distinct content: (keep_id = min id, n_dups).
    """
    return (
        df.groupBy(F.md5(F.lower(F.col(text_col))).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .drop("content_hash")
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) pairs - distinct adjacent-word bigrams per document."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(word_bigrams(words(F.col(text_col)))).alias("s"))
        .distinct()
    )


def _pair_jaccard(sh: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard for document pairs sharing >= 1 shingle.

    If ``pairs`` (id_a, id_b) is given, only those candidates are verified -
    the scalable path: |candidates| << |all pairs|.
    """
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "s")
    b = sh.select(F.col("id").alias("id_b"), "s")
    joined = a.join(b, "s").where(F.col("id_a") < F.col("id_b"))
    if pairs is not None:
        joined = joined.join(pairs, ["id_a", "id_b"], "left_semi")
    common = joined.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("c"))
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    min_jaccard: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by exact word-bigram Jaccard >= threshold."""
    sh = shingles(df, id_col, text_col)
    return _pair_jaccard(sh).where(F.col("jaccard") >= min_jaccard)


def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """Per-document minhash signature columns s0..s{k-1}.

    Each "permutation" is an independent salted portable hash (min over
    shingles of md5-int60 of "k:shingle") - no multiply-mod permutations, so
    there is no integer-overflow hazard and any engine with md5 reproduces
    the signature bit-for-bit.
    """
    aggs = [F.min(md5_int60(F.col("s"), salt=str(k))).alias(f"s{k}") for k in range(num_perm)]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidates(
    sigs: DataFrame, bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """Candidate pairs: documents agreeing on all rows of >= 1 band."""
    banded = sigs.select(
        "id",
        *[
            F.concat_ws(",", *[F.col(f"s{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(f"b{b}")
            for b in range(bands)
        ],
    )
    per_band = []
    for b in range(bands):
        left = banded.select(F.col("id").alias("id_a"), F.col(f"b{b}").alias("bv"))
        right = banded.select(F.col("id").alias("id_b"), F.col(f"b{b}").alias("bv"))
        per_band.append(
            left.join(right, "bv").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        )
    return reduce(DataFrame.unionByName, per_band).distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    min_jaccard: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup pipeline: signatures -> band buckets -> exact
    verification of candidates only. Output: (id_a, id_b, jaccard)."""
    sh = shingles(df, id_col, text_col)
    cands = lsh_candidates(minhash_signatures(sh))
    return _pair_jaccard(sh, pairs=cands).where(F.col("jaccard") >= min_jaccard)


def simhash(sh: DataFrame) -> DataFrame:
    """60-bit SimHash per document from its shingle set.

    bit i of the fingerprint = sign of sum over shingles of (+1 if bit i of
    the shingle hash else -1). The bit explosion is a narrow transform;
    partial aggregation collapses it to 60 rows per document pre-shuffle.
    """
    h = sh.select("id", md5_int60(F.col("s")).alias("h"))
    bits = h.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("i"),
        F.col("h"),
    ).select(
        "id",
        "i",
        # SQL expr form: the python shiftright() wrapper only takes a
        # literal shift amount, the SQL function takes any expression
        (F.expr("shiftright(h, i)").bitwiseAND(F.lit(1)) * 2 - 1).alias("w"),
    )
    bit_votes = bits.groupBy("id", "i").agg(F.sum("w").alias("v"))
    return bit_votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs with SimHash hamming distance <= max_hamming.

    Candidates come from 4 disjoint 15-bit band buckets - EXACT (pigeonhole)
    for max_hamming <= 3, so this equals the brute-force all-pairs scan
    while joining only within buckets.
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("band pigeonhole requires max_hamming < number of bands")
    fp = simhash(shingles(df, id_col, text_col))
    banded = fp.select(
        "id",
        "simhash",
        *[
            F.shiftright(F.col("simhash"), b * SIMHASH_BAND_BITS)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .alias(f"b{b}")
            for b in range(SIMHASH_BANDS)
        ],
    )
    per_band = []
    for b in range(SIMHASH_BANDS):
        left = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"b{b}").alias("bv"))
        right = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"b{b}").alias("bv"))
        per_band.append(
            left.join(right, "bv")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b")
        )
    cands = reduce(DataFrame.unionByName, per_band).distinct()
    return (
        cands.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
