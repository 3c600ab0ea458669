"""Round-18 pins.

1. lsh_geometry_for (VERDICT r17 #5): the measured LSH band-width sizing
   rule as engine behavior - pinned at the three census scales against
   LSH_BUCKETS_r17.json's measured candidate counts, and as
   near_dup_pairs' default geometry.
2. ann_adc_ivfpq (VERDICT r17 #2): the ADC-once invariant behind the
   chunk probe sweep - filtering the max-nprobe scored frame by
   cell_rank reproduces each smaller setting's ann_topk_ivfpq ranking
   exactly.
"""

import json
import os

import pytest

from tests.conftest import SF_SMOKE

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _census():
    with open(os.path.join(HERE, "LSH_BUCKETS_r17.json")) as f:
        return json.load(f)


def test_lsh_geometry_rule_matches_measured_census():
    """expected_lsh_candidates is the model the sizing rule optimizes;
    it must track the r17 census. The background-dominated 8x8 rows sit
    within 25% above the estimate at all three scales (correlated real
    embeddings collide slightly more than the uniform model); every row
    measures AT LEAST the random-collision floor (true near-duplicates
    only ever add candidates)."""
    from web_maxiv_hdbppviewer_spark.operators.similarity import (
        expected_lsh_candidates,
    )

    census = _census()
    for key, row in census.items():
        bands, bits = (8, 8) if key.endswith("8x8") else (4, 16)
        exp = expected_lsh_candidates(row["n_vectors"], bands, bits)
        assert row["candidate_pairs"] >= 0.95 * exp, (key, exp)
        if key.endswith("8x8"):
            assert row["candidate_pairs"] <= 1.25 * exp, (key, exp)


def test_lsh_geometry_for_pins_census_scales():
    """The ladder reproduces the adjudicated geometries: 8x8 is right at
    2k vectors (4x16 collapses recall there: 233 candidates in the
    census), 4x16 is the validated geometry at 20k and at 200k (where
    8x8 generated 776M candidates and exhausted the disk -
    LSH_4X16_100X_r17.json), and a web-scale corpus within the 64-plane
    budget reaches the 2x32 production hash length."""
    from web_maxiv_hdbppviewer_spark.operators.similarity import (
        expected_lsh_candidates,
        lsh_geometry_for,
    )

    assert lsh_geometry_for(2_000) == (8, 8)
    assert lsh_geometry_for(20_000) == (4, 16)
    assert lsh_geometry_for(200_000) == (4, 16)
    assert lsh_geometry_for(10_000_000_000) == (2, 32)
    # the contract the rule enforces: expected random candidates stay
    # linear (<= 32 per vector) at every pinned scale
    for n in (2_000, 20_000, 200_000, 10_000_000_000):
        bands, bits = lsh_geometry_for(n)
        assert bands * bits == 64
        assert expected_lsh_candidates(n, bands, bits) <= 32 * n


def test_near_dup_pairs_defaults_to_rule_geometry(spark):
    """near_dup_pairs with no explicit geometry resolves
    lsh_geometry_for(corpus size) and returns the identical pair set as
    the explicit call - the r18 default wiring; declared queries keep
    pinning 8x8 (their oracles replay those bands)."""
    from web_maxiv_hdbppviewer_spark.operators import similarity
    from web_maxiv_hdbppviewer_spark.plans.extensions import _emb

    emb = _emb(spark, SF_SMOKE)
    n = emb.count()
    bands, bits = similarity.lsh_geometry_for(n)
    # min_cos=-1.0 keeps every banded candidate (sim_knn_graph's setting)
    # so the pair set is non-empty at the smoke corpus size; NO n_vectors
    # either, so the shipped df.count() -> lsh_geometry_for default path
    # is the one under test (r18 review)
    implicit = {
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in similarity.near_dup_pairs(emb, -1.0).collect()
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.near_dup_pairs(emb, -1.0, bands=4)  # half-pinned geometry
    explicit = {
        (r["id_a"], r["id_b"], r["cos_r"])
        for r in similarity.near_dup_pairs(
            emb, -1.0, bands=bands, band_bits=bits
        ).collect()
    }
    assert implicit == explicit
    assert implicit, "banded candidates should exist at the smoke corpus"


def test_adc_cell_rank_filter_reproduces_each_nprobe(spark):
    """The invariant the r18 sweep plan rests on: ann_adc_ivfpq at
    nprobe_max=4 filtered to cell_rank <= k, re-ranked per query,
    equals ann_topk_ivfpq run at nprobe=k - for every k in the sweep."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import similarity
    from web_maxiv_hdbppviewer_spark.plans import extensions as ext

    store = ext._chunk_vec_store(spark, SF_SMOKE)
    cents, rcb = ext._chunk_ivfpq_artifacts(spark, SF_SMOKE)
    kw = dict(id_col="rid", vec_col="cvec", centroids=cents, codebooks=rcb)
    adc = similarity.ann_adc_ivfpq(
        store, ext.QUERY_IDS_BELOW, ext.IVF_CELLS,
        max(ext.IVF_SWEEP_PROBES), ext.KMEANS_ITERS, **kw
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("q_id").orderBy(
        F.col("acos_r").desc(), F.col("cand_id").asc()
    )
    for np_ in ext.IVF_SWEEP_PROBES:
        filtered = {
            (r["q_id"], r["cand_id"], r["acos_r"], r["rank"])
            for r in adc.where(F.col("cell_rank") <= np_)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= ext.CHUNK_ANN_CAND_K)
            .collect()
        }
        direct = {
            (r["q_id"], r["cand_id"], r["acos_r"], r["rank"])
            for r in similarity.ann_topk_ivfpq(
                store, ext.CHUNK_ANN_CAND_K, ext.QUERY_IDS_BELOW,
                ext.IVF_CELLS, np_, ext.KMEANS_ITERS, **kw
            ).collect()
        }
        assert filtered == direct, f"nprobe={np_}"


def test_url_dedup_collapse_is_canonicalization_work(spark):
    """pipe_url_dedup's constructed-collapse pin (VERDICT r17 #6): every
    raw crawl URL is a DISTINCT string (exact string dedup would keep
    all of them), yet canonicalization collapses each 3-fetch group to
    one canonical URL - and the kept fetch is exactly the
    (crawl_ts DESC, doc_id DESC) winner recomputed from the raw frame."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.plans import extensions as ext

    raw = ext._crawl_urls(spark, SF_SMOKE)
    n_docs = raw.count()
    assert raw.select("url").distinct().count() == n_docs
    out = ext.pipe_url_dedup(spark, SF_SMOKE).collect()
    assert len(out) < n_docs
    assert sum(r["n_crawls"] for r in out) == n_docs
    assert max(r["n_crawls"] for r in out) == 3
    # keep-latest replay: winner per canonical URL from the raw frame
    best = {}
    for r in raw.select(
        ext.canonical_url(F.col("url")).alias("c"), "doc_id", "crawl_ts"
    ).collect():
        k = (r["crawl_ts"], r["doc_id"])
        if r["c"] not in best or k > best[r["c"]]:
            best[r["c"]] = k
    for r in out:
        ts, did = best[r["canon_url"]]
        assert (r["kept_crawl_ts"], r["kept_doc_id"]) == (ts, did)


def test_canonical_url_channels(spark):
    """The regex chain on constructed literals: fragment strip,
    scheme/www/case strip, tracking-param removal ANCHORED to its ?/&
    separator (a real param whose name merely contains a tracking name -
    href=, xref= - is untouched) preserving real params in either order,
    and trailing-slash strip."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.plans.extensions import canonical_url

    cases = {
        "https://WWW.Site.org/a/page1": "site.org/a/page1",
        "http://site.org/a/page1/": "site.org/a/page1",
        "https://site.org/a/page1?utm_source=feed": "site.org/a/page1",
        "https://site.org/a/page1?page=2&utm_source=feed":
            "site.org/a/page1?page=2",
        "https://site.org/a/page1?utm_campaign=x&page=2":
            "site.org/a/page1?page=2",
        "https://site.org/a/page1?ref=social": "site.org/a/page1",
        "https://site.org/a/page1?fbclid=abc#sec": "site.org/a/page1",
        "https://site.org/a/page1#sec": "site.org/a/page1",
        "https://site.org/a/page1?href=x&utm_a=1":
            "site.org/a/page1?href=x",
        "https://site.org/a/page1?xref=2": "site.org/a/page1?xref=2",
        "https://site.org/a/page1?utm_a=1&utm_b=2&page=3":
            "site.org/a/page1?page=3",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    assert got == cases


def test_ivf_flat_cell_rank_filter_reproduces_each_nprobe(spark):
    """The flat-index twin of the ADC-once invariant: ann_scored_ivf at
    nprobe_max=4 filtered to cell_rank <= k, re-ranked per query, equals
    ann_topk_ivf at nprobe=k - the plan sim_ivf_probe_sweep runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import similarity
    from web_maxiv_hdbppviewer_spark.plans import extensions as ext

    emb = ext._emb(spark, SF_SMOKE)
    scored = similarity.ann_scored_ivf(
        emb, ext.QUERY_IDS_BELOW, ext.IVF_CELLS, max(ext.IVF_SWEEP_PROBES)
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_r").desc(), F.col("cand_id").asc()
    )
    for np_ in ext.IVF_SWEEP_PROBES:
        filtered = {
            (r["q_id"], r["cand_id"], r["cos_r"], r["rank"])
            for r in scored.where(F.col("cell_rank") <= np_)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= ext.ANN_TOPK)
            .collect()
        }
        direct = {
            (r["q_id"], r["cand_id"], r["cos_r"], r["rank"])
            for r in similarity.ann_topk_ivf(
                emb, ext.ANN_TOPK, ext.QUERY_IDS_BELOW, ext.IVF_CELLS, np_
            ).collect()
        }
        assert filtered == direct, f"nprobe={np_}"


def test_minhash_empty_signature_docs_generate_no_candidates(spark):
    """The r18 LSH hardening pin: documents with NO retained shingles
    (fully df-capped boilerplate, or shorter than the shingle width)
    are dropped from the signature frame instead of collapsing into one
    all-colliding "" band bucket whose self-join is quadratic in the
    boilerplate population - the exact skew blowup max_shingle_df
    exists to prevent."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import dedup

    # 40 identical templated docs: every bigram has df=40
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta").alias("text"),
    )
    arrays = dedup.doc_shingle_arrays(docs, "doc_id", "text")
    # df-cap below the corpus df: every shingle filtered, no signatures
    sigs = dedup.minhash_signatures(arrays, max_shingle_df=5)
    assert sigs.count() == 0
    assert dedup.lsh_candidates(sigs).count() == 0
    # uncapped, the same docs all collide legitimately (true duplicates)
    pairs = dedup.minhash_dedup_pairs(docs, 0.9, "doc_id", "text")
    assert pairs.count() == 40 * 39 // 2
    # a doc too short to produce a single shingle is dropped, not
    # "" -bucketed against other short docs
    tiny = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    assert dedup.minhash_dedup_pairs(tiny, 0.0, "doc_id", "text").count() == 0


def test_streaming_raster_watermark_hardening(spark, tmp_path):
    """r18 streaming-raster pins: (1) the unclipped synthetic event time
    bins with xbin_long - a far-out-of-canvas event (epoch-0 on a zoomed
    canvas) yields a faithful far-NEGATIVE column, where the int32-
    narrowed xbin wraps it to a garbage positive column that would jump
    the watermark months ahead; (2) the event-time watermark sits BELOW
    the y-range filter in the OPTIMIZED plan of a STARTED query, so
    out-of-band excursions still advance event time (frozen-watermark
    stall). r19 (ADVICE r18 high): asserting on the analyzed plan was
    vacuous - PushPredicateThroughNonJoin pushed a plain value-range
    predicate back below EventTimeWatermark at optimization time; the
    predicate now references _col_ts so it CANNOT be pushed, and this
    test pins the optimized plan of an executed micro-batch."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators.raster import xbin, xbin_long
    from web_maxiv_hdbppviewer_spark.streaming.incremental import (
        streaming_raster_windowed,
    )

    # zoomed canvas: 60 s span, 1000 columns; one epoch-0 event
    x0 = 1_704_067_200_000_000
    span, nx = 60_000_000.0, 1000
    row = spark.range(1).select(F.lit(0).cast("long").alias("t_us"))
    got = row.select(
        xbin_long(F.col("t_us"), x0, span, nx).alias("ok")
    ).collect()[0]
    assert got["ok"] < -(1 << 31), "epoch-0 must bin beyond int32 range"
    # the int32-narrowed form cannot represent this column at all: under
    # ANSI (Spark 4 default) the cast THROWS - which in the streaming
    # raster would kill the live query on one corrupt row; with ANSI off
    # it wraps to a garbage positive column that jumps the watermark
    with pytest.raises(Exception, match="CAST_OVERFLOW|overflow"):
        row.select(xbin(F.col("t_us"), x0, span, nx)).collect()

    src = str(tmp_path / "wm_src")
    batch = spark.range(10).select(
        F.timestamp_micros(F.lit(x0) + F.col("id") * 1_000_000).alias("ts"),
        (F.col("id") * 0.1).alias("value"),
    )
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    plan = streaming_raster_windowed(stream, x0, 60_000_000.0, 100, 0.0, 1.0, 80)
    # trigger(once) runs the data in ONE micro-batch, so explainInternal
    # reports that batch's plan (availableNow appends a trailing EMPTY
    # batch whose collapsed plan would hide the filter entirely)
    q = (
        plan.writeStream.format("memory")
        .queryName("wm_hardening")
        .outputMode("append")
        .trigger(once=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    optimized = q._jsq.explainInternal(True)
    opt = optimized[optimized.find("== Optimized Logical Plan =="):]
    wpos = opt.find("EventTimeWatermark")
    assert wpos > 0, opt[:500]
    # the value-range predicate must survive optimization ABOVE the
    # watermark operator (earlier offset = outer/later-executing in the
    # root-first plan text); before the r19 fix its first occurrence
    # was in a pushed-down Filter BELOW the watermark
    vrange = opt.find(">= 0.0")
    assert 0 <= vrange < wpos, (
        "y-range filter must sit ABOVE EventTimeWatermark in the "
        "OPTIMIZED plan, so every event advances event time:\n"
        + opt[:1200]
    )
