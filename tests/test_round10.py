"""Round-10 operator properties: plan shapes and the determinism /
exact-recall invariants the oracles can't express (partition invariance,
blocked-join recall vs brute force, order-invariant checksums)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_is_topk_not_global_sort(spark):
    """The E-S sample must plan as TakeOrderedAndProject (per-partition
    heaps of k rows) - a global Sort before the limit would be the 100 TB
    regression."""
    plan = _plan(QUERIES["pipe_sample_weighted"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    # the only Sort allowed is none at all: TakeOrdered subsumes it
    assert "Sort [" not in plan, plan


def test_weighted_sample_partition_invariant(spark):
    """The kept set is a pure function of (id, weight): any repartitioning
    must return the identical 100 rows in the identical order."""
    from web_maxiv_hdbppviewer_spark.operators.sampling import weighted_sample
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"].select("doc_id", "n_chars")
    a = weighted_sample(docs, 50).collect()
    b = weighted_sample(docs.repartition(7, "doc_id"), 50).collect()
    assert a == b


def test_fuzzy_pairs_no_cartesian_and_arg_contract(spark):
    """Blocking must keep the plan free of cartesian/nested-loop joins,
    and a length band narrower than the edit threshold (which would break
    exact recall) must be rejected loudly."""
    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    plan = _plan(QUERIES["dedup_fuzzy"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    docs = load_tables(spark, SF_SMOKE)["documents"]
    with pytest.raises(ValueError, match="len_band"):
        fuzzy_pairs(docs, max_lev=8, len_band=4)


def test_fuzzy_pairs_matches_brute_force_on_fixture(spark):
    """Exact-recall check on a corpus where every doc clears the
    pigeonhole bound (> gram_k * max_lev distinct 5-grams): the blocked
    join must find exactly the brute-force pairs."""
    base = "w%d " * 60
    texts = {
        0: base % tuple(range(60)),
        1: (base % tuple(range(60))).replace("w7 ", "w7x ", 1),  # lev 1
        2: (base % tuple(range(60))).replace("w30 ", "zz ", 1),  # lev ~3
        3: base % tuple(range(100, 160)),  # unrelated
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t.strip()) for i, t in texts.items()]
    )
    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs

    got = {
        (r.id_a, r.id_b): r.lev
        for r in fuzzy_pairs(df, max_lev=8, len_band=16).collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {}
    for ia, ib in itertools.combinations(sorted(texts), 2):
        a, b = texts[ia].strip(), texts[ib].strip()
        if abs(len(a) - len(b)) <= 16:
            d = lev(a, b)
            if d <= 8:
                want[(ia, ib)] = d
    assert got == want


def test_sparse_topk_no_cartesian_decimal_dot(spark):
    """The TF-IDF cosine join must stay on the inverted index (no
    cartesian) and the dot/norm sums must be decimal (exact, order-free) -
    a double sum here would be the determinism regression."""
    df = QUERIES["sim_sparse_topk"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the 1-row corpus-count broadcast and the weight pipeline live behind
    # the posting-list materialization; the visible join graph must be
    # hash joins only
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # the dot/norm sums aggregate DECIMAL weights (exact, order-free) - a
    # double weight column here would be the determinism regression
    from pyspark.sql.types import DecimalType

    from web_maxiv_hdbppviewer_spark.operators.textquality import (
        tfidf_term_weights,
    )
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"].limit(20)
    wts = tfidf_term_weights(docs, 3, 100)
    assert wts.schema["w"].dataType == DecimalType(18, 6)


def test_sparse_topk_partition_invariant(spark):
    from web_maxiv_hdbppviewer_spark.operators.textquality import (
        tfidf_cosine_pairs,
    )
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    a = tfidf_cosine_pairs(docs, 10).collect()
    b = tfidf_cosine_pairs(docs.repartition(13, "doc_id"), 10).collect()
    assert a == b


def test_vocab_coverage_broadcasts_vocab(spark):
    """The k-row vocab must broadcast back onto the token explode - a
    shuffle join on the word column would shuffle the whole corpus."""
    plan = _plan(QUERIES["text_vocab"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_manifest_is_order_and_partition_invariant(spark):
    """The xor checksum is the point of the operator: any row order /
    partitioning must reproduce identical manifests."""
    from web_maxiv_hdbppviewer_spark.plans.extensions import pipe_manifest
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    a = pipe_manifest(spark, SF_SMOKE).collect()
    docs = load_tables(spark, SF_SMOKE)["documents"]
    shuffled = docs.repartition(11).sortWithinPartitions(F.desc("n_chars"))
    from web_maxiv_hdbppviewer_spark.operators import sampling
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        SPLIT_FRACTIONS,
        md5_int60_text,
    )

    b = (
        sampling.hash_split(shuffled, SPLIT_FRACTIONS)
        .select("split", "source", "n_chars", "doc_id", md5_int60_text().alias("h"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("bit_xor(h)").alias("xor_h"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split", "source")
        .collect()
    )
    assert a == b
    # a single changed document must flip its group's checksum
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit(" x"))).otherwise(
            F.col("text")
        ),
    )
    c = (
        sampling.hash_split(mutated, SPLIT_FRACTIONS)
        .select("split", "source", md5_int60_text().alias("h"))
        .groupBy("split", "source")
        .agg(F.expr("bit_xor(h)").alias("xor_h"))
        .collect()
    )
    xa = {(r.split, r.source): r.xor_h for r in a}
    xc = {(r.split, r.source): r.xor_h for r in c}
    diff = [k for k in xa if xa[k] != xc[k]]
    assert len(diff) == 1, diff


def test_rolling_window_partitions_by_user_only(spark):
    """The RANGE frame must hash-partition by user_id - one exchange, no
    global sort (the final presentation orderBy is allowed its range
    exchange after the window)."""
    plan = _plan(QUERIES["events_rolling"](spark, SF_SMOKE))
    assert "hashpartitioning(user_id" in plan
    # the window sort is within user partitions: specifiedwindowframe RANGE
    assert "RANGE BETWEEN" in plan.upper() or "specifiedwindowframe(RangeFrame" in plan


def test_scd2_runs_reconstruct_stream(spark):
    """SCD2 invariants: per-user run_ids are 1..n_runs dense, intervals
    chain (valid_to == next valid_from, NULL only on the last run), and
    member counts sum to the user's event count."""
    rows = QUERIES["events_scd2"](spark, SF_SMOKE).collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    ev_counts = {
        r.user_id: r.n
        for r in load_tables(spark, SF_SMOKE)["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for uid, runs in by_user.items():
        runs.sort(key=lambda r: r.run_id)
        assert [r.run_id for r in runs] == list(range(1, len(runs) + 1))
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to_us == b.valid_from_us
            assert a.event_type != b.event_type  # runs are maximal
        assert runs[-1].valid_to_us is None
        assert sum(r.n_events for r in runs) == ev_counts[uid]


def test_keep_best_picks_max_quality_member(spark):
    """Every emitted representative must be a member of its cluster with
    the cluster-max quality (ties by lowest id), and cluster membership
    counts must agree with dedup_clusters."""
    reps = {r.cluster_id: r for r in QUERIES["dedup_keep_best"](spark, SF_SMOKE).collect()}
    clus = QUERIES["dedup_clusters"](spark, SF_SMOKE).collect()
    from collections import Counter

    sizes = Counter(r.cluster_id for r in clus)
    assert set(reps) == set(sizes)
    for cid, rep in reps.items():
        assert rep.n_members == sizes[cid]
    from web_maxiv_hdbppviewer_spark.operators.textquality import quality_scores
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    q = {
        r.doc_id: r.quality
        for r in quality_scores(load_tables(spark, SF_SMOKE)["documents"]).collect()
    }
    members = {}
    for r in clus:
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, rep in reps.items():
        best = sorted(members[cid], key=lambda d: (-q[d], d))[0]
        assert rep.rep_id == best and rep.rep_quality_r == q[best]


def test_knn_graph_no_cartesian_bounded_degree(spark):
    """Candidates must come from the band equi-joins (no cartesian), and
    every node's degree must be <= k with ranks dense from 1."""
    df = QUERIES["sim_knn_graph"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    from collections import defaultdict

    deg = defaultdict(list)
    for r in rows:
        deg[r.id].append(r.rk)
    for rid, rks in deg.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 3


def test_colstats_single_scan_expand(spark):
    """The multi-distinct stats card must plan as ONE scan with Expand -
    a scan per column would be the 100 TB regression."""
    plan = _plan(QUERIES["scale_colstats"](spark, SF_SMOKE))
    assert plan.count("FileScan") == 1, plan.count("FileScan")
    assert "Expand" in plan


def test_dedup_sweep_single_pair_generation(spark):
    """Five thresholds must reuse ONE prefix-filtered pair generation: the
    plan may scan documents for the shared shingle materialization but
    must contain exactly one Generate of the threshold explode per agg
    branch and no per-threshold re-join of the posting lists."""
    rows = QUERIES["pipe_dedup_sweep"](spark, SF_SMOKE).collect()
    by_t = {round(r.t, 2): r for r in rows}
    assert set(by_t) == {0.6, 0.7, 0.8, 0.9, 0.95}
    # monotone: tightening the bar can only shrink both counts
    ts = sorted(by_t)
    for a, b in zip(ts, ts[1:]):
        assert by_t[a].n_pairs >= by_t[b].n_pairs
        assert by_t[a].n_docs >= by_t[b].n_docs


def test_reweight_weights_sum_to_cluster_count(spark):
    """Soft-dedup invariant: weights within a cluster sum to ~1 (round-6
    per member), so total corpus mass ~= number of clusters."""
    rows = QUERIES["pipe_reweight"](spark, SF_SMOKE).collect()
    from collections import defaultdict

    acc = defaultdict(float)
    for r in rows:
        acc[r.cluster_id] += r.w_r
    for cid, s in acc.items():
        assert abs(s - 1.0) < 1e-4, (cid, s)


def test_domain_shift_nonnegative_and_partition_invariant(spark):
    """KL >= 0 up to round-6 term truncation; decimal sums make the
    result partition-invariant."""
    from web_maxiv_hdbppviewer_spark.plans.extensions import text_domain_shift
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    rows = text_domain_shift(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.kl_r > -1e-4, r
    # partition invariance via the registry path on a repartitioned clone
    docs = load_tables(spark, SF_SMOKE)["documents"]
    from pyspark.sql import functions as _F

    from web_maxiv_hdbppviewer_spark.functions.texthash import words

    toks = docs.repartition(9, "doc_id").select(
        "source", _F.explode(words(_F.col("text"))).alias("w")
    )
    # recompute through the same arithmetic
    cnt_ws = toks.groupBy("source", "w").agg(_F.count(_F.lit(1)).alias("c_sw"))
    n_s = cnt_ws.groupBy("source").agg(_F.sum("c_sw").alias("n_s"))
    cnt_w = cnt_ws.groupBy("w").agg(_F.sum("c_sw").alias("c_w"))
    n_tot = cnt_w.agg(_F.sum("c_w").alias("n_tot"))
    term = (
        cnt_ws.join(cnt_w, "w")
        .join(_F.broadcast(n_s), "source")
        .crossJoin(_F.broadcast(n_tot))
        .select(
            "source",
            "n_s",
            _F.round(
                (_F.col("c_sw") / _F.col("n_s"))
                * _F.log(
                    (_F.col("c_sw") * _F.col("n_tot")).cast("double")
                    / (_F.col("c_w") * _F.col("n_s"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("term"),
        )
    )
    again = {
        r.source: r.kl_r
        for r in term.groupBy("source")
        .agg(
            _F.first("n_s").cast("long").alias("n_tokens"),
            _F.sum("term").cast("double").alias("kl_r"),
        )
        .collect()
    }
    assert {r.source: r.kl_r for r in rows} == again


def test_fuzzy_pairs_matches_python_spec_on_random_corpora(spark):
    """Randomized spec check: on seeded corpora containing exact
    duplicates (lev 0), small edits, short docs below the pigeonhole
    bound, and unrelated noise, the operator must equal an independent
    python implementation of the full blocked semantics (shared distinct
    5-gram AND length band AND bounded levenshtein)."""
    import itertools
    import random

    def py_lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def spec(texts, max_lev, band):
        g5 = {}
        for i, t in texts.items():
            toks = [w for w in t.lower().split(" ") if w]
            g5[i] = {" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)}
        want = {}
        for ia, ib in itertools.combinations(sorted(texts), 2):
            if not (g5[ia] & g5[ib]):
                continue
            a, b = texts[ia], texts[ib]
            if abs(len(a) - len(b)) > band:
                continue
            d = py_lev(a, b)
            if d <= max_lev:
                want[(ia, ib)] = d
        return want

    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs

    for seed in (11, 23):
        rng = random.Random(seed)
        vocab = [f"w{k}" for k in range(30)]
        texts = {}
        i = 0
        for _ in range(6):  # base docs
            n = rng.randint(3, 40)  # includes short docs below pigeonhole
            texts[i] = " ".join(rng.choice(vocab) for _ in range(n))
            i += 1
        for b in range(4):  # near-dup clones of base docs: 0-2 word edits
            t = texts[b].split()
            for _ in range(rng.randint(0, 2)):
                t[rng.randrange(len(t))] = rng.choice(vocab)
            texts[i] = " ".join(t)
            i += 1
        texts[i] = texts[0]  # exact duplicate -> lev 0
        i += 1
        df = spark.createDataFrame(
            [Row(doc_id=k, text=t) for k, t in texts.items()]
        )
        got = {
            (r.id_a, r.id_b): r.lev
            for r in fuzzy_pairs(df, max_lev=8, len_band=16).collect()
        }
        assert got == spec(texts, 8, 16), f"seed {seed}"


def test_index_persist_earlier_frame_survives_later_call(spark):
    """Each persist call writes a fresh generation directory, so a frame
    returned by an earlier call must still collect after a later call
    (an in-place overwrite would delete its files underneath it); and
    serving pre-encoded codes without their codebooks must be rejected."""
    df1 = QUERIES["sim_index_persist"](spark, SF_SMOKE)
    df2 = QUERIES["sim_index_persist"](spark, SF_SMOKE)
    b = df2.collect()
    a = df1.collect()  # would raise FileNotFound under in-place overwrite
    assert a == b
    from web_maxiv_hdbppviewer_spark.operators.similarity import topk_cosine_pq
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    emb = load_tables(spark, SF_SMOKE)["embeddings"]
    with pytest.raises(ValueError, match="codebooks"):
        topk_cosine_pq(emb, 5, codes=emb.selectExpr("vec_id as id", "1 as m", "1 as code"))


def test_scd2_and_keep_best_windows_never_global(spark):
    """The SCD2 windows must partition by user_id and the keep-best
    argmax by cluster_id - a single-partition window (no PARTITION BY)
    would serialize the whole table through one task at scale."""
    for name in ("events_scd2", "dedup_keep_best"):
        plan = _plan(QUERIES[name](spark, SF_SMOKE))
        for line in plan.splitlines():
            if "Window [" in line:
                assert "[user_id" in line or "[cluster_id" in line, (
                    f"{name}: global window: {line.strip()[:120]}"
                )
