"""Round-11 operator properties: the dedup_fuzzy posting-list df-cap
(skew bound) with its R x R guarantee-restoring fallback, signed-zero
canonicalization, and the PQ index append lifecycle."""

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ---------------------------------------------------------------- fuzzy cap


def test_fuzzy_df_cap_is_in_the_plan_and_contract_enforced(spark):
    """The posting-list frequency bound must actually reach the plan (a
    HAVING df <= cap over the gram index - without it one boilerplate
    gram shared by a million docs yields ~10^12 candidate rows), and a
    cap that cannot admit a pair must be rejected loudly."""
    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    from web_maxiv_hdbppviewer_spark.operators import dedup as dedup_mod

    docs = load_tables(spark, SF_SMOKE)["documents"]
    fuzzy_pairs(docs, df_cap=64)  # populates the session gram/rare memo
    # the capped posting plan is a session-memoized localCheckpoint, so
    # the HAVING df <= cap filter lives in the cached ORIGIN plan, not
    # the consumer's (which reads the checkpoint)
    assert any(
        "<= 64" in p._jdf.queryExecution().optimizedPlan().toString()
        for _, p, _ in dedup_mod._FUZZY_RARE_CACHE
    ), "df-cap filter missing from the memoized posting plan"
    plan = _plan(QUERIES["dedup_fuzzy"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError, match="df_cap"):
        fuzzy_pairs(docs, df_cap=1)


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _capped_spec(texts, max_lev, band, cap, gram_k=5):
    """Independent python model of the CAPPED blocked semantics: pairs
    sharing an uncapped distinct word-5-gram, plus the R x R fallback
    (R = docs whose raw gram count clears the pigeonhole bound
    D = (gram_k+1)*max_lev but whose uncapped count does not), then the
    length band and the bounded levenshtein."""
    d_bound = (gram_k + 1) * max_lev
    grams = {}
    for i, t in texts.items():
        toks = [w for w in t.lower().split(" ") if w]
        grams[i] = {
            " ".join(toks[j : j + gram_k])
            for j in range(len(toks) - gram_k + 1)
        }
    df = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    unc = {i: {g for g in gs if df[g] <= cap} for i, gs in grams.items()}
    r_set = {
        i for i, gs in grams.items()
        if len(gs) > d_bound and len(unc[i]) <= d_bound
    }
    want = {}
    for ia, ib in itertools.combinations(sorted(texts), 2):
        blocked = bool(unc[ia] & unc[ib]) or (ia in r_set and ib in r_set)
        if not blocked:
            continue
        a, b = texts[ia], texts[ib]
        if abs(len(a) - len(b)) > band:
            continue
        d = _py_lev(a, b)
        if d <= max_lev:
            want[(ia, ib)] = d
    return want


def test_fuzzy_df_cap_fallback_restores_recall(spark):
    """Adversarial corpus for the cap: four near-identical 60-word docs
    whose every shared gram is boilerplate (df above the cap). The pair
    whose only common grams are capped is findable ONLY through the
    R x R fallback - the operator must still return every true pair,
    equal to both the capped python spec and plain brute force."""
    base_words = [f"w{k}" for k in range(60)]
    base = " ".join(base_words)
    texts = {
        0: base,
        1: base.replace("w30 ", "w30x ", 1),  # lev 1 from doc 0
        2: base,
        3: base,
        4: " ".join(f"u{k}" for k in range(60)),  # unrelated, same length
        5: "short doc below the pigeonhole bound",
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs

    cap = 3
    got = {
        (r.id_a, r.id_b): r.lev
        for r in fuzzy_pairs(df, max_lev=8, len_band=16, df_cap=cap).collect()
    }
    spec = _capped_spec(texts, 8, 16, cap)
    assert got == spec

    # brute-force recall: every true pair among the de-guaranteed docs
    # must be present (this is exactly what the fallback restores)
    brute = {
        (ia, ib): _py_lev(texts[ia], texts[ib])
        for ia, ib in itertools.combinations(sorted(texts), 2)
        if _py_lev(texts[ia], texts[ib]) <= 8
        and abs(len(texts[ia]) - len(texts[ib])) <= 16
    }
    assert got == brute

    # the test's own power: without the fallback, pair (0, 1) would be
    # missed (their only shared grams are capped boilerplate)
    no_fallback = _capped_spec(texts, 8, 16, cap)
    d_bound = 48
    grams0 = {
        " ".join(base_words[j : j + 5]) for j in range(len(base_words) - 4)
    }
    assert len(grams0) > d_bound  # docs clear the raw pigeonhole bound
    spec_no_r = {}
    for (ia, ib), lev in no_fallback.items():
        toks_a = [w for w in texts[ia].lower().split() if w]
        toks_b = [w for w in texts[ib].lower().split() if w]
        ga = {" ".join(toks_a[j : j + 5]) for j in range(len(toks_a) - 4)}
        gb = {" ".join(toks_b[j : j + 5]) for j in range(len(toks_b) - 4)}
        dfreq = {}
        for i, t in texts.items():
            toks = [w for w in t.lower().split() if w]
            for g in {" ".join(toks[j : j + 5]) for j in range(len(toks) - 4)}:
                dfreq[g] = dfreq.get(g, 0) + 1
        if {g for g in ga & gb if dfreq[g] <= cap}:
            spec_no_r[(ia, ib)] = lev
    assert (0, 1) in got and (0, 1) not in spec_no_r


def test_fuzzy_capped_still_matches_uncapped_when_cap_is_loose(spark):
    """With a cap no posting list reaches, results must be IDENTICAL to
    the uncapped formulation (the fallback set is empty and the cap is
    a no-op) - pins that adding the dial changed nothing for ordinary
    corpora, including the r10 driver-witnessed output."""
    from web_maxiv_hdbppviewer_spark.operators.dedup import fuzzy_pairs
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    capped = sorted(
        (r.id_a, r.id_b, r.lev)
        for r in fuzzy_pairs(docs, df_cap=64).collect()
    )
    loose = sorted(
        (r.id_a, r.id_b, r.lev)
        for r in fuzzy_pairs(docs, df_cap=1 << 30).collect()
    )
    assert capped == loose and capped


def test_repeated_substrings_matches_python_spec_on_random_corpora(spark):
    """Randomized spec check: on seeded corpora with planted block
    copies at random offsets, within-doc repeats, and noise, the
    operator must equal an independent python implementation of the
    windows -> global counts -> island-merge semantics."""
    import random

    def spec(texts, k):
        wins, cnt = {}, {}
        for i, t in texts.items():
            toks = [w for w in t.lower().split(" ") if w]
            ws = [" ".join(toks[p : p + k]) for p in range(len(toks) - k + 1)]
            wins[i] = (len(toks), ws)
            for w in ws:
                cnt[w] = cnt.get(w, 0) + 1
        out = {}
        for i, (n, ws) in wins.items():
            if n < k:
                continue
            runs = []
            for p in [p for p, w in enumerate(ws) if cnt[w] >= 2]:
                if runs and p - runs[-1][1] <= k:
                    runs[-1] = (runs[-1][0], p)
                else:
                    runs.append((p, p))
            out[i] = (
                n,
                len(runs),
                sum(b - a + k for a, b in runs),
                max((b - a + k for a, b in runs), default=0),
            )
        return out

    from web_maxiv_hdbppviewer_spark.operators.dedup import repeated_substrings

    k = 6
    for seed in (3, 41):
        rng = random.Random(seed)
        vocab = [f"w{j}" for j in range(25)]
        texts = {}
        for i in range(8):  # noise docs, some below k tokens
            texts[i] = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(3, 30))
            )
        donor = [rng.choice(vocab) for _ in range(24)]
        texts[8] = " ".join(donor)
        # planted copies: a block of the donor at a random offset
        for i in (9, 10):
            blk = donor[rng.randint(0, 6) : rng.randint(14, 24)]
            pre = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
            post = [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
            texts[i] = " ".join(pre + blk + post)
        texts[11] = texts[8] + " " + texts[8]  # within-doc repeat
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in texts.items()]
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_runs, r.dup_tokens, r.longest_run)
            for r in repeated_substrings(df, k).collect()
        }
        assert got == spec(texts, k), f"seed {seed}"


def test_index_append_codes_equal_full_reencode(spark):
    """The in-engine half of the append contract (the oracle proves it
    against SQL; this proves it against the engine's own bulk path):
    the served combined code table must equal pq_assign of the WHOLE
    corpus against the same frozen codebooks."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import similarity
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        _emb,
        _pq_base_codebooks,
    )

    emb = _emb(spark, SF_SMOKE)
    cb = _pq_base_codebooks(spark, SF_SMOKE)
    full = {
        (r.id, r.m): r.code
        for r in similarity.pq_assign(emb, cb).collect()
    }
    batch = emb.where(F.col("vec_id") % 10 == 3)
    base = emb.where(~(F.col("vec_id") % 10 == 3))
    pieces = {
        (r.id, r.m): r.code
        for part in (base, batch)
        for r in similarity.pq_assign(part, cb).collect()
    }
    assert pieces == full and full


def test_mixture_schedule_random_counts_property(spark):
    """Apportionment property on random synthetic domain tables: for
    random counts and budgets, slots sum exactly to the budget and each
    domain receives floor(quota) or floor(quota)+1."""
    import random

    from web_maxiv_hdbppviewer_spark.operators.sampling import mixture_schedule

    rng = random.Random(17)
    for trial in range(3):
        doms = {f"d{j}": rng.randint(1, 500) for j in range(rng.randint(2, 12))}
        rows = [
            Row(doc_id=i, source=s)
            for i, s in enumerate(
                [s for s, n in doms.items() for _ in range(n)]
            )
        ]
        df = spark.createDataFrame(rows)
        total = rng.randint(1, 5000)
        got = {
            r.source: r.slots
            for r in mixture_schedule(df, total, strata_col="source").collect()
        }
        n_all = sum(doms.values())
        assert sum(got.values()) == total, (trial, total)
        for s, n in doms.items():
            lo = total * n // n_all
            assert got[s] in (lo, lo + 1), (trial, s)


# ------------------------------------------------- apportionment + MIPS


def test_mixture_schedule_sums_exactly_and_matches_spec(spark):
    """Hamilton apportionment invariants: slots sum to EXACTLY the
    budget for awkward budgets (the defining property largest-remainder
    guarantees and independent per-domain rounding does not), each
    domain gets floor or floor+1 of its exact quota, and an independent
    python spec agrees. Non-positive budgets are rejected."""
    from web_maxiv_hdbppviewer_spark.operators.sampling import mixture_schedule
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMOKE)["documents"]
    counts = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())

    def spec(total):
        base = {s: total * n // n_total for s, n in counts.items()}
        rem = {s: total * n % n_total for s, n in counts.items()}
        left = total - sum(base.values())
        order = sorted(counts, key=lambda s: (-rem[s], s))
        return {
            s: base[s] + (1 if order.index(s) < left else 0) for s in counts
        }

    for total in (7, 100, 999, 100_000):
        got = {
            r.source: r.slots
            for r in mixture_schedule(docs, total, strata_col="source").collect()
        }
        assert sum(got.values()) == total
        assert got == spec(total), total
    with pytest.raises(ValueError, match="total_slots"):
        mixture_schedule(docs, 0)


def test_mips_reduction_contract_and_plan(spark):
    """sim_mips: every row certifies the norm-augmentation reduction
    (raw augmented-cosine rank == raw inner-product rank), the ranking
    is inner-product (not cosine - on unnormalized vectors they MUST
    differ somewhere in the top-k), and the plan keeps the per-query
    side broadcast with no cartesian product."""
    rows = QUERIES["sim_mips"](spark, SF_SMOKE).collect()
    assert rows and all(r.aug_ok for r in rows)
    plan = _plan(QUERIES["sim_mips"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # the bounded per-query broadcast cross (10 rows) plans as
    # BroadcastNestedLoopJoin BuildRight - the intended brute-force
    # baseline shape, same as topk_cosine / the IVF centroid broadcast;
    # what must NOT happen is the corpus on the build side
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    # inner-product vs cosine objective: on a frame where the aligned
    # candidate is SHORT and the off-angle candidate is LONG, cosine
    # prefers the aligned one but MIPS must prefer the long one (on the
    # near-unit-norm corpus fixture the two top-5s happen to coincide,
    # which is why this is pinned synthetically)
    from web_maxiv_hdbppviewer_spark.operators.similarity import topk_mips

    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),   # query
            Row(vec_id=1, embedding=[0.6, 0.0]),   # aligned, short: ip 0.6
            Row(vec_id=2, embedding=[2.0, 2.0]),   # 45 deg, long:  ip 2.0
        ]
    )
    got = {
        r.rank: (r.cand_id, r.ip_r, r.aug_ok)
        for r in topk_mips(df, 2, query_ids_below=1).collect()
    }
    assert got == {1: (2, 2.0, True), 2: (1, 0.6, True)}


# ------------------------------------------------------------ signed zero


def test_pq_index_generation_retention(spark):
    """Generation directories must not accumulate for the process
    lifetime (r10 advisor finding): after N persist/append calls at the
    same sf, at most _PQ_GEN_RETAIN generation dirs may remain on disk -
    while the immediately-preceding generation always survives, so a
    frame returned by the previous call still collects."""
    import glob
    import os

    from web_maxiv_hdbppviewer_spark.plans import extensions as ext

    prev = QUERIES["sim_index_persist"](spark, SF_SMOKE)
    QUERIES["sim_index_append"](spark, SF_SMOKE).collect()
    assert prev.count() > 0  # the immediately-preceding generation survives
    QUERIES["sim_index_persist"](spark, SF_SMOKE).collect()
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.removeprefix("file:")
    dirs = glob.glob(os.path.join(wh, "pq_index_*", "gen_*"))
    live = [d for d in dirs if f"gen_{os.getpid()}_" in d]
    assert len(live) <= ext._PQ_GEN_RETAIN, live


def test_index_append_serves_batch_rows(spark):
    """The appended batch must actually be SERVED: batch ids
    (vec_id % 10 == 3) appear among returned candidates, every query id
    gets exactly 5 ranked rows, and the result is call-stable."""
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        APPEND_MOD,
        APPEND_RESIDUE,
    )

    rows = QUERIES["sim_index_append"](spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert all(len(v) == 5 for v in by_q.values())
    assert any(
        r.cand_id % APPEND_MOD == APPEND_RESIDUE for r in rows
    ), "no appended-batch vector was ever served"


# ---------------------------------------------------------- substr dedup


def test_repeated_substrings_matches_python_spec(spark):
    """Planted-corpus spec check for the ExactSubstr accounting: doc 1
    embeds a 20-token block of doc 0 at an offset that straddles the
    fixed 8-token span grid; an independent python implementation of
    windows -> global counts -> island merge must agree exactly, and
    the covered-token count must equal the planted block (plus nothing
    else) in both docs."""
    k = 12
    import random

    rng = random.Random(7)
    va = [f"a{i}" for i in range(40)]
    block = va[10:30]  # 20-token block, repeated verbatim in doc 1
    vb = [f"b{i}" for i in range(9)] + block + [f"c{i}" for i in range(11)]
    vc = [f"d{i}" for i in range(35)]  # unrelated
    texts = {0: " ".join(va), 1: " ".join(vb), 2: " ".join(vc)}

    def spec(texts, k):
        wins = {}
        cnt = {}
        for i, t in texts.items():
            toks = [w for w in t.lower().split(" ") if w]
            ws = [
                " ".join(toks[p : p + k]) for p in range(len(toks) - k + 1)
            ]
            wins[i] = (len(toks), ws)
            for w in ws:
                cnt[w] = cnt.get(w, 0) + 1
        out = {}
        for i, (n, ws) in wins.items():
            if n < k:
                continue
            dups = [p for p, w in enumerate(ws) if cnt[w] >= 2]
            runs = []
            for p in dups:
                if runs and p - runs[-1][1] <= k:
                    runs[-1] = (runs[-1][0], p)
                else:
                    runs.append((p, p))
            toks_cov = sum(b - a + k for a, b in runs)
            longest = max((b - a + k for a, b in runs), default=0)
            out[i] = (n, len(runs), toks_cov, longest)
        return out

    from pyspark.sql.functions import col
    from web_maxiv_hdbppviewer_spark.operators.dedup import repeated_substrings

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()]
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_runs, r.dup_tokens, r.longest_run)
        for r in repeated_substrings(df, k).collect()
    }
    assert got == spec(texts, k)
    # the planted block is found at its exact 20-token extent in BOTH
    # docs - the straddling case the non-overlapping span grid misses
    assert got[0] == (40, 1, 20, 20)
    assert got[1] == (40, 1, 20, 20)
    assert got[2] == (35, 0, 0, 0)


def test_repeated_substrings_plan_is_two_shuffles_no_joins_on_corpus(spark):
    """Scale pin: the substr accounting must stay corpus-linear - the
    only corpus-width join is the final per-doc stats attach (doc-grain,
    not window-grain), and no cartesian/broadcast-nested-loop appears."""
    plan = _plan(QUERIES["dedup_substr"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_covariance_never_emits_negative_zero(spark):
    """IEEE signed zero: a covariance in (-0.5e-6, 0] rounds to a zero
    whose sign bit differs across engines (the r10 sim_pca_gram driver
    hash-FAIL: cell (5,9) was -0.0 in DuckDB, +0.0 in Spark). The
    engine must canonicalize every zero to +0.0."""
    import math

    rows = QUERIES["sim_pca_gram"](spark, SF_SMOKE).collect()
    zeros = [r.cov_r for r in rows if r.cov_r == 0.0]
    assert all(math.copysign(1.0, z) > 0 for z in zeros)
    # the canonicalization term must survive into the physical plan
    plan = _plan(QUERIES["sim_pca_gram"](spark, SF_SMOKE))
    assert "+ 0.0" in plan
