"""Round-16 constructed tests.

1. pipe_url_filter (VERDICT r15 #4, RefinedWeb stage 0, Penedo et al.
   2023 §3.1): constructed-residue corpus where each of the four rules
   fires on exactly one known document (blocklist / soft word score /
   digit ratio / URL length) plus one clean survivor; a pure-Python
   replay of the whole derivation + rule arithmetic over the real smoke
   corpus (every column, every row).
2. pipe_curation_sweep (VERDICT r15 #7): structural monotonicity in the
   retention percentile, pct=100 boundary equals the branch totals, the
   NB branch is a subset of the unfiltered branch, and the integer
   nearest-rank formula equals math.ceil(pct*n/100) over an exhaustive
   grid.
3. sim_chunk_ann (VERDICT r15 #8): the chunk embedding store's dense-id
   and binary-grid derivation contracts (pure-Python twin), and the
   parent-doc max-pool's structural facts (rank sequences, ordering,
   distinct docs, self-parent exclusion, store-consistent coordinates).
"""

import math

from tests.conftest import SF_SMOKE
from tests.test_round14 import _constructed_corpus


# --- 1. URL/domain filtering ------------------------------------------------


def test_pipe_url_filter_every_rule_fires(spark, tmp_path):
    """Five docs chosen by residue so each rule fires alone: id 21
    (21 % 16 = 5 -> free-prize-claim.net, blocklisted; 'prize' scores
    15 tenths, below the 20 bar, so ONLY f_blocklist), id 13 (path word
    poker -> 20 tenths, clean domain -> only f_words), id 23 (23 % 23 =
    0 -> 18-digit tracking tail -> only f_digits), id 76 (76 % 19 = 0
    -> 68-char section chain, 108-char URL -> only f_length), id 3
    (clean on every rule -> keep). Exact URLs, scores and round-6 digit
    fractions hand-computed."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    docs = spark.createDataFrame(
        [(i, "en", "src", "some text") for i in (3, 13, 21, 23, 76)],
        "doc_id long, lang string, source string, text string",
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    rows = {
        r["doc_id"]: r
        for r in extensions.pipe_url_filter(spark, sf_dir).collect()
    }
    assert set(rows) == {3, 13, 21, 23, 76}

    flags = lambda r: (  # noqa: E731
        r["f_blocklist"], r["f_words"], r["f_digits"], r["f_length"]
    )
    # id 3: clean everywhere
    assert rows[3]["url"] == "https://daily-news-site.com/travel/item3"
    assert flags(rows[3]) == (False, False, False, False)
    assert rows[3]["keep"] is True and rows[3]["score_tenths"] == 0
    # id 21: blocklisted domain; 'prize' inside it scores 15 < 20
    assert rows[21]["url"] == "https://free-prize-claim.net/history/item21"
    assert flags(rows[21]) == (True, False, False, False)
    assert rows[21]["score_tenths"] == 15 and rows[21]["keep"] is False
    # id 13: banned path word on a clean domain
    assert rows[13]["url"] == "https://news-world.org/poker/item13"
    assert flags(rows[13]) == (False, True, False, False)
    assert rows[13]["score_tenths"] == 20 and rows[13]["keep"] is False
    # id 23: 18-digit tracking tail -> digit fraction 20/58
    assert rows[23]["url"] == (
        "https://home-cooking.net/recipes/item23/" + "7" * 16 + "23"
    )
    assert flags(rows[23]) == (False, False, True, False)
    assert rows[23]["digit_frac_r"] == round(20 / 58, 6)
    assert rows[23]["keep"] is False
    # id 76: section chain pushes the URL past the 80-char cap
    assert rows[76]["url"] == (
        "https://maps-service.com/history/item76/" + "long-section-name" * 4
    )
    assert flags(rows[76]) == (False, False, False, True)
    assert rows[76]["url_len"] == 108 and rows[76]["keep"] is False


def _python_url_twin(doc_id):
    """The _doc_urls derivation + rules replayed in pure Python."""
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        _URL_BANNED_TENTHS,
        _URL_BLOCKLIST,
        _URL_DIGIT_FRAC,
        _URL_DOMAINS,
        _URL_MAX_LEN,
        _URL_PATH_WORDS,
        _URL_SCORE_BAR_TENTHS,
    )

    domain = _URL_DOMAINS[doc_id % 16]
    url = (
        f"https://{domain}/{_URL_PATH_WORDS[doc_id % 11]}/item{doc_id}"
    )
    if doc_id % 23 == 0:
        url += "/" + str(doc_id % 1_000_000_000).rjust(18, "7")
    if doc_id % 19 == 0:
        url += "/" + "long-section-name" * 4
    score = sum(t for w, t in _URL_BANNED_TENTHS if w in url)
    n_digit = sum(c.isdigit() for c in url)
    digit_frac = round(n_digit / len(url), 6)
    f_block = domain in _URL_BLOCKLIST
    f_words = score >= _URL_SCORE_BAR_TENTHS
    f_digits = digit_frac > _URL_DIGIT_FRAC
    f_length = len(url) > _URL_MAX_LEN
    return {
        "url": url,
        "f_blocklist": f_block,
        "f_words": f_words,
        "f_digits": f_digits,
        "f_length": f_length,
        "score_tenths": score,
        "digit_frac_r": digit_frac,
        "url_len": len(url),
        "keep": not (f_block or f_words or f_digits or f_length),
    }


def test_pipe_url_filter_python_twin_on_real_corpus(spark):
    """Every row of the real smoke corpus against the pure-Python
    replay - every column, so a drifted list constant, threshold, or
    lpad direction fails here before parity does. Also: each rule
    fires somewhere on the real corpus (non-vacuous attribution)."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.pipe_url_filter(spark, SF_SMOKE).collect()
    assert rows
    fired = {k: False for k in ("f_blocklist", "f_words", "f_digits", "f_length")}
    for r in rows:
        want = _python_url_twin(r["doc_id"])
        got = {k: r[k] for k in want}
        assert got == want, (r["doc_id"], got, want)
        for k in fired:
            fired[k] = fired[k] or r[k]
    assert all(fired.values()), f"rule never fired: {fired}"


def test_refinedweb_stage0_is_url_keep_set(spark):
    """The funnel's stage-1 kept count equals the number of documents
    passing pipe_url_filter (URL metadata is doc_id-keyed, so the
    text-derived lined corpus cannot change the stage-0 verdict for
    any non-empty doc)."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    funnel = {
        r["name"]: r for r in extensions.pipe_refinedweb(spark, SF_SMOKE).collect()
    }
    n_keep = (
        extensions.pipe_url_filter(spark, SF_SMOKE).where("keep").count()
    )
    assert funnel["url_filter"]["n_kept"] == n_keep
    assert funnel["url_filter"]["n_in"] > funnel["url_filter"]["n_kept"]


def test_pipe_url_filter_random_ids_match_python_twin(spark, tmp_path):
    """The derivation + rules on a seeded RANDOM id sample spanning the
    full long range the corpus could ever use (up to 2^40, including
    the residue classes and the doc_id %% 1e9 == 0 lpad edge): every
    column equals the pure-Python twin, so the arithmetic is pinned
    beyond the dense small-id range the real corpus exercises."""
    import random

    from web_maxiv_hdbppviewer_spark.plans import extensions

    rng = random.Random(2016)
    ids = sorted(
        {rng.randrange(0, 1 << 40) for _ in range(40)}
        | {0, 23 * 19, 10**9, 3 * 10**9, (1 << 40) - 1}
    )
    docs = spark.createDataFrame(
        [(i, "en", "src", "words here") for i in ids],
        "doc_id long, lang string, source string, text string",
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    rows = extensions.pipe_url_filter(spark, sf_dir).collect()
    assert len(rows) == len(ids)
    for r in rows:
        want = _python_url_twin(r["doc_id"])
        got = {k: r[k] for k in want}
        assert got == want, (r["doc_id"], got, want)


def test_pipe_url_filter_plan_is_one_narrow_projection(spark):
    """The declared scale shape, pinned at the plan level: URL synthesis
    plus all four rules plan as narrow projections over the scan with
    ZERO hash shuffles - the only exchange is the presentation sort's
    range partitioning."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    plan = (
        extensions.pipe_url_filter(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") == 0, plan
    assert plan.count("Exchange") == 1, plan
    assert "rangepartitioning" in plan


# --- 2. curation calibration sweep ------------------------------------------


def test_pipe_curation_sweep_monotone_and_boundaries(spark):
    """Structural facts the sweep must satisfy on the real corpus: per
    branch, kept docs/tokens non-decreasing in pct; pct=100 equals the
    branch totals exactly; the NB-filtered branch is never larger than
    the unfiltered one at any pct; fractions are the round-6 ratios of
    the integer columns."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.pipe_curation_sweep(spark, SF_SMOKE).collect()
    assert len(rows) == 8
    by_branch = {
        nb: sorted(
            (r for r in rows if r["nb_filter"] is nb), key=lambda r: r["pct"]
        )
        for nb in (False, True)
    }
    for nb, rs in by_branch.items():
        assert [r["pct"] for r in rs] == [25, 50, 75, 100]
        assert len({r["n_docs_in"] for r in rs}) == 1
        for a, b in zip(rs, rs[1:]):
            assert a["n_docs_kept"] <= b["n_docs_kept"]
            assert a["tok_kept"] <= b["tok_kept"]
        top = rs[-1]
        assert top["n_docs_kept"] == top["n_docs_in"]
        assert top["tok_kept"] == top["tok_in"]
        for r in rs:
            assert r["doc_frac"] == round(r["n_docs_kept"] / r["n_docs_in"], 6)
            assert r["tok_frac"] == round(r["tok_kept"] / r["tok_in"], 6)
    for pf, pt in zip(by_branch[False], by_branch[True]):
        assert pt["n_docs_in"] <= pf["n_docs_in"]
        assert pt["n_docs_kept"] <= pf["n_docs_kept"]
    # the NB gate must actually gate on this corpus
    assert by_branch[True][0]["n_docs_in"] < by_branch[False][0]["n_docs_in"]


# --- 3. chunk-grain ANN with parent-doc max-pooling -------------------------


def test_chunk_vec_store_dense_ids_and_python_twin(spark):
    """The chunk embedding store's two contracts: rids are the DENSE
    0..n-1 enumeration of the (doc_id, chunk_idx) sort (the property
    the ANN seeding and query-set selection depend on), and every
    vector equals the pure-Python replay of the binary-grid derivation
    floor(parent*512) + jitter over 512 - checked on the first 40 rows
    (beyond the seed/query prefix)."""
    import math

    from web_maxiv_hdbppviewer_spark.plans import extensions

    store = sorted(
        extensions._chunk_vec_store(spark, SF_SMOKE).collect(),
        key=lambda r: r["rid"],
    )
    keys = [(r["doc_id"], r["chunk_idx"]) for r in store]
    assert keys == sorted(keys)
    assert [r["rid"] for r in store] == list(range(len(store)))

    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in extensions._emb(spark, SF_SMOKE).collect()
    }
    for r in store[:40]:
        want = [
            (math.floor(float(x) * 512)
             + ((r["doc_id"] * 31 + r["chunk_idx"] * 7 + j) % 17 - 8)) / 512.0
            for j, x in enumerate(emb[r["doc_id"]])
        ]
        assert list(r["cvec"]) == want, r["rid"]


def test_sim_chunk_ann_pooling_contracts(spark):
    """Structural facts of the parent-doc max-pool on the real smoke
    corpus: every query chunk has rid < 10 and appears with ranks
    1..m (m <= 5); acos_r is non-increasing within a query with the
    doc-asc tiebreak; candidate docs are distinct per query (the
    max-pool collapses chunks); the query's own parent never appears;
    and (q_doc, q_chunk_idx) matches the store's mapping for q_id."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.sim_chunk_ann(spark, SF_SMOKE).collect()
    assert rows
    cmap = {
        r["rid"]: (r["doc_id"], r["chunk_idx"])
        for r in extensions._chunk_vec_store(spark, SF_SMOKE).collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q_id, rs in by_q.items():
        assert q_id < 10
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        for r in rs:
            assert (r["q_doc"], r["q_chunk_idx"]) == cmap[q_id]
            assert r["cand_doc"] != r["q_doc"]
            assert (r["cand_doc"], r["cand_chunk_idx"]) in set(cmap.values())
        pairs = [(r["acos_r"], r["cand_doc"]) for r in rs]
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
        assert len({r["cand_doc"] for r in rs}) == len(rs)


def test_sim_chunk_ann_recall_bounds_and_hit_replay(spark):
    """The recall dial's contracts on the real smoke corpus: one row
    per query chunk (rid < 10), n_hits in 0..5, recall_r the round-6
    ratio - and the hit counts replayed from the two declared rankings
    themselves (exact side = sim_chunk_ann's pooling applied to the
    brute-force cosine), so the recall join cannot silently drift from
    the legs it claims to compare."""
    from web_maxiv_hdbppviewer_spark.operators import similarity
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.sim_chunk_ann_recall(spark, SF_SMOKE).collect()
    assert [r["q_id"] for r in rows] == sorted(r["q_id"] for r in rows)
    assert all(r["q_id"] < 10 for r in rows)
    ann = {}
    for r in extensions.sim_chunk_ann(spark, SF_SMOKE).collect():
        ann.setdefault(r["q_id"], set()).add(r["cand_doc"])
    store = extensions._chunk_vec_store(spark, SF_SMOKE)
    exact_pool = extensions._pool_parent_docs(
        similarity.topk_cosine(
            store, 1 << 40, 10, id_col="rid", vec_col="cvec"
        ).select("q_id", "cand_id", "cos_r"),
        store.select("rid", "doc_id", "chunk_idx"),
        "cos_r",
    ).collect()
    exact = {}
    for r in exact_pool:
        exact.setdefault(r["q_id"], set()).add(r["cand_doc"])
    assert {r["q_id"] for r in rows} == set(exact)
    for r in rows:
        want = len(ann.get(r["q_id"], set()) & exact[r["q_id"]])
        assert r["n_hits"] == want, (r, want)
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_r"] == round(r["n_hits"] / 5.0, 6)


def test_nearest_rank_integer_formula_matches_ceil():
    """(pct * n + 99) DIV 100 == ceil(pct * n / 100) exhaustively over
    the grid that matters (every pct in the sweep, n up to 10k) - the
    reason the sweep has no float in the retention predicate."""
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        CURATION_SWEEP_PCTS,
    )

    for pct in CURATION_SWEEP_PCTS:
        for n in range(0, 10_001):
            assert (pct * n + 99) // 100 == math.ceil(pct * n / 100)
