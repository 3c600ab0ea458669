"""Round-15 constructed tests.

1. Chunk-grain dedup (VERDICT r14 #5): exact keep-first over the
   text_chunk 64/48 windows on a corpus built so duplicate, unique and
   short-document chunks all occur; the MinHash near-dup variant on a
   one-token-edit pair whose exact Jaccard is hand-computed, plus the
   adjacent-overlap non-pair (16-token self-overlap must NOT report).
2. pipe_curation_trained (VERDICT r14 #4, the CCNet composition):
   constructed corpus where every stage's drop set is known by
   construction - NULL-lang drops at stage 1, off-distribution (high
   bigram surprisal) docs drop at the per-lang LM median, exact
   duplicates collapse at stage 3 - plus the funnel self-audit
   invariant (stage k's n_in == stage k-1's n_kept) on real testdata.
"""

import pytest

from tests.conftest import SF_SMOKE
from tests.test_round14 import _constructed_corpus


# --- 1. chunk-grain dedup ---------------------------------------------------


def _tokens(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


def test_dedup_chunk_constructed_keep_first(spark, tmp_path):
    """Two identical 100-token docs (2 chunks each: 64 + the clamped
    52-token tail) and one unique 10-token doc: every doc-1 chunk is its
    group's keeper, every doc-2 chunk a duplicate, the short doc a
    singleton - and the chunk windowing matches text_chunk's (same
    64/48 arithmetic, same clamped tail)."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    body = _tokens("w", 100)
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, _tokens("u", 10))],
        "doc_id long, text string",
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in extensions.dedup_chunk(spark, sf_dir).collect()
    }
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (2, 1), (3, 0)}
    for idx in (0, 1):
        assert rows[(1, idx)]["keep"] is True
        assert rows[(2, idx)]["keep"] is False
        assert rows[(1, idx)]["n_copies"] == 2
        assert rows[(1, idx)]["chunk_hash"] == rows[(2, idx)]["chunk_hash"]
    assert rows[(3, 0)]["keep"] is True and rows[(3, 0)]["n_copies"] == 1
    # aligned windows: the two doc-1 chunks hash differently (64-token
    # head vs 52-token tail), so keep-first operates per CONTENT group,
    # not per document
    assert rows[(1, 0)]["chunk_hash"] != rows[(1, 1)]["chunk_hash"]
    # kept set = deduped store: one keeper per distinct hash
    hashes = {r["chunk_hash"] for r in rows.values()}
    assert sum(1 for r in rows.values() if r["keep"]) == len(hashes) == 3


def test_dedup_chunk_near_constructed_one_token_edit(spark, tmp_path):
    """A 64-token chunk vs its one-mid-token edit: 61 of 63 bigrams
    shared -> J = 61/65 = 0.938462 (round-6), above threshold, found by
    the band candidacy; the 16-token self-overlap of adjacent chunks in
    a 112-token doc (J = 15/111) must NOT report; exact chunk hashing
    (dedup_chunk) sees the edited pair as distinct - the gap the
    near-dup variant exists to close."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    base = [f"w{i}" for i in range(64)]
    edited = list(base)
    edited[30] = "zzz"
    docs = spark.createDataFrame(
        [
            (1, " ".join(base)),
            (2, " ".join(edited)),
            (3, _tokens("v", 112)),  # 2 overlapping chunks, all-distinct tokens
        ],
        "doc_id long, text string",
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    pairs = extensions.dedup_chunk_near(spark, sf_dir).collect()
    assert [(r["doc_a"], r["idx_a"], r["doc_b"], r["idx_b"]) for r in pairs] == [
        (1, 0, 2, 0)
    ]
    assert pairs[0]["jaccard"] == pytest.approx(round(61 / 65, 6), abs=0)
    # exact chunk dedup does NOT collapse the edited pair
    exact = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in extensions.dedup_chunk(spark, sf_dir).collect()
    }
    assert exact[(1, 0)]["n_copies"] == 1 and exact[(2, 0)]["n_copies"] == 1


# --- 2. the trained curation funnel ----------------------------------------


def test_pipe_curation_trained_constructed_stage_attribution(spark, tmp_path):
    """9 docs: 6 identical in-distribution docs, 2 distinct
    high-surprisal docs (rare bigrams -> above the per-lang LM median),
    1 NULL-lang doc. Expected funnel, every drop attributed by
    construction: stage 1 drops exactly the NULL-lang doc (one label ->
    NB predicts it for every labeled doc), stage 2 drops exactly the two
    off-distribution docs (their add-one bigram surprisal exceeds the
    median of the 8 survivors, which sits on the 6 common docs), stage 3
    collapses the 6 identical survivors to their min-id representative,
    stage 4 finds no near-dup pairs among a single survivor."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    common = "the cat sat on the mat"
    rows = [(i, "en", "src", common) for i in range(1, 7)]
    rows += [
        (7, "en", "src", "zebra quark flux jelly"),
        (8, "en", "src", "omega delta sigma rho"),
        (9, None, "src", common),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    out = extensions.pipe_curation_trained(spark, sf_dir).collect()
    funnel = [(r["stage"], r["name"], r["n_in"], r["n_kept"]) for r in out]
    assert funnel == [
        (1, "nb_lang", 9, 8),
        (2, "lm_ppl", 8, 6),
        (3, "exact_dedup", 6, 1),
        (4, "near_dup", 1, 1),
    ]


def _wide_catalog(spark, n=120):
    from web_maxiv_hdbppviewer_spark.sources.hdbpp import HdbppCatalog

    names = [("cs1", "dom0", "fam0", "mem0", f"attr{i:03d}") for i in range(n)]
    att_conf = spark.createDataFrame(
        [
            (cs, "/".join((d, f, m, a)), i + 1, "scalar_devdouble_ro")
            for i, (cs, d, f, m, a) in enumerate(names)
        ],
        "cs_name string, att_name string, att_conf_id long, data_type string",
    )
    att_names = spark.createDataFrame(
        names,
        "cs_name string, domain string, family string, member string, name string",
    )
    return HdbppCatalog(att_conf, att_names), sorted(
        "%s/%s/%s/%s" % t[1:] for t in names
    )


def test_search_cap_divergence_reference_never_caps(spark):
    """VERDICT r14 #7: the reference PARSES max (server.py:77
    ``request.query.get("max", 100)``) but never applies it - matches
    goes out uncapped. Pin both sides on a 120-name catalog: the
    engine's default returns exactly the sorted 100-prefix (the enforced
    cap, SURVEY O5 'we implement the cap for real'); the reference twin
    returns all 120; and a byte-shape comparison against the reference
    must exclude the cap by passing max_n=None - under which the two
    lists agree byte-for-byte."""
    import fnmatch
    import re

    catalog, full_sorted = _wide_catalog(spark, 120)

    # reference verbatim (server.py:73-89): fnmatch glob, re.match,
    # sorted, max parsed-but-UNAPPLIED
    regex = fnmatch.translate("*")
    _max_n = "50"  # parsed like the reference parses it... and ignored
    ref_matches = [
        a for a in full_sorted if re.match(regex, a, re.IGNORECASE)
    ]
    assert len(ref_matches) == 120  # the reference ships all of them

    engine_default = [r["name"] for r in catalog.search("cs1", "*").collect()]
    assert engine_default == full_sorted[:100]  # enforced cap, sorted prefix

    engine_uncapped = [
        r["name"] for r in catalog.search("cs1", "*", max_n=None).collect()
    ]
    assert engine_uncapped == ref_matches  # byte-shape parity, cap excluded


def test_catalog_ttl_staleness_window_pinned(spark):
    """VERDICT r14 #7: the reference memoizes both catalog fetches for
    60 s (@memoized_ttl(60), hdbpp.py:213,230 / utils.py:29-50), so an
    attribute registered after the memo fill is INVISIBLE to /search for
    up to a minute. Pin that the engine's TtlDimension twin accepts the
    same staleness contract - within the TTL the snapshot does NOT see a
    source append (that IS the reference behavior, not a bug), and
    invalidate()/expiry swaps in the fresh list. The engine's default
    ttl_seconds=60.0 matches the reference literal."""
    import inspect

    from web_maxiv_hdbppviewer_spark.cache import TtlDimension

    sig = inspect.signature(TtlDimension.__init__)
    assert sig.parameters["ttl_seconds"].default == 60.0  # hdbpp.py:213

    source = [("cs1", "dom0/fam0/mem0/attr0")]
    dim = TtlDimension(
        lambda: spark.createDataFrame(source, "cs_name string, name string"),
        ttl_seconds=1000,
    )
    assert dim.get().count() == 1
    source.append(("cs1", "dom0/fam0/mem0/attr1"))  # registered mid-TTL
    assert dim.get().count() == 1  # stale by contract: the 60s window
    dim.invalidate()
    assert dim.get().count() == 2  # fresh after expiry/invalidate


def test_pipe_curation_trained_funnel_is_self_auditing(spark):
    """On real testdata: stage k's n_in equals stage k-1's n_kept (every
    dropped doc attributed to exactly one stage), counts monotonically
    non-increasing, stage-1 n_in is the corpus size."""
    from web_maxiv_hdbppviewer_spark.plans import extensions
    from web_maxiv_hdbppviewer_spark.sources.tables import load_tables

    out = extensions.pipe_curation_trained(spark, SF_SMOKE).collect()
    assert [r["stage"] for r in out] == [1, 2, 3, 4]
    n_docs = load_tables(spark, SF_SMOKE)["documents"].count()
    assert out[0]["n_in"] == n_docs
    for prev, cur in zip(out, out[1:]):
        assert cur["n_in"] == prev["n_kept"]
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_in"]
