"""DuckDB oracle SQL for the extension queries (plans/extensions.py).

The oracles deliberately use the NAIVE formulation wherever the Spark side
uses a scalable one - brute-force all-pairs for simhash (the band-bucket
join is exact by pigeonhole, so results must coincide), a single OR-join for
MinHash bands (Spark does a union of band-equi joins) - which makes the
comparison a real algorithmic check, not a transliteration.

Portability invariants shared with the Spark side:
  - hash: bigint(first 15 hex of md5)  - ('0x'||substr(md5(x),1,15))::BIGINT
  - shingles: distinct adjacent-word bigrams of lower-cased whitespace tokens
  - all float thresholds applied to ROUND(x, 6) values
  - integer outputs cast to BIGINT (DuckDB SUM returns HUGEINT otherwise)
"""

H = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

# bootstrap CI ranks - mirror extensions.BOOT_LO_RANK / BOOT_HI_RANK
# (floor(q * (B - 1)) + 1 over B = 64 replicates; literals here because
# extensions.py imports this module, not the other way around)
BOOT_LO_RANK_SQL = 2
BOOT_HI_RANK_SQL = 62

# minhash affine-permutation constants - the SAME literals the Spark side
# applies (operators/dedup.MINHASH_AB), so signatures agree bit-for-bit
from ..operators.dedup import MINHASH_AB, MINHASH_P  # noqa: E402

# distinct word-bigram shingles per doc: (id, s)
_SHINGLES = """
  raw_toks AS (
    SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
    FROM (SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents)),
  sh AS (
    SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
    FROM (SELECT doc_id, w, i,
                 lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
          FROM raw_toks)
    WHERE nw IS NOT NULL)
"""

# exact jaccard over pairs sharing >= 1 shingle: (id_a, id_b, jaccard)
_JACCARD = """
  sz AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
  common AS (
    SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
    FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
    GROUP BY 1, 2),
  jac AS (
    SELECT id_a, id_b, ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sz sa ON sa.id = id_a
    JOIN sz sb ON sb.id = id_b)
"""

# embeddings as double vectors with norms: (id, v, nrm)
_VECS = """
  vecs AS (
    SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings)
"""

# deterministic Lloyd k-means unrolled: cents0 = first 8 vectors; each
# iteration = round-6-cosine assignment (cid tiebreak) + round-6
# element-wise member means (mirrors similarity.train_ivf_centroids)
_KMEANS_N_ITERS = 2


def _kmeans_ctes(iters: int) -> tuple[str, str]:
    parts = ["cents0 AS (SELECT id AS cid, v AS cv FROM vecs WHERE id < 8)"]
    prev = "cents0"
    for i in range(1, iters + 1):
        parts.append(f"""a{i} AS (
          SELECT x.id, x.v, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY x.id ORDER BY
                   ROUND(list_inner_product(x.v, c.cv) /
                         (x.nrm * sqrt(list_inner_product(c.cv, c.cv))), 6)
                     DESC, c.cid) AS rn
          FROM vecs x, {prev} c),
        cents{i} AS (
          SELECT cid, list(av ORDER BY idx) AS cv
          FROM (SELECT cid, idx, ROUND(AVG(x), 6) AS av
                FROM (SELECT cid, unnest(v) AS x,
                             generate_subscripts(v, 1) AS idx
                      FROM a{i} WHERE rn = 1)
                GROUP BY cid, idx)
          GROUP BY cid)""")
        prev = f"cents{i}"
    return ",\n        ".join(parts) + ",", prev


_KMEANS_CTES, _KMEANS_FINAL = _kmeans_ctes(_KMEANS_N_ITERS)

# per-subspace PQ codebooks unrolled (mirrors similarity.train_pq_codebooks):
# subvectors via list_slice, squared-L2 through the inner-product identity
# (the primitive both engines fold identically), round-6 + cid-asc argmin,
# round-6 member means - all subspaces in one CTE chain keyed by m
from ..operators.similarity import (  # noqa: E402
    PQ_ITERS as _PQ_ITERS,
    PQ_K as _PQ_K,
    PQ_M as _PQ_M,
    PQ_SUBDIM as _PQ_SD,
)

_PQ_L2 = (
    "ROUND(list_inner_product(x.sv, x.sv) - 2 * list_inner_product(x.sv, c.cv)"
    " + list_inner_product(c.cv, c.cv), 6)"
)


def _pq_ctes(
    iters: int, src: str = "vecs", vcol: str = "v", extra: str = "nrm, ", p: str = ""
) -> tuple[str, str]:
    """Per-subspace k-means CTE chain over ``src.vcol``; ``p`` prefixes
    every CTE name so one query can train two codebooks (sim_ann_ivfpq
    trains PQ over RESIDUALS next to the coarse cosine k-means)."""
    parts = [
        f"""{p}psv AS (
          SELECT id, {extra}m,
                 list_slice({vcol}, m * {_PQ_SD} + 1, (m + 1) * {_PQ_SD}) AS sv
          FROM {src}, range(0, {_PQ_M}) r(m))""",
        f"{p}pc0 AS (SELECT m, id AS cid, sv AS cv FROM {p}psv WHERE id < {_PQ_K})",
    ]
    prev = f"{p}pc0"
    for i in range(1, iters + 1):
        parts.append(f"""{p}pa{i} AS (
          SELECT x.id, x.m, x.sv, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY x.id, x.m
                                    ORDER BY {_PQ_L2} ASC, c.cid ASC) AS rn
          FROM {p}psv x JOIN {prev} c ON x.m = c.m),
        {p}pc{i} AS (
          SELECT m, cid, list(av ORDER BY idx) AS cv
          FROM (SELECT m, cid, idx, ROUND(AVG(x), 6) AS av
                FROM (SELECT m, cid, unnest(sv) AS x,
                             generate_subscripts(sv, 1) AS idx
                      FROM {p}pa{i} WHERE rn = 1)
                GROUP BY m, cid, idx)
          GROUP BY m, cid)""")
        prev = f"{p}pc{i}"
    return ",\n        ".join(parts) + ",", prev


_PQ_CTES, _PQ_FINAL = _pq_ctes(_PQ_ITERS)

# explicit left-to-right ADC sums over the pivoted per-subspace columns -
# a plain SUM() would reintroduce float-order nondeterminism
_PQ_PD_SUM = " + ".join(f"MAX(CASE WHEN k.m = {m} THEN t.pd END)" for m in range(_PQ_M))
_PQ_NSQ_SUM = " + ".join(f"MAX(CASE WHEN k.m = {m} THEN t.nsq END)" for m in range(_PQ_M))

# residual-PQ chain for sim_ann_ivfpq: same generator over the residual
# table (no nrm column), r-prefixed so it coexists with the coarse k-means
_RPQ_CTES, _RPQ_FINAL = _pq_ctes(_PQ_ITERS, src="res", vcol="rv", extra="", p="r")
_IVFPQ_PD_SUM = " + ".join(
    f"MAX(CASE WHEN k.m = {m} THEN pdt.pd END)" for m in range(_PQ_M)
)
_IVFPQ_NSQ_SUM = " + ".join(
    f"MAX(CASE WHEN k.m = {m} THEN nsqt.nsq END)" for m in range(_PQ_M)
)
_IVFPQ_CROSS_SUM = " + ".join(
    f"MAX(CASE WHEN k.m = {m} THEN crosst.crs END)" for m in range(_PQ_M)
)

_IVFPQ_CHAIN = f"""assign AS (
          SELECT x.id, x.v, x.nrm, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY x.id ORDER BY
                   ROUND(list_inner_product(x.v, c.cv) /
                         (x.nrm * sqrt(list_inner_product(c.cv, c.cv))), 6)
                     DESC, c.cid) AS rn
          FROM vecs x, {_KMEANS_FINAL} c),
        cells AS (SELECT id, v, nrm, cid AS cell FROM assign WHERE rn = 1),
        probes AS (SELECT id, v, nrm, cid AS cell FROM assign
                   WHERE rn <= 2 AND id < 10),
        res AS (
          SELECT id, cell, list(vx - cx ORDER BY idx) AS rv
          FROM (SELECT l.id, l.cell, unnest(l.v) AS vx, unnest(c.cv) AS cx,
                       generate_subscripts(l.v, 1) AS idx
                FROM cells l JOIN {_KMEANS_FINAL} c ON l.cell = c.cid)
          GROUP BY id, cell),
        {_RPQ_CTES}
        rcodes AS (
          SELECT id, m, cid AS code FROM (
            SELECT x.id, x.m, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY x.id, x.m
                                      ORDER BY {_PQ_L2} ASC, c.cid ASC) AS rn
            FROM rpsv x JOIN {_RPQ_FINAL} c ON x.m = c.m)
          WHERE rn = 1),
        cand AS (
          SELECT rc.id, r.cell, rc.m, rc.code
          FROM rcodes rc JOIN res r ON rc.id = r.id),
        qpsv AS (
          SELECT id, m, list_slice(v, m * {_PQ_SD} + 1, (m + 1) * {_PQ_SD}) AS sv
          FROM vecs, range(0, {_PQ_M}) r(m) WHERE id < 10),
        pdt AS (
          SELECT x.id AS q_id, x.m, c.cid AS code,
                 ROUND(list_inner_product(x.sv, c.cv), 6) AS pd
          FROM qpsv x JOIN {_RPQ_FINAL} c ON x.m = c.m),
        nsqt AS (
          SELECT m, cid AS code,
                 ROUND(list_inner_product(cv, cv), 6) AS nsq
          FROM {_RPQ_FINAL}),
        csub AS (
          SELECT cid AS cell, m,
                 list_slice(cv, m * {_PQ_SD} + 1, (m + 1) * {_PQ_SD}) AS csv
          FROM {_KMEANS_FINAL}, range(0, {_PQ_M}) r(m)),
        crosst AS (
          SELECT s.cell, s.m, c.cid AS code,
                 ROUND(list_inner_product(s.csv, c.cv), 6) AS crs
          FROM csub s JOIN {_RPQ_FINAL} c ON s.m = c.m),
        qc AS (
          SELECT p.id AS q_id, p.cell, p.nrm AS q_nrm,
                 ROUND(list_inner_product(p.v, c.cv), 6) AS qc_dot,
                 ROUND(list_inner_product(c.cv, c.cv), 6) AS ipcc
          FROM probes p JOIN {_KMEANS_FINAL} c ON p.cell = c.cid),
        adc AS (
          SELECT t.q_id, k.id AS cand_id,
                 ROUND((MAX(t.qc_dot) + ({_IVFPQ_PD_SUM}))
                       / (MAX(t.q_nrm)
                          * sqrt(MAX(t.ipcc) + 2 * ({_IVFPQ_CROSS_SUM})
                                 + ({_IVFPQ_NSQ_SUM}))), 6) AS acos_r
          FROM cand k
          JOIN qc t ON k.cell = t.cell AND k.id != t.q_id
          JOIN pdt ON pdt.q_id = t.q_id AND pdt.m = k.m AND pdt.code = k.code
          JOIN nsqt ON nsqt.m = k.m AND nsqt.code = k.code
          JOIN crosst ON crosst.cell = k.cell AND crosst.m = k.m
                     AND crosst.code = k.code
          GROUP BY t.q_id, k.id),
        ivfpqranked AS (
          SELECT q_id, cand_id, acos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY acos_r DESC, cand_id ASC) AS rank
          FROM adc)"""

# the shared PQ pipeline tail: encode -> per-query tables -> ADC -> ranking
# (consumed by sim_topk_pq at k=5 and sim_pq_recall at k=3)
_PQ_RANKED = f"""codes AS (
          SELECT id, m, cid AS code FROM (
            SELECT x.id, x.m, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY x.id, x.m
                                      ORDER BY {_PQ_L2} ASC, c.cid ASC) AS rn
            FROM psv x JOIN {_PQ_FINAL} c ON x.m = c.m)
          WHERE rn = 1),
        qtab AS (
          SELECT x.id AS q_id, x.nrm AS q_nrm, x.m, c.cid AS code,
                 ROUND(list_inner_product(x.sv, c.cv), 6) AS pd,
                 ROUND(list_inner_product(c.cv, c.cv), 6) AS nsq
          FROM psv x JOIN {_PQ_FINAL} c ON x.m = c.m
          WHERE x.id < 10),
        adc AS (
          SELECT t.q_id, k.id AS cand_id,
                 ROUND(({_PQ_PD_SUM})
                       / (MAX(t.q_nrm) * sqrt({_PQ_NSQ_SUM})), 6) AS acos_r
          FROM codes k JOIN qtab t ON k.m = t.m AND k.code = t.code
          WHERE k.id != t.q_id
          GROUP BY t.q_id, k.id),
        pqranked AS (
          SELECT q_id, cand_id, acos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY acos_r DESC, cand_id ASC) AS rank
          FROM adc)"""

_SIG_COLS = ",\n        ".join(
    f"MIN(({a} * h31 + {b}) % {MINHASH_P}) AS s{k}"
    for k, (a, b) in enumerate(MINHASH_AB)
)

# random-hyperplane sign LSH - the SAME +-1 plane literals the Spark side
# applies (operators/similarity.HYPERPLANES), emitted as an explicit
# left-to-right chain of +-v[j] terms so the double sum is bit-identical
from ..operators.similarity import HYPERPLANES  # noqa: E402


def _plane_dot_sql(plane):
    terms = " ".join(
        ("+ " if s > 0 else "- ") + f"v[{j + 1}]" for j, s in enumerate(plane)
    )
    return terms[2:] if terms.startswith("+ ") else terms


def _hp_bucket_sql(nbits, plane_offset=0):
    return " + ".join(
        f"(CASE WHEN ROUND({_plane_dot_sql(HYPERPLANES[plane_offset + i])}, 6) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )


# 8 disjoint 8-bit hyperplane bands (mirrors similarity.near_dup_pairs:
# band b bit j set iff ROUND(dot(v, H[b*8 + j]), 6) >= 0)
_EMB_BAND_COLS = ",\n               ".join(
    _hp_bucket_sql(8, b * 8) + f" AS eb{b}" for b in range(8)
)

# trigram-profile scores - the SAME literals as textquality.LANG_TRIGRAMS;
# length() (CHARACTERS, matching Spark's length - strlen would count bytes)
# delta of replace() / 3 is exact, so the cast to BIGINT is lossless
from ..operators.textquality import LANG_TRIGRAMS  # noqa: E402

_LANG_SCORE_COLS = ",\n                 ".join(
    "CAST(("
    + " + ".join(
        f"(length(s) - length(replace(s, '{t}', ''))) / 3" for t in tris
    )
    + f") AS BIGINT) AS s_{lang}"
    for lang, tris in LANG_TRIGRAMS.items()
)
_EMB_BAND_OR = " OR ".join(f"a.eb{b} = b.eb{b}" for b in range(8))
_BAND_COLS = ",\n        ".join(
    "s{a}::VARCHAR || ',' || s{b}::VARCHAR || ',' || s{c}::VARCHAR AS b{j}".format(
        a=3 * j, b=3 * j + 1, c=3 * j + 2, j=j
    )
    for j in range(4)
)

# unrolled BPE training (mirrors operators/bpe.train_bpe_merges): one
# word-frequency pass, then per merge step a pair-count + argmax + exact
# greedy list_reduce re-tokenization. MATERIALIZED keeps DuckDB from
# inlining each state CTE into its two consumers (exponential re-eval).
from ..operators.bpe import N_MERGES as _BPE_N  # noqa: E402
from ..operators.textquality import BM25_TERMS as _BM25_TERMS  # noqa: E402


def _bpe_blocks(n: int) -> list[str]:
    blocks = [
        """st0 AS MATERIALIZED (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS f,
                 array_to_string(string_split(w, ''), chr(31)) AS s
          FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS w
                FROM documents)
          GROUP BY w)"""
    ]
    for k in range(1, n + 1):
        p = k - 1
        blocks.append(f"""pc{k} AS MATERIALIZED (
          SELECT lhs, rhs, CAST(SUM(f) AS BIGINT) AS n_pairs
          FROM (SELECT f, l[i] AS lhs, l[i + 1] AS rhs
                FROM (SELECT f, l, unnest(generate_series(1, len(l) - 1)) AS i
                      FROM (SELECT f, string_split(s, chr(31)) AS l FROM st{p})))
          GROUP BY lhs, rhs)""")
        blocks.append(f"""best{k} AS MATERIALIZED (
          SELECT {k} AS step, lhs, rhs, n_pairs FROM pc{k}
          ORDER BY n_pairs DESC, lhs, rhs LIMIT 1)""")
        # LEFT JOIN ON TRUE + identity fallback: if training exhausts pairs
        # before step k, best{k} is empty and Spark's trainer breaks early
        # with a shorter merge list - the state chain must then pass through
        # unchanged instead of going empty (ADVICE r4)
        blocks.append(f"""st{k} AS MATERIALIZED (
          SELECT w, f,
                 CASE WHEN b.lhs IS NULL THEN s
                      ELSE list_reduce(string_split(s, chr(31)), (acc, x) ->
                        CASE WHEN (acc = b.lhs OR ends_with(acc, chr(31) || b.lhs))
                                  AND x = b.rhs
                             THEN acc || b.rhs ELSE acc || chr(31) || x END)
                 END AS s
          FROM st{p} LEFT JOIN best{k} b ON TRUE)""")
    return blocks


def _bpe_train_sql(n: int = _BPE_N) -> str:
    union = "\n          UNION ALL ".join(
        f"SELECT CAST(step AS BIGINT) AS step, lhs, rhs, n_pairs FROM best{k}"
        for k in range(1, n + 1)
    )
    return (
        "WITH " + ",\n        ".join(_bpe_blocks(n)) + f"\n        {union} ORDER BY step"
    )


def _bpe_apply_sql(n: int = _BPE_N) -> str:
    return (
        "WITH " + ",\n        ".join(_bpe_blocks(n)) + f"""
        SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        JOIN (SELECT w, CAST(len(string_split(s, chr(31))) AS BIGINT) AS n_tok
              FROM st{n}) USING (w)
        GROUP BY doc_id ORDER BY doc_id"""
    )


# word k-grams as (id, gram) rows: join k consecutive tokens with spaces;
# generate_series(1, n-k+1) is empty when the doc is shorter than k
def _kgram_rows_sql(k: int, src: str = "documents") -> str:
    return f"""
          SELECT doc_id AS id,
                 array_to_string(list_slice(l, i, i + {k - 1}), ' ') AS s
          FROM (SELECT doc_id, l,
                       unnest(generate_series(1, len(l) - {k - 1})) AS i
                FROM (SELECT doc_id,
                             list_filter(string_split(lower(text), ' '),
                                         x -> x <> '') AS l
                      FROM {src}))"""


# int8 symmetric quantization (mirrors similarity.quantize_embeddings):
# scale = ROUND(max|v|/127, 6) so both engines divide by the identical
# double; codes = clamp(ROUND(v/scale), +-127)
_QUANT = """
  qz AS (
    SELECT id, v, scale_r,
           CASE WHEN scale_r > 0
                THEN list_transform(v, x -> GREATEST(-127, LEAST(127,
                       CAST(ROUND(x / scale_r, 0) AS INT))))
                ELSE list_transform(v, x -> 0) END AS qvec
    FROM (SELECT id, v,
                 ROUND(list_max(list_transform(v, x -> abs(x))) / 127.0, 6)
                   AS scale_r
          FROM vecs))
"""

EXTENSION_ORACLE = {
    "text_bpe_train": _bpe_train_sql(),
    "text_bpe_apply": _bpe_apply_sql(),
    # per-language fertility: the unrolled BPE-apply CTE block joined to
    # per-doc word/byte counts; int64 sums, two ROUND-6 ratios of
    # identical integers (extensions.text_fertility)
    "text_fertility": f"""
        WITH bpe_counts AS ({{BPE_APPLY}}),
        meta AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_words,
                 CAST(strlen(text) AS BIGINT) AS n_bytes  -- byte length, = Spark octet_length
          FROM documents)
        SELECT meta.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS words,
               CAST(SUM(n_bpe_tokens) AS BIGINT) AS bpe_tokens,
               CAST(SUM(n_bytes) AS BIGINT) AS bytes,
               ROUND(CAST(SUM(n_bpe_tokens) AS BIGINT)
                     / CAST(SUM(n_words) AS BIGINT), 6) AS fertility_r,
               ROUND(CAST(SUM(n_bytes) AS BIGINT)
                     / CAST(SUM(n_bpe_tokens) AS BIGINT), 6) AS bytes_per_token_r
        FROM bpe_counts JOIN meta USING (doc_id)
        GROUP BY 1 ORDER BY lang
    """.replace("{BPE_APPLY}", _bpe_apply_sql()),
    "sim_quantize": f"""
        WITH {_VECS}, {_QUANT}
        SELECT id, scale_r,
               CAST(list_sum(list_transform(qvec, x -> abs(x))) AS BIGINT) AS q_l1,
               CAST(list_min(qvec) AS BIGINT) AS q_min,
               CAST(list_max(qvec) AS BIGINT) AS q_max,
               (SELECT ROUND(MAX(ABS(q * scale_r - x)), 6)
                FROM (SELECT unnest(qvec) AS q, unnest(v) AS x)) AS max_err_r
        FROM qz ORDER BY id
    """,
    "sim_topk_quantized": f"""
        WITH {_VECS}, {_QUANT},
        deq AS (
          SELECT id, list_transform(qvec, q -> q * scale_r) AS v
          FROM qz),
        nv AS (
          SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm FROM deq),
        scored AS (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
          FROM nv q JOIN nv c ON c.id != q.id
          WHERE q.id < 10),
        ranked AS (
          SELECT q_id, cand_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_r DESC, cand_id ASC) AS rank
          FROM scored)
        SELECT q_id, cand_id, cos_r, rank FROM ranked
        WHERE rank <= 5 ORDER BY q_id, rank
    """,
    # Gopher-style repetition: duplicate word-trigram fraction + top-trigram
    # mass (mirrors textquality.repetition_scores, REPETITION_K = 3)
    "text_repetition": f"""
        WITH g AS ({_kgram_rows_sql(3)}),
        agg AS (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct,
                 CAST(MAX(c) AS BIGINT) AS top_c
          FROM (SELECT id, s, COUNT(*) OVER (PARTITION BY id, s) AS c FROM g)
          GROUP BY id)
        SELECT d.doc_id AS id,
               CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
               ROUND(COALESCE(n_grams - n_distinct, 0)
                     / GREATEST(COALESCE(n_grams, 0), 1), 6) AS dup_frac,
               ROUND(COALESCE(top_c, 0)
                     / GREATEST(COALESCE(n_grams, 0), 1), 6) AS top_frac
        FROM documents d LEFT JOIN agg ON agg.id = d.doc_id
        ORDER BY id
    """,
    # decontamination audit (mirrors dedup.contamination_overlap over the
    # pipe_split hash splits, CONTAMINATION_K = 5): distinct test-doc
    # 5-grams that appear anywhere in the train split
    "pipe_contamination": f"""
        WITH sp AS (
          SELECT doc_id, text,
                 CASE WHEN b < 8000 THEN 'train'
                      WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id, text,
                       {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
                FROM documents)),
        evg AS (SELECT DISTINCT id, s FROM ({_kgram_rows_sql(5, "(SELECT doc_id, text FROM sp WHERE split = 'test')")})),
        trg AS (SELECT DISTINCT s FROM ({_kgram_rows_sql(5, "(SELECT doc_id, text FROM sp WHERE split = 'train')")})),
        sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM evg GROUP BY id),
        shared AS (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM evg JOIN trg USING (s) GROUP BY id)
        SELECT t.doc_id AS id,
               CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
               ROUND(COALESCE(n_shared, 0)
                     / GREATEST(COALESCE(n_shingles, 0), 1), 6) AS shared_frac
        FROM (SELECT doc_id FROM sp WHERE split = 'test') t
        LEFT JOIN sizes ON sizes.id = t.doc_id
        LEFT JOIN shared ON shared.id = t.doc_id
        ORDER BY id
    """,
    # bloom-prefiltered decontamination (extensions.pipe_contamination_bloom
    # / dedup.bloom_contamination): n_shared is the plain exact STRING
    # semi-join over ALL eval shingles, so a green hash proves both that
    # the bloom admitted every true overlap (no false negatives) and that
    # the engine's 60-bit join key added none (no collision inflation);
    # n_candidates replays the bitmap itself - an eval shingle passes iff
    # BOTH its md5-slice positions (hex chars 16-21 / 22-27, the same ONE
    # md5 whose chars 1-15 are the engine's join key) appear among the
    # train position set (m = 2^22)
    "pipe_contamination_bloom": f"""
        WITH sp AS (
          SELECT doc_id, text,
                 CASE WHEN b < 8000 THEN 'train'
                      WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id, text,
                       {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
                FROM documents)),
        evg AS (SELECT DISTINCT id, s FROM ({_kgram_rows_sql(5, "(SELECT doc_id, text FROM sp WHERE split = 'test')")})),
        trg AS (SELECT DISTINCT s FROM ({_kgram_rows_sql(5, "(SELECT doc_id, text FROM sp WHERE split = 'train')")})),
        bits AS (
          SELECT ('0x' || substr(md5(s), 16, 6))::BIGINT % 4194304 AS p
          FROM trg
          UNION
          SELECT ('0x' || substr(md5(s), 22, 6))::BIGINT % 4194304 AS p
          FROM trg),
        cand AS (
          SELECT id, s FROM evg
          WHERE ('0x' || substr(md5(s), 16, 6))::BIGINT % 4194304
                  IN (SELECT p FROM bits)
            AND ('0x' || substr(md5(s), 22, 6))::BIGINT % 4194304
                  IN (SELECT p FROM bits)),
        sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM evg GROUP BY id),
        ncand AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand GROUP BY id),
        shared AS (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM evg JOIN trg USING (s) GROUP BY id)
        SELECT t.doc_id AS id,
               CAST(COALESCE(n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(n_candidates, 0) AS BIGINT) AS n_candidates,
               CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
               ROUND(COALESCE(n_shared, 0)
                     / GREATEST(COALESCE(n_shingles, 0), 1), 6) AS shared_frac
        FROM (SELECT doc_id FROM sp WHERE split = 'test') t
        LEFT JOIN sizes ON sizes.id = t.doc_id
        LEFT JOIN ncand ON ncand.id = t.doc_id
        LEFT JOIN shared ON shared.id = t.doc_id
        ORDER BY id
    """,
    "dedup_exact": """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM documents GROUP BY md5(LOWER(text)) ORDER BY keep_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLES}, {_JACCARD}
        SELECT id_a, id_b, jaccard FROM jac
        WHERE jaccard >= 0.8 ORDER BY id_a, id_b
    """,
    "dedup_minhash_lsh": f"""
        WITH {_SHINGLES},
        hx AS (
          SELECT id, {H.format(x="s")} % {MINHASH_P} AS h31
          FROM sh),
        sig AS (
          SELECT id, {_SIG_COLS}
          FROM hx GROUP BY id),
        banded AS (
          SELECT id, {_BAND_COLS}
          FROM sig),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b
            ON a.id < b.id
           AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
        {_JACCARD}
        SELECT j.id_a, j.id_b, j.jaccard
        FROM jac j JOIN cand USING (id_a, id_b)
        WHERE j.jaccard >= 0.8 ORDER BY id_a, id_b
    """,
    # naive form: ALL corpus pairs, then keep those touching the hash-slice
    # batch (extensions.INGEST_NEW_BUCKETS = 1000 of 10000)
    "dedup_incremental": f"""
        WITH {_SHINGLES}, {_JACCARD},
        newdocs AS (
          SELECT doc_id FROM documents
          WHERE {H.format(x="'ingest:' || CAST(doc_id AS VARCHAR)")} % 10000 < 1000)
        SELECT id_a, id_b, jaccard FROM jac
        WHERE jaccard >= 0.8
          AND (id_a IN (SELECT doc_id FROM newdocs)
               OR id_b IN (SELECT doc_id FROM newdocs))
        ORDER BY id_a, id_b
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLES}, {_JACCARD},
        pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lbl AS (
          SELECT u AS id, MIN(v) AS mn FROM reach GROUP BY u)
        SELECT d.doc_id,
               CAST(LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS BIGINT)
                 AS cluster_id
        FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
        ORDER BY d.doc_id
    """,
    # integer PageRank (extensions.graph_pagerank / graph.pagerank): the
    # 8 supersteps unrolled as chained CTEs over the thresholded pair
    # graph; every step is truncating integer arithmetic (// here, DIV in
    # Spark - verified identical on negatives), so pr values match
    # bit-for-bit
    "graph_pagerank": None,  # filled in below (generated SQL)
    "dedup_simhash": f"""
        WITH {_SHINGLES},
        hx AS (SELECT id, {H.format(x="s")} AS h FROM sh),
        bits AS (
          SELECT id, t.i, SUM(((h >> CAST(t.i AS INT)) & 1) * 2 - 1) AS v
          FROM hx, range(0, 60) t(i) GROUP BY id, t.i),
        fp AS (
          SELECT id,
                 CAST(SUM(CASE WHEN v > 0
                          THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY id)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY id_a, id_b
    """,
    "dedup_embedding": f"""
        WITH {_VECS},
        banded AS (
          SELECT id, v, nrm,
               {_EMB_BAND_COLS}
          FROM vecs)
        SELECT a.id AS id_a, b.id AS id_b,
               ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_r
        FROM banded a JOIN banded b
          ON a.id < b.id AND ({_EMB_BAND_OR})
        WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
        ORDER BY id_a, id_b
    """,
    "sim_topk_cosine": f"""
        WITH {_VECS},
        scored AS (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
          FROM vecs q JOIN vecs c ON c.id != q.id
          WHERE q.id < 10),
        ranked AS (
          SELECT q_id, cand_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_r DESC, cand_id ASC) AS rank
          FROM scored)
        SELECT q_id, cand_id, cos_r, rank FROM ranked
        WHERE rank <= 5 ORDER BY q_id, rank
    """,
    # ADC top-k over trained PQ codes (mirrors similarity.topk_cosine_pq):
    # codebooks from the unrolled per-subspace k-means, candidate codes from
    # the final assignment, approx cosine from per-query partial-dot tables
    # with explicit left-to-right sums
    "sim_topk_pq": f"""
        WITH {_VECS},
        {_PQ_CTES}
        {_PQ_RANKED}
        SELECT q_id, cand_id, acos_r, rank FROM pqranked
        WHERE rank <= 5 ORDER BY q_id, rank
    """,
    # recall@k of PQ ADC vs the exact float top-k (mirrors
    # extensions.sim_pq_recall; same composition as sim_ann_recall with
    # the PQ ranking in place of the LSH one, both sides at k=3)
    "sim_pq_recall": f"""
        WITH {_VECS},
        {_PQ_CTES}
        {_PQ_RANKED},
        ann AS (SELECT q_id, cand_id FROM pqranked WHERE rank <= 3),
        exact AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM vecs q JOIN vecs c ON c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        hits AS (
          SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM exact e JOIN ann a ON a.q_id = e.q_id AND a.cand_id = e.cand_id
          GROUP BY e.q_id),
        qids AS (SELECT DISTINCT q_id FROM exact)
        SELECT qids.q_id AS q_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(n, 0) / 3.0, 6) AS recall_r
        FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id
    """,
    # residual IVF-PQ (mirrors similarity.ann_topk_ivfpq): coarse cosine
    # k-means cells (the sim_ann_ivf_trained chain), residual = v - cell
    # centroid via zipped parallel unnests, per-subspace k-means over the
    # residuals (prefixed r* CTEs), and ADC with the centroid cross terms
    # - every leaf rounded, every sum explicit left-to-right
    "sim_ann_ivfpq": f"""
        WITH {_VECS},
        {_KMEANS_CTES}
        {_IVFPQ_CHAIN}
        SELECT q_id, cand_id, acos_r, rank FROM ivfpqranked
        WHERE rank <= 3 ORDER BY q_id, rank
    """,
    # recall@k of the residual IVF-PQ ranking vs the exact float top-k -
    # the third recall dial next to sim_ann_recall (LSH) and
    # sim_pq_recall (plain PQ); both sides at k=3
    "sim_ivfpq_recall": f"""
        WITH {_VECS},
        {_KMEANS_CTES}
        {_IVFPQ_CHAIN},
        ann AS (SELECT q_id, cand_id FROM ivfpqranked WHERE rank <= 3),
        exact AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM vecs q JOIN vecs c ON c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        hits AS (
          SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM exact e JOIN ann a ON a.q_id = e.q_id AND a.cand_id = e.cand_id
          GROUP BY e.q_id),
        qids AS (SELECT DISTINCT q_id FROM exact)
        SELECT qids.q_id AS q_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(n, 0) / 3.0, 6) AS recall_r
        FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id
    """,
    "sim_ann_lsh": f"""
        WITH {_VECS},
        b AS (
          SELECT id, v, nrm,
                 {_hp_bucket_sql(4)} AS bkt
          FROM vecs),
        scored AS (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
          FROM b q JOIN b c ON q.bkt = c.bkt AND c.id != q.id
          WHERE q.id < 10),
        ranked AS (
          SELECT q_id, cand_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_r DESC, cand_id ASC) AS rank
          FROM scored)
        SELECT q_id, cand_id, cos_r, rank FROM ranked
        WHERE rank <= 3 ORDER BY q_id, rank
    """,
    # IVF-flat nprobe=2 (extensions.IVF_NPROBE): centroids = first 8
    # vectors; every vector assigned to its max-cosine centroid (round-6
    # sim, cid tiebreak); queries probe their 2 nearest cells (mirrors
    # similarity.ann_topk_ivf - candidates keep one cell, so no dup pairs)
    "sim_ann_ivf": f"""
        WITH {_VECS},
        cents AS (SELECT id AS cid, v AS cv, nrm AS cnrm FROM vecs WHERE id < 8),
        assign AS (
          SELECT id, v, nrm, cid,
                 ROW_NUMBER() OVER (
                   PARTITION BY id
                   ORDER BY ROUND(list_inner_product(v, cv) / (nrm * cnrm), 6) DESC,
                            cid ASC) AS rn
          FROM vecs, cents),
        cells AS (SELECT id, v, nrm, cid AS cell FROM assign WHERE rn = 1),
        probes AS (SELECT id, v, nrm, cid AS cell FROM assign
                   WHERE rn <= 2 AND id < 10),
        scored AS (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
          FROM probes q JOIN cells c ON q.cell = c.cell AND c.id != q.id),
        ranked AS (
          SELECT q_id, cand_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_r DESC, cand_id ASC) AS rank
          FROM scored)
        SELECT q_id, cand_id, cos_r, rank FROM ranked
        WHERE rank <= 3 ORDER BY q_id, rank
    """,
    # trained-quantizer IVF: unroll the SAME deterministic Lloyd iterations
    # (extensions.KMEANS_ITERS = 2, init = first 8 vectors, round-6 sims
    # and round-6 centroid means) then assign/probe exactly like sim_ann_ivf
    "sim_ann_ivf_trained": f"""
        WITH {_VECS},
        {_KMEANS_CTES}
        assign AS (
          SELECT x.id, x.v, x.nrm, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY x.id ORDER BY
                   ROUND(list_inner_product(x.v, c.cv) /
                         (x.nrm * sqrt(list_inner_product(c.cv, c.cv))), 6)
                     DESC, c.cid) AS rn
          FROM vecs x, {_KMEANS_FINAL} c),
        cells AS (SELECT id, v, nrm, cid AS cell FROM assign WHERE rn = 1),
        probes AS (SELECT id, v, nrm, cid AS cell FROM assign
                   WHERE rn <= 2 AND id < 10),
        scored AS (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
          FROM probes q JOIN cells c ON q.cell = c.cell AND c.id != q.id),
        ranked AS (
          SELECT q_id, cand_id, cos_r,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                                    ORDER BY cos_r DESC, cand_id ASC) AS rank
          FROM scored)
        SELECT q_id, cand_id, cos_r, rank FROM ranked
        WHERE rank <= 3 ORDER BY q_id, rank
    """,
    # SemDeDup (mirrors similarity.semantic_dedup + extensions.dedup_semantic):
    # the SAME unrolled Lloyd training as sim_ann_ivf_trained, round-6
    # max-cosine assignment (cid tiebreak), then the in-cell keep-lowest-id
    # rule at the 0.4 near-dup threshold (extensions.EMBED_NEAR_DUP_COS)
    "dedup_semantic": f"""
        WITH {_VECS},
        {_KMEANS_CTES}
        sdassign AS (
          SELECT x.id, x.v, x.nrm, c.cid,
                 ROW_NUMBER() OVER (PARTITION BY x.id ORDER BY
                   ROUND(list_inner_product(x.v, c.cv) /
                         (x.nrm * sqrt(list_inner_product(c.cv, c.cv))), 6)
                     DESC, c.cid) AS rn
          FROM vecs x, {_KMEANS_FINAL} c),
        sdcells AS (SELECT id, v, nrm, cid AS cell FROM sdassign WHERE rn = 1),
        sddups AS (
          SELECT b.id AS id, MIN(a.id) AS dup_of
          FROM sdcells a JOIN sdcells b
            ON a.cell = b.cell AND a.id < b.id
          WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
          GROUP BY b.id)
        SELECT c.id, c.cell, COALESCE(d.dup_of, -1) AS dup_of,
               d.dup_of IS NULL AS keep
        FROM sdcells c LEFT JOIN sddups d ON d.id = c.id
        ORDER BY c.id
    """,
    # BPE-ish pre-tokenizer: contractions | letter runs | digit runs |
    # punctuation runs over lower-cased text (textquality.BPE_PATTERN)
    "text_bpe": r"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text),
                   '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+') AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_bpe,
               CAST(len(list_distinct(t)) AS BIGINT) AS n_bpe_distinct,
               ROUND(CAST(list_sum(list_transform(t, x -> strlen(x))) AS DOUBLE)
                     / len(t), 6) AS mean_tok_len
        FROM toks ORDER BY doc_id
    """,
    # add-one bigram LM surprisal (mirrors textquality.lm_bigram_scores):
    # same whitespace tokens, total-unigram contexts, V from the distinct
    # vocabulary, natural log (DuckDB ln - log() is base 10)
    "text_lm_score": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents),
        bg AS (
          SELECT doc_id AS id, l[i] AS w1, l[i + 1] AS w2
          FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
                FROM t WHERE len(l) >= 2)),
        uni AS (
          SELECT w1, COUNT(*) AS cu
          FROM (SELECT unnest(l) AS w1 FROM t) GROUP BY w1),
        bi AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
        v AS (SELECT COUNT(*) AS v FROM uni)
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-AVG(ln((cb + 1) / (cu + v))), 6) AS nll_r
        FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
        GROUP BY id ORDER BY id
    """,
    "text_tokens": """
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS n_tokens,
               len(list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> ''))) AS n_distinct
        FROM documents ORDER BY doc_id
    """,
    "text_quality": """
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, text,
                 len(toks) AS n,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM t)
        SELECT doc_id,
               length(text) AS n_chars_m,
               n AS n_tokens,
               ROUND(n_stop / n, 6) AS stop_ratio,
               ROUND(n_dist / n, 6) AS distinct_ratio,
               ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                     + 0.3 * (n_dist / n), 6) AS quality
        FROM f ORDER BY doc_id
    """,
    # trigram-profile language ID - the SAME profile literals the Spark side
    # scores (operators/textquality.LANG_TRIGRAMS), occurrence counting via
    # the exact length-delta-of-replace identity
    "text_langid": f"""
        WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
        sc AS (
          SELECT doc_id,
                 {_LANG_SCORE_COLS}
          FROM t)
        SELECT doc_id,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                    WHEN s_es >= s_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               greatest(greatest(greatest(s_en, s_de), s_es), s_fr) AS score
        FROM sc ORDER BY doc_id
    """,
    "text_fingerprint": f"""
        WITH raw_toks AS (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
                FROM documents))
        SELECT doc_id,
               CAST(SUM(({H.format(x="w")} % 1000003) * i) % 2147483647 AS BIGINT) AS fp
        FROM raw_toks GROUP BY doc_id ORDER BY doc_id
    """,
    # the streaming current-state operator must converge to the batch
    # latest-by-event-time answer once the stream is drained
    "stream_last_value": """
        SELECT user_id AS att_conf_id,
               epoch_us(MAX(ts)) AS last_us,
               arg_max(value, ts) AS last_value,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id ORDER BY att_conf_id
    """,
    "multimodal_meta": """
        SELECT doc_id, strlen(text) AS n_bytes, 'text/plain' AS mime
        FROM documents ORDER BY doc_id
    """,
    # NOTE: ascii(char) == UTF-8 byte value only for ASCII corpora; the
    # parity test asserts the corpus is ASCII-only so drift is caught.
    # Splitting to characters covers the whole document - no fixed range
    # cap that would silently truncate long documents.
    "multimodal_extract": """
        SELECT doc_id, strlen(text) AS n_bytes,
               ROUND(AVG(ascii(c)), 6) AS mean_byte
        FROM (SELECT doc_id, text, unnest(string_split(text, '')) AS c
              FROM documents)
        GROUP BY doc_id, text ORDER BY doc_id
    """,
    # byte positions are 1-based characters (ASCII corpus, asserted in
    # tests); "resize" keeps every 2nd byte starting at the first
    # (extensions.RESIZE_FACTOR = 2)
    "multimodal_resize": """
        SELECT doc_id, strlen(text) AS n_bytes_in,
               COUNT(*) AS n_bytes_out,
               ROUND(AVG(ascii(c)), 6) AS mean_byte_out
        FROM (SELECT doc_id, text, unnest(string_split(text, '')) AS c,
                     generate_subscripts(string_split(text, ''), 1) AS i
              FROM documents)
        WHERE (i - 1) % 2 = 0
        GROUP BY doc_id, text ORDER BY doc_id
    """,
    # 256-byte frames, every 4th kept (multimodal.FRAME_BYTES,
    # extensions.FRAME_EVERY)
    "multimodal_frames": """
        SELECT doc_id, CAST((i - 1) // 256 AS BIGINT) AS frame_idx,
               COUNT(*) AS n_bytes, ROUND(AVG(ascii(c)), 6) AS mean_byte
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS c,
                     generate_subscripts(string_split(text, ''), 1) AS i
              FROM documents)
        WHERE ((i - 1) // 256) % 4 = 0
        GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
    """,
    # split thresholds mirror extensions.SPLIT_FRACTIONS {train .8/val .1/
    # test .1} over 10000 hash buckets (operators/sampling.BUCKETS)
    # snapshot reconciliation: same deterministic v1/v2 derivation, statuses
    # from a FULL OUTER join of per-side fingerprints (the fingerprints never
    # cross engines - only the statuses are compared)
    "pipe_delta": """
        WITH v1 AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        v2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 10 <> 1),
        -- COALESCE to the same NULL sentinel as snapshot_diff: NULL text
        -- must fingerprint as a distinct value, not as md5(NULL)=NULL
        o AS (SELECT doc_id AS id, md5(COALESCE(text, chr(0) || 'NULL')) AS fp_old FROM v1),
        n AS (SELECT doc_id AS id, md5(COALESCE(text, chr(0) || 'NULL')) AS fp_new FROM v2)
        SELECT id,
               CASE WHEN fp_old IS NULL THEN 'added'
                    WHEN fp_new IS NULL THEN 'removed'
                    WHEN fp_old = fp_new THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n USING (id)
        ORDER BY id
    """,
    # overlapping chunking (extensions.text_chunk): same 64/48
    # window/stride arithmetic, final window clamped by list_slice,
    # chunk hash = the portable 60-bit md5 of the space-joined tokens
    "text_chunk": f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents),
        ch AS (
          SELECT doc_id, c AS chunk_idx,
                 list_slice(l, c * 48 + 1, c * 48 + 64) AS chunk
          FROM (SELECT doc_id, l,
                       unnest(generate_series(0,
                         CASE WHEN len(l) <= 64 THEN 0
                              ELSE CAST(FLOOR((len(l) - 64 + 47) / 48.0) AS INT)
                         END)) AS c
                FROM t WHERE len(l) > 0))
        SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(chunk) AS BIGINT) AS n_tok,
               {H.format(x="array_to_string(chunk, ' ')")} AS chunk_hash
        FROM ch ORDER BY doc_id, chunk_idx
    """,
    # Poisson bootstrap (extensions.pipe_bootstrap): the identical
    # integer pipeline - salted md5 uniform in [0, 1e6), Poisson(1)
    # weights from the integer threshold chain, replicate means from two
    # exact long sums, CI = fixed ranks of the sorted replicate means
    "pipe_bootstrap": f"""
        WITH d AS (
          SELECT doc_id, source,
                 len(list_filter(string_split(lower(text), ' '),
                                 x -> x <> '')) AS tok
          FROM documents),
        rep AS (
          SELECT source, b,
                 {H.format(x="'boot:' || CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
                   % 1000000 AS u,
                 tok
          FROM d CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)),
        wtd AS (
          SELECT source, b,
                 ((u >= 367879)::INT + (u >= 735759)::INT + (u >= 919699)::INT
                  + (u >= 981012)::INT + (u >= 996340)::INT
                  + (u >= 999406)::INT + (u >= 999917)::INT
                  + (u >= 999990)::INT + (u >= 999999)::INT) AS w,
                 tok
          FROM rep),
        means AS (
          SELECT source, b,
                 CAST(SUM(w * tok) AS DOUBLE) / SUM(w) AS mean_b
          FROM wtd GROUP BY source, b HAVING SUM(w) > 0),
        ranked AS (
          SELECT source, mean_b,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY mean_b, b) AS rn
          FROM means),
        ci AS (
          SELECT source, ROUND(MIN(mean_b), 6) AS ci_lo_r,
                 ROUND(MAX(mean_b), 6) AS ci_hi_r
          FROM ranked WHERE rn IN ({BOOT_LO_RANK_SQL}, {BOOT_HI_RANK_SQL})
          GROUP BY source),
        base AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 ROUND(CAST(SUM(tok) AS DOUBLE) / COUNT(*), 6) AS mean_r
          FROM d GROUP BY source)
        SELECT base.source, n_docs, mean_r, ci_lo_r, ci_hi_r
        FROM base JOIN ci ON ci.source = base.source
        ORDER BY base.source
    """,
    # incremental aggregate maintenance (extensions.pipe_stats_delta):
    # the oracle is the FULL RECOMPUTE over v2 - the Spark side maintains
    # S(v1) +- diff contributions, so the hash match proves the
    # materialized-view algebra exactly reproduces recomputation
    "pipe_stats_delta": """
        WITH v2 AS (
          SELECT doc_id, lang, source,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 10 <> 1)
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(list_filter(string_split(lower(text), ' '),
                                        x -> x <> ''))) AS BIGINT) AS tok_sum,
               CAST(SUM(length(text)) AS BIGINT) AS char_sum
        FROM v2 GROUP BY lang, source ORDER BY lang, source
    """,
    # the diff driving incremental work, composed from first principles:
    # statuses from the fingerprint FULL OUTER join; 'added' docs get an
    # ALL-PAIRS jaccard count over the v2 corpus (the naive form of the
    # Spark side's prefix-filtered incremental probe) with min-id-wins
    # keep; 'changed' docs get the text_quality formula over the NEW text
    "pipe_delta_apply": """
        WITH v1 AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        v2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 10 <> 1),
        o AS (SELECT doc_id AS id, md5(COALESCE(text, chr(0) || 'NULL')) AS fp_old FROM v1),
        n AS (SELECT doc_id AS id, md5(COALESCE(text, chr(0) || 'NULL')) AS fp_new FROM v2),
        st AS (
          SELECT id,
                 CASE WHEN fp_old IS NULL THEN 'added'
                      WHEN fp_new IS NULL THEN 'removed'
                      WHEN fp_old = fp_new THEN 'unchanged'
                      ELSE 'changed' END AS status
          FROM o FULL OUTER JOIN n USING (id)),
        added AS (SELECT id FROM st WHERE status = 'added'),
        changed AS (SELECT id FROM st WHERE status = 'changed'),
        raw_toks AS (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
                FROM v2)),
        sh AS (
          SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
          FROM (SELECT doc_id, w, i,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
                FROM raw_toks)
          WHERE nw IS NOT NULL),
        sz AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
        common AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2),
        jac AS (
          SELECT id_a, id_b, ROUND(c / (sa.n + sb.n - c), 6) AS jaccard
          FROM common
          JOIN sz sa ON sa.id = id_a
          JOIN sz sb ON sb.id = id_b),
        pairs AS (
          SELECT id_a, id_b FROM jac
          WHERE jaccard >= 0.8
            AND (id_a IN (SELECT id FROM added)
                 OR id_b IN (SELECT id FROM added))),
        probe AS (
          SELECT a.id, 'dedup_probe' AS action,
                 CAST((SELECT COUNT(*) FROM pairs p
                       WHERE p.id_a = a.id OR p.id_b = a.id) AS DOUBLE) AS metric_r,
                 NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = a.id) AS keep
          FROM added a),
        cq AS (
          SELECT v2.doc_id, v2.text,
                 list_filter(string_split(lower(v2.text), ' '), x -> x <> '') AS toks
          FROM v2 JOIN changed ON v2.doc_id = changed.id),
        cf AS (
          SELECT doc_id,
                 len(toks) AS nt,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM cq),
        resc AS (
          SELECT doc_id AS id, 'rescore' AS action,
                 ROUND(0.4 * (n_stop / nt) + 0.3 * least(nt / 100.0, 1.0)
                       + 0.3 * (n_dist / nt), 6) AS metric_r,
                 ROUND(0.4 * (n_stop / nt) + 0.3 * least(nt / 100.0, 1.0)
                       + 0.3 * (n_dist / nt), 6) >= 0.32 AS keep
          FROM cf)
        SELECT * FROM probe
        UNION ALL
        SELECT * FROM resc
        ORDER BY id
    """,
    "pipe_split": f"""
        SELECT doc_id,
               CASE WHEN b < 8000 THEN 'train'
                    WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
              FROM documents)
        ORDER BY doc_id
    """,
    # keep fractions mirror extensions.MIX_FRACTIONS {src0 .5, src1 .25,
    # default .1}
    "pipe_domain_mix": f"""
        SELECT doc_id, source
        FROM (SELECT doc_id, source,
                     {H.format(x="'sample:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
              FROM documents)
        WHERE b < CASE source WHEN 'src0' THEN 5000
                              WHEN 'src1' THEN 2500 ELSE 1000 END
        ORDER BY doc_id
    """,
    # recall@k of hyperplane-LSH ANN vs exact top-k (mirrors
    # extensions.sim_ann_recall: both sides at ANN_TOPK=3, nbits=4)
    "sim_ann_recall": f"""
        WITH {_VECS},
        b AS (
          SELECT id, v, nrm, {_hp_bucket_sql(4)} AS bkt
          FROM vecs),
        ann AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM b q JOIN b c ON q.bkt = c.bkt AND c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        exact AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM vecs q JOIN vecs c ON c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        hits AS (
          SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM exact e JOIN ann a ON a.q_id = e.q_id AND a.cand_id = e.cand_id
          GROUP BY e.q_id),
        qids AS (SELECT DISTINCT q_id FROM exact)
        SELECT qids.q_id AS q_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(n, 0) / 3.0, 6) AS recall_r
        FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id
    """,
    # BM25 against the literal extensions.BM25_TERMS query: identical
    # corpus statistics (N, df_t, ROUND-6 avgdl), idf ROUNDed to 6 before
    # use, and the scoring arithmetic written in the same operation order
    # as the Spark projection (k1=1.2, b=0.75)
    "text_bm25": f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        st AS (
          SELECT COUNT(*) AS n, ROUND(AVG(len(toks)), 6) AS avgdl FROM t),
        dfs AS (
          SELECT {", ".join(
            f"SUM(CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0"
            f" THEN 1 ELSE 0 END) AS df{i}" for i, t in enumerate(_BM25_TERMS))}
          FROM t),
        idf AS (
          SELECT {", ".join(
            f"ROUND(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1), 6) AS idf{i}"
            for i in range(len(_BM25_TERMS)))}
          FROM st, dfs)
        SELECT doc_id,
               ROUND({" + ".join(
                 f"idf{i} * tf{i} * 2.2 / (tf{i} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
                 for i in range(len(_BM25_TERMS)))}, 6) AS bm25
        FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                     {", ".join(
                       f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
                       for i, t in enumerate(_BM25_TERMS))}
              FROM t), st, idf
        ORDER BY doc_id
    """,
    # Naive-Bayes model (operators/nbayes.py): identical tokenization,
    # min_count vocabulary cut, and ln arithmetic; log-probs published as
    # int64 micro-nats (CAST(ROUND(ln(..)*1e6, 0) AS BIGINT)) so every
    # downstream sum is integer-exact in any engine
    "text_nb_train": """
        WITH docs AS (  -- NULL-label contract: unlabeled rows don't train
          SELECT doc_id, lang, text FROM documents WHERE lang IS NOT NULL),
        t AS (
          SELECT doc_id, lang,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM docs),
        tok AS (SELECT doc_id, lang, unnest(toks) AS token FROM t),
        c AS (SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM tok GROUP BY 1, 2),
        m AS (SELECT token, lang, n FROM
                (SELECT token, lang, n,
                        SUM(n) OVER (PARTITION BY token) AS tot FROM c)
              WHERE tot >= 5),
        vst AS (SELECT COUNT(DISTINCT token) AS v FROM m),
        tl AS (SELECT l.lang, COALESCE(s.t_l, 0) AS t_l
               FROM (SELECT lang, COUNT(*) AS n_docs FROM docs GROUP BY 1) l
               LEFT JOIN (SELECT lang, SUM(n) AS t_l FROM m GROUP BY 1) s
                 USING (lang))
        SELECT m.token, m.lang AS label, m.n,
               CAST(ROUND(ln((m.n + 1.0) / CAST(t_l + v AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS logp_fp
        FROM m JOIN tl ON m.lang = tl.lang, vst
        ORDER BY token, label
    """,
    # NB scoring: per-(doc, candidate-label) int64 score sums with the
    # per-label default for out-of-vocab tokens, prior added, argmax with
    # smaller-label tie-break; empty docs score prior-only via the
    # documents-left-join base
    "text_nb_classify": """
        WITH docs AS (  -- NULL-label contract: unlabeled rows neither
          -- train nor classify (mirrors nbayes._labeled)
          SELECT doc_id, lang, text FROM documents WHERE lang IS NOT NULL),
        t AS (
          SELECT doc_id, lang,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM docs),
        tok AS (SELECT doc_id, lang, unnest(toks) AS token FROM t),
        c AS (SELECT token, lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM tok GROUP BY 1, 2),
        m AS (SELECT token, lang, n FROM
                (SELECT token, lang, n,
                        SUM(n) OVER (PARTITION BY token) AS tot FROM c)
              WHERE tot >= 5),
        vst AS (SELECT COUNT(DISTINCT token) AS v FROM m),
        tl AS (SELECT l.lang, l.n_docs, COALESCE(s.t_l, 0) AS t_l
               FROM (SELECT lang, COUNT(*) AS n_docs FROM docs GROUP BY 1) l
               LEFT JOIN (SELECT lang, SUM(n) AS t_l FROM m GROUP BY 1) s
                 USING (lang)),
        model AS (
          SELECT m.token, m.lang,
                 CAST(ROUND(ln((m.n + 1.0) / CAST(t_l + v AS DOUBLE)) * 1e6, 0)
                      AS BIGINT) AS logp_fp
          FROM m JOIN tl ON m.lang = tl.lang, vst),
        st AS (
          SELECT lang,
                 CAST(ROUND(ln(1.0 / CAST(t_l + v AS DOUBLE)) * 1e6, 0)
                      AS BIGINT) AS def_fp,
                 CAST(ROUND(ln(CAST(n_docs AS DOUBLE) / n_total) * 1e6, 0)
                      AS BIGINT) AS prior_fp
          FROM tl, vst, (SELECT COUNT(*) AS n_total FROM docs)),
        ds AS (
          SELECT tk.doc_id, st.lang AS cand,
                 CAST(SUM(COALESCE(model.logp_fp, st.def_fp)) AS BIGINT) AS s
          FROM tok tk CROSS JOIN st
          LEFT JOIN model ON model.token = tk.token AND model.lang = st.lang
          GROUP BY 1, 2),
        tot AS (
          SELECT d.doc_id, d.lang, st.lang AS cand,
                 st.prior_fp + COALESCE(ds.s, 0) AS score
          FROM docs d CROSS JOIN st
          LEFT JOIN ds ON ds.doc_id = d.doc_id AND ds.cand = st.lang)
        SELECT doc_id, lang, cand AS pred, CAST(score AS BIGINT) AS score_fp
        FROM (SELECT doc_id, lang, cand, score,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, cand ASC) AS r
              FROM tot)
        WHERE r = 1 ORDER BY doc_id
    """,
    # long->wide pivot as conditional aggregation (mirrors
    # extensions.events_pivot's literal EVENT_TYPES column set)
    "events_pivot": """
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    # ROLLUP levels with GROUPING() encoding matched to Spark's
    # grouping_id bit order (event_type = high bit... low bit = last col)
    "events_rollup": """
        SELECT event_type,
               CAST(user_id % 10 AS BIGINT) AS user_bucket,
               CAST(GROUPING(event_type) * 2
                    + GROUPING(user_id % 10) AS BIGINT) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(value), 6) AS sum_v
        FROM events
        GROUP BY ROLLUP(event_type, user_id % 10)
        ORDER BY gid, event_type, user_bucket
    """,
    # exact percentiles: Spark percentile == DuckDB quantile_cont (both
    # linear interpolation) under round-6; NaNs filtered on both sides
    "events_quantiles": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.95), 6) AS p95,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY user_id ORDER BY user_id
    """,
    # approx-percentile guarantee measurement: the sketch values are
    # engine-specific, so the oracle pins the user set, the exact counts,
    # and that every in-engine rank-error bound check concluded TRUE
    # (extensions.events_quantiles_approx documents the measurement)
    "events_quantiles_approx": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        GROUP BY user_id ORDER BY user_id
    """,
    # hopping windows: every event belongs to width/slide = 4 windows whose
    # starts are the 4 preceding slide-aligned boundaries (Spark's
    # epoch-aligned window(ts, '1 day', '6 hours') semantics)
    "window_sliding": """
        WITH e AS (SELECT epoch_us(ts) AS t, value FROM events),
        x AS (
          SELECT ((t // 21600000000) - k) * 21600000000 AS start_us, value
          FROM e, range(0, 4) r(k))
        SELECT CAST(start_us AS BIGINT) AS start_us,
               CAST(start_us + 86400000000 AS BIGINT) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(value), 6) AS mean_v
        FROM x GROUP BY start_us ORDER BY start_us
    """,
    # gaps-and-islands sessionization (mirrors extensions.window_sessions,
    # 6h gap): new session iff the per-user time delta >= gap; session end
    # = last event + gap, matching F.session_window semantics
    "window_sessions": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        m AS (
          SELECT user_id, t, value,
                 CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                        OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                           >= 21600000000
                      THEN 1 ELSE 0 END AS ns
          FROM e),
        i AS (
          SELECT user_id, t, value,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM m)
        SELECT user_id,
               CAST(MIN(t) AS BIGINT) AS start_us,
               CAST(MAX(t) + 21600000000 AS BIGINT) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 6) AS sum_v
        FROM i GROUP BY user_id, sid ORDER BY user_id, start_us
    """,
    # streaming dedup of the self-unioned stream must equal the plain table
    "stream_dedup": """
        SELECT event_id, epoch_us(ts) AS t_us, user_id
        FROM events ORDER BY event_id
    """,
    # user-journey transition matrix (extensions.events_markov): LAG
    # over the same deterministic (us, event_id) per-user order, exact
    # integer transition counts, round-6 row-normalized probabilities
    "events_markov": """
        WITH s AS (
          SELECT user_id,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id)
                   AS src_type,
                 event_type AS dst_type
          FROM events),
        c AS (
          SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM s WHERE src_type IS NOT NULL GROUP BY src_type, dst_type),
        t AS (SELECT src_type, SUM(n) AS tot FROM c GROUP BY src_type)
        SELECT c.src_type, c.dst_type, n, ROUND(n / tot, 6) AS p_r
        FROM c JOIN t ON t.src_type = c.src_type
        ORDER BY c.src_type, c.dst_type
    """,
    # date-spine densification (extensions.events_scaffold): same dense
    # (user x day) grid via generate_series, per-day last by
    # arg_max over the (epoch, event_id) pair, forward fill via
    # last_value IGNORE NULLS over the same rows frame
    "events_scaffold": """
        WITH evd AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day, value,
                 epoch_us(ts) AS us, event_id
          FROM events),
        rng AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM evd),
        spine AS (
          SELECT u.user_id, d.day
          FROM (SELECT DISTINCT user_id FROM evd) u
          CROSS JOIN (SELECT unnest(generate_series(
                        (SELECT d0 FROM rng), (SELECT d1 FROM rng))) AS day) d),
        ranked AS (
          SELECT user_id, day, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, day
                                    ORDER BY us DESC, event_id DESC) AS rn
          FROM evd),
        counts AS (
          SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM evd GROUP BY user_id, day),
        daily AS (
          SELECT c.user_id, c.day, c.n_events, r.value AS day_last
          FROM counts c
          JOIN ranked r ON r.user_id = c.user_id AND r.day = c.day
                       AND r.rn = 1)
        SELECT s.user_id, s.day,
               COALESCE(n_events, 0) AS n_events,
               ROUND(last_value(day_last IGNORE NULLS) OVER (
                 PARTITION BY s.user_id ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                 AS ffill_r
        FROM spine s
        LEFT JOIN daily ON daily.user_id = s.user_id AND daily.day = s.day
        ORDER BY s.user_id, s.day
    """,
    # exactly-once-across-restart (extensions.stream_restart): the
    # oracle pins the batch count/checksum; the three contracts are
    # hard-coded true - each derived independently on the Spark side
    # (landed-vs-batch sums, distinct-count, phase-2 progress rows)
    "stream_restart": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(event_id) AS BIGINT) AS checksum,
               true AS checksum_ok, true AS no_dupes,
               true AS resumed_only_delta
        FROM events
    """,
    # last-touch attribution (extensions.events_attribution): the naive
    # range-join form - the bucketized engine plan must produce exactly
    # these pairs; view-timestamp ties resolve by view event_id
    "events_attribution": """
        WITH v AS (
          SELECT user_id, event_id AS view_id, epoch_us(ts) AS vus
          FROM events WHERE event_type = 'view'),
        c AS (
          SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus
          FROM events WHERE event_type = 'click'),
        pairs AS (
          SELECT c.click_id, c.user_id, c.cus, v.vus,
                 ROW_NUMBER() OVER (PARTITION BY c.click_id
                                    ORDER BY v.vus DESC, v.view_id) AS rk
          FROM c JOIN v
            ON v.user_id = c.user_id
           AND c.cus >= v.vus AND c.cus - v.vus <= 3600000000)
        SELECT click_id, user_id, cus AS click_us, vus AS view_us,
               cus - vus AS lag_us
        FROM pairs WHERE rk = 1
        ORDER BY user_id, click_us, click_id
    """,
    # the watermarked stream-stream interval join (append mode,
    # availableNow drain) must emit exactly the batch range-join pairs
    "stream_join": """
        SELECT v.user_id,
               epoch_us(v.ts) AS view_us,
               epoch_us(c.ts) AS click_us,
               epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        ORDER BY v.user_id, view_us, click_us
    """,
    # the streamed tumbling windows (complete mode, availableNow drain)
    # must equal plain batch windowed SQL; streaming windows FLOOR edges
    "stream_window": """
        SELECT CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT)
                 * 86400000000 AS bucket_us,
               ROUND(AVG(value), 6) AS mean_v, COUNT(*) AS n
        FROM events GROUP BY bucket_us ORDER BY bucket_us
    """,
    # packing mirrors extensions.PACK_SEQ_LEN=2048 / PACK_SHARDS=16 and
    # operators/sampling.pack_sequences: shard = bucket % 16, order within
    # shard = (bucket, doc_id), start = exclusive running token sum
    "pipe_pack": f"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS n_tok,
                 {H.format(x="'pack:' || CAST(doc_id AS VARCHAR)")} AS h
          FROM documents),
        c AS (
          SELECT doc_id, (h % 10000) % 16 AS shard, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY (h % 10000) % 16 ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_tok
          FROM t)
        SELECT doc_id, shard, start_tok, start_tok + n_tok AS end_tok,
               CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS seq_id
        FROM c ORDER BY doc_id
    """,
    # the shard-sink audit recomputed from first principles: split CASE
    # (mirrors pipe_split), pack-within-split window cumsum (mirrors
    # pipe_pack with PARTITION BY split, shard), then per-(split, shard)
    # layout aggregates. contiguous is derivable here (cumsum tiles by
    # construction); the Spark side measures it from on-disk row order.
    "pipe_shard_sink": f"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                   AS n_tok,
                 {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS bs,
                 {H.format(x="'pack:' || CAST(doc_id AS VARCHAR)")} AS hp
          FROM documents),
        s AS (
          SELECT doc_id, n_tok, hp,
                 CASE WHEN bs < 8000 THEN 'train'
                      WHEN bs < 9000 THEN 'val' ELSE 'test' END AS split
          FROM t),
        c AS (
          SELECT split, (hp % 10000) % 16 AS shard, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY split, (hp % 10000) % 16 ORDER BY hp, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_tok
          FROM s)
        SELECT split, CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_toks,
               CAST(MIN(start_tok) AS BIGINT) AS min_start,
               CAST(MAX(start_tok + n_tok) AS BIGINT) AS max_end,
               (MIN(start_tok) = 0
                AND MAX(start_tok + n_tok) = SUM(n_tok)) AS contiguous
        FROM c GROUP BY split, shard ORDER BY split, shard
    """,
    # quality threshold mirrors extensions.CURATION_MIN_QUALITY = 0.32
    # sequential curation funnel (mirrors extensions.pipe_funnel): each
    # stage filters the PREVIOUS stage's survivors; near-dup drop = docs
    # appearing as the larger id of a >= 0.8 jaccard pair among stage-3
    # survivors (shingles computed over the survivors, like the Spark side)
    "pipe_funnel": """
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id,
                 len(toks) AS n,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM t),
        s2 AS (
          SELECT d.doc_id, d.text FROM documents d JOIN f USING (doc_id)
          WHERE ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                      + 0.3 * (n_dist / n), 6) >= 0.32),
        reps AS (
          SELECT MIN(doc_id) AS doc_id FROM s2 GROUP BY md5(LOWER(text))),
        s3 AS (SELECT s2.doc_id, s2.text FROM s2 JOIN reps USING (doc_id)),
        raw_toks3 AS (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
                FROM s3)),
        sh3 AS (
          SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
          FROM (SELECT doc_id, w, i,
                       lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
                FROM raw_toks3)
          WHERE nw IS NOT NULL),
        sz3 AS (SELECT id, COUNT(*) AS n FROM sh3 GROUP BY id),
        common3 AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
          FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2),
        dominated AS (
          SELECT DISTINCT id_b AS doc_id
          FROM common3
          JOIN sz3 sa ON sa.id = id_a
          JOIN sz3 sb ON sb.id = id_b
          WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.8),
        s4 AS (
          SELECT doc_id FROM s3
          WHERE doc_id NOT IN (SELECT doc_id FROM dominated))
        SELECT CAST(1 AS BIGINT) AS stage, 'quality' AS name,
               CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_in,
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_kept
        UNION ALL
        SELECT 2, 'exact_dedup',
               CAST((SELECT COUNT(*) FROM s2) AS BIGINT),
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
        UNION ALL
        SELECT 3, 'near_dup',
               CAST((SELECT COUNT(*) FROM s3) AS BIGINT),
               CAST((SELECT COUNT(*) FROM s4) AS BIGINT)
        ORDER BY stage
    """,
    "pipe_curation": f"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id,
                 len(toks) AS n,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM t),
        good AS (
          SELECT doc_id FROM f
          WHERE ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                      + 0.3 * (n_dist / n), 6) >= 0.32),
        reps AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(LOWER(text))),
        kept AS (
          SELECT d.doc_id, d.source FROM documents d
          JOIN good USING (doc_id) JOIN reps USING (doc_id)),
        sp AS (
          SELECT source,
                 {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
          FROM kept)
        SELECT CASE WHEN b < 8000 THEN 'train'
                    WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
               source, COUNT(*) AS n_docs
        FROM sp GROUP BY 1, 2 ORDER BY split, source
    """,
}

# the streaming sessionization must converge to EXACTLY the batch answer
# (complete-mode drain), so its oracle is the same gaps-and-islands SQL
EXTENSION_ORACLE["stream_sessions"] = EXTENSION_ORACLE["window_sessions"]

# streamed NB scoring is bit-identical to batch classification by
# construction (integer micro-nat sums, same argmax), so it shares the
# batch oracle verbatim - the stream_raster aliasing discipline
EXTENSION_ORACLE["stream_classify"] = EXTENSION_ORACLE["text_nb_classify"]

# the streamed end-to-end curation lifecycle (extensions.stream_curation):
# the landed parquet store's per-language digest must equal the BATCH
# NB-classify CTE filtered to pred = lang - a hash match proves the
# duplicated stream landed each surviving doc exactly once with
# bit-identical integer scores. landed_once is a physical-store fact
# (zero duplicate doc_ids on disk) SQL cannot see: hard-coded TRUE, the
# scale_zorder discipline.
EXTENSION_ORACLE["stream_curation"] = f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]})
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(score_fp) AS BIGINT) AS score_sum,
           TRUE AS landed_once
    FROM cls WHERE pred = lang
    GROUP BY lang ORDER BY lang
"""

# the Gopher rule filter (extensions.text_gopher_rules /
# textquality.gopher_rules): identical rule arithmetic - length-delta
# symbol counts (the '...' delta is an exact multiple of 3, so the cast
# is rounding-free in both engines), hash and ellipsis ratios SEPARATE
# (the paper drops on EITHER exceeding 0.1), ROUND-6 ratios compared to
# the same literals, list_intersect/array_intersect both set-semantics
EXTENSION_ORACLE["text_gopher_rules"] = """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks,
             list_filter(string_split(text, chr(10)), x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) <> '') AS lines
      FROM documents
      WHERE len(list_filter(string_split(text, chr(10)),
                            x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) <> '')) > 0),
    f AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             ROUND(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                   / len(toks), 6) AS mean_word_len,
             ROUND((length(text) - length(replace(text, '#', '')))
                   / len(toks), 6) AS hash_ratio,
             ROUND((CAST((length(text) - length(replace(text, '...', ''))) / 3
                         AS BIGINT)
                    + length(text) - length(replace(text, '…', '')))
                   / len(toks), 6) AS ellipsis_sym_ratio,
             ROUND(len(list_filter(lines,
                     l -> ltrim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))[1:1] IN ('-', '*', '•')))
                   / len(lines), 6) AS frac_bullet,
             ROUND(len(list_filter(lines,
                     l -> ends_with(rtrim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '...') OR ends_with(rtrim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '…')))
                   / len(lines), 6) AS frac_ellipsis,
             ROUND(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                   / len(toks), 6) AS frac_alpha,
             CAST(len(list_intersect(toks,
                  ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
                  AS BIGINT) AS n_stop
      FROM t WHERE len(toks) > 0)
    SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_sym_ratio,
           frac_bullet, frac_ellipsis, frac_alpha, n_stop,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND hash_ratio <= 0.1
            AND ellipsis_sym_ratio <= 0.1
            AND frac_bullet <= 0.9
            AND frac_ellipsis <= 0.3
            AND frac_alpha >= 0.8
            AND n_stop >= 2) AS keep
    FROM f ORDER BY doc_id
"""

# chunk-grain BM25 retrieval with doc max-pool (extensions.sim_chunk_bm25):
# the dedup_chunk window arithmetic produces the chunk token lists
# directly (no re-split - the engine's array_join/words round-trip is
# the identity on whitespace tokens), then the text_bm25 statistics and
# scoring CTEs verbatim over CHUNKS, the per-doc best-chunk rank, and
# the global top-10
EXTENSION_ORACLE["sim_chunk_bm25"] = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      FROM documents),
    ch AS (
      SELECT doc_id, c AS chunk_idx,
             list_slice(l, c * 48 + 1, c * 48 + 64) AS toks
      FROM (SELECT doc_id, l,
                   unnest(generate_series(0,
                     CASE WHEN len(l) <= 64 THEN 0
                          ELSE CAST(FLOOR((len(l) - 64 + 47) / 48.0) AS INT)
                     END)) AS c
            FROM t WHERE len(l) > 0)),
    st AS (SELECT COUNT(*) AS n, ROUND(AVG(len(toks)), 6) AS avgdl FROM ch),
    dfs AS (
      SELECT {", ".join(
        f"SUM(CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0"
        f" THEN 1 ELSE 0 END) AS df{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM ch),
    idf AS (
      SELECT {", ".join(
        f"ROUND(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1), 6) AS idf{i}"
        for i in range(len(_BM25_TERMS)))}
      FROM st, dfs),
    bm AS (
      SELECT doc_id, chunk_idx,
             ROUND({" + ".join(
               f"idf{i} * tf{i} * 2.2 / (tf{i} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
               for i in range(len(_BM25_TERMS)))}, 6) AS bm25
      FROM (SELECT doc_id, chunk_idx, CAST(len(toks) AS DOUBLE) AS dl,
                   {", ".join(
                     f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
                     for i, t in enumerate(_BM25_TERMS))}
            FROM ch), st, idf),
    best AS (
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, bm25
      FROM (SELECT doc_id, chunk_idx, bm25,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY bm25 DESC, chunk_idx ASC) AS rn
            FROM bm)
      WHERE rn = 1)
    SELECT doc_id, chunk_idx, bm25 FROM best
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
"""

# the C4 line-level cleaning filter (extensions.text_c4_rules /
# textquality.c4_rules): identical line predicates and doc rules;
# n_kept_words sums per-line word counts (never re-splitting the joined
# text, whose chr(10) separators would glue boundary tokens); sentence
# count is the exact length-delta over the kept text
EXTENSION_ORACLE["text_c4_rules"] = """
    WITH raw AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents),
    lined AS (
      SELECT doc_id,
             array_to_string(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
               i -> array_to_string(list_slice(toks, i*10 + 1, i*10 + 10), ' ')
                    || CASE WHEN (doc_id + i) % 3 <> 2 THEN '.' ELSE '' END),
               chr(10))
             || CASE WHEN doc_id % 97 = 0
                     THEN chr(10) || 'config block follows here {'
                     ELSE '' END
             || CASE WHEN doc_id % 89 = 0
                     THEN chr(10) || 'lorem ipsum filler text here.'
                     ELSE '' END AS text
      FROM raw WHERE len(toks) > 0),
    t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)), x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) <> '') AS lines,
             contains(text, '{') AS has_brace,
             contains(lower(text), 'lorem ipsum') AS has_lorem
      FROM lined),
    k AS (
      SELECT doc_id, has_brace, has_lorem, lines,
             list_filter(lines, l ->
                right(rtrim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 1) IN ('.', '!', '?', '"')
                AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
      FROM t WHERE len(lines) > 0),
    f AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept_lines,
             ROUND(len(kept) / len(lines), 6) AS kept_ratio,
             CAST(COALESCE(list_aggregate(list_transform(kept,
                    l -> len(list_filter(string_split(l, ' '), w -> w <> ''))),
                  'sum'), 0) AS BIGINT) AS n_kept_words,
             -- DuckDB's array_to_string is NULL on an empty list where
             -- Spark's array_join is '' - coalesce to the engine's value
             COALESCE(array_to_string(kept, chr(10)), '') AS cleaned,
             has_brace, has_lorem
      FROM k)
    SELECT doc_id, n_lines, n_kept_lines, kept_ratio, n_kept_words,
           CAST(length(cleaned) - length(replace(cleaned, '.', ''))
                + length(cleaned) - length(replace(cleaned, '!', ''))
                + length(cleaned) - length(replace(cleaned, '?', ''))
                AS BIGINT) AS n_sentences,
           has_brace, has_lorem,
           ((length(cleaned) - length(replace(cleaned, '.', ''))
             + length(cleaned) - length(replace(cleaned, '!', ''))
             + length(cleaned) - length(replace(cleaned, '?', ''))) >= 3
            AND NOT has_brace AND NOT has_lorem) AS keep,
           md5(cleaned) AS cleaned_md5
    FROM f ORDER BY doc_id
"""

# DPO preference pairs (extensions.pipe_pref_pairs): the pipe_funnel
# quality formula (raw ratios inside, ROUND-6 once), best/worst per
# (source, lang) with the engine's exact tie-breaks, zero-margin pairs
# dropped, NULL-lang excluded (the NB labeled contract)
EXTENSION_ORACLE["pipe_pref_pairs"] = """
    WITH t AS (
      SELECT doc_id, source, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents WHERE lang IS NOT NULL),
    q AS (
      SELECT doc_id, source, lang,
             ROUND(0.4 * (len(list_filter(toks,
                      x -> x IN ('the', 'a', 'of', 'and', 'to'))) / len(toks))
                   + 0.3 * least(len(toks) / 100.0, 1.0)
                   + 0.3 * (len(list_distinct(toks)) / len(toks)), 6) AS quality
      FROM t),
    r AS (
      SELECT source, lang, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY quality DESC, doc_id ASC) AS rc,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY quality ASC, doc_id DESC) AS rr
      FROM q),
    c AS (SELECT source, lang, doc_id AS chosen_id, quality AS q_chosen
          FROM r WHERE rc = 1),
    j AS (SELECT source, lang, doc_id AS rejected_id, quality AS q_rejected
          FROM r WHERE rr = 1)
    SELECT c.source, c.lang, chosen_id, rejected_id, q_chosen, q_rejected,
           ROUND(q_chosen - q_rejected, 6) AS margin
    FROM c JOIN j USING (source, lang)
    WHERE chosen_id <> rejected_id AND ROUND(q_chosen - q_rejected, 6) > 0
    ORDER BY source, lang
"""

# Cohen's kappa between the trained NB and the trigram lang-ID
# (extensions.pipe_classifier_agreement): both classifier CTEs nested
# verbatim (the text_nb_eval discipline), integer confusion counts, po
# and pe as single double divisions of exact BIGINT sums combined in
# the engine's operation order, rounded once
EXTENSION_ORACLE["pipe_classifier_agreement"] = f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]}),
    tri AS ({EXTENSION_ORACLE["text_langid"]}),
    j AS (SELECT cls.doc_id, cls.pred AS pred_nb, tri.pred_lang AS pred_tri
          FROM cls JOIN tri USING (doc_id)),
    conf AS (SELECT pred_nb, pred_tri, CAST(COUNT(*) AS BIGINT) AS n
             FROM j GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(CASE WHEN pred_nb = pred_tri THEN n ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM conf),
    rowm AS (SELECT pred_nb AS k, CAST(SUM(n) AS BIGINT) AS rn
             FROM conf GROUP BY 1),
    colm AS (SELECT pred_tri AS k, CAST(SUM(n) AS BIGINT) AS cn
             FROM conf GROUP BY 1),
    pe AS (SELECT CAST(COALESCE(SUM(rn * cn), 0) AS BIGINT) AS pe_num
           FROM rowm JOIN colm USING (k)),
    scal AS (
      SELECT ROUND(CAST(n_agree AS DOUBLE) / nn, 6) AS po_r,
             ROUND(pe_num / (CAST(nn AS DOUBLE) * nn), 6) AS pe_r,
             ROUND((CAST(n_agree AS DOUBLE) / nn
                    - pe_num / (CAST(nn AS DOUBLE) * nn))
                   / (1.0 - pe_num / (CAST(nn AS DOUBLE) * nn)), 6) AS kappa_r
      FROM tot, pe)
    SELECT pred_nb, pred_tri, n, po_r, pe_r, kappa_r
    FROM conf, scal ORDER BY pred_nb, pred_tri
"""

# confusion matrix over the classify result - reuses the classify CTE
# block verbatim (DuckDB accepts a nested WITH inside a CTE body)
EXTENSION_ORACLE["text_nb_eval"] = f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]})
    SELECT lang AS actual, pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM cls GROUP BY 1, 2 ORDER BY actual, pred
"""

# chunk-grain exact dedup (extensions.dedup_chunk): the text_chunk 64/48
# window arithmetic, then keep-first per chunk_hash content group
EXTENSION_ORACLE["dedup_chunk"] = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      FROM documents),
    ch AS (
      SELECT doc_id, c AS chunk_idx,
             list_slice(l, c * 48 + 1, c * 48 + 64) AS chunk
      FROM (SELECT doc_id, l,
                   unnest(generate_series(0,
                     CASE WHEN len(l) <= 64 THEN 0
                          ELSE CAST(FLOOR((len(l) - 64 + 47) / 48.0) AS INT)
                     END)) AS c
            FROM t WHERE len(l) > 0)),
    h AS (
      SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             {H.format(x="array_to_string(chunk, ' ')")} AS chunk_hash
      FROM ch)
    SELECT doc_id, chunk_idx, chunk_hash,
           CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS n_copies,
           (ROW_NUMBER() OVER (PARTITION BY chunk_hash
                               ORDER BY doc_id, chunk_idx) = 1) AS keep
    FROM h ORDER BY doc_id, chunk_idx
"""

# chunk-grain MinHash near-dup (extensions.dedup_chunk_near): the SAME
# 64/48 windows packed into cid = doc_id * 2^20 + chunk_idx, then the
# dedup_minhash_lsh chain verbatim at chunk grain - signatures, band
# candidacy (replayed in SQL so parity checks the LSH filter itself),
# exact Jaccard verification
EXTENSION_ORACLE["dedup_chunk_near"] = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      FROM documents),
    ch AS (
      SELECT doc_id * {1 << 20} + c AS cid,
             list_slice(l, c * 48 + 1, c * 48 + 64) AS chunk
      FROM (SELECT doc_id, l,
                   unnest(generate_series(0,
                     CASE WHEN len(l) <= 64 THEN 0
                          ELSE CAST(FLOOR((len(l) - 64 + 47) / 48.0) AS INT)
                     END)) AS c
            FROM t WHERE len(l) > 0)),
    cw AS (SELECT cid, unnest(chunk) AS w,
                  generate_subscripts(chunk, 1) AS i
           FROM ch),
    sh AS (
      SELECT DISTINCT cid AS id, w || ' ' || nw AS s
      FROM (SELECT cid, w, i,
                   lead(w) OVER (PARTITION BY cid ORDER BY i) AS nw
            FROM cw)
      WHERE nw IS NOT NULL),
    hx AS (
      SELECT id, {H.format(x="s")} % {MINHASH_P} AS h31
      FROM sh),
    sig AS (
      SELECT id, {_SIG_COLS}
      FROM hx GROUP BY id),
    banded AS (
      SELECT id, {_BAND_COLS}
      FROM sig),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM banded a JOIN banded b
        ON a.id < b.id
       AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
    {_JACCARD}
    SELECT CAST(id_a // {1 << 20} AS BIGINT) AS doc_a,
           CAST(id_a % {1 << 20} AS BIGINT) AS idx_a,
           CAST(id_b // {1 << 20} AS BIGINT) AS doc_b,
           CAST(id_b % {1 << 20} AS BIGINT) AS idx_b,
           j.jaccard
    FROM jac j JOIN cand USING (id_a, id_b)
    WHERE j.jaccard >= 0.8 ORDER BY doc_a, idx_a, doc_b, idx_b
"""

# the CCNet-composition trained curation funnel
# (extensions.pipe_curation_trained): nested NB-classify and bigram-LM
# CTEs reused verbatim (the text_nb_eval nesting discipline), per-lang
# round-6 median via quantile_cont (the events_quantiles parity class),
# then pipe_funnel's dedup/near-dup stage SQL over the survivors
EXTENSION_ORACLE["pipe_curation_trained"] = f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]}),
    s1 AS (SELECT doc_id, lang FROM cls WHERE pred = lang),
    lm AS ({EXTENSION_ORACLE["text_lm_score"]}),
    s1lm AS (SELECT s1.doc_id, s1.lang, lm.nll_r
             FROM s1 JOIN lm ON lm.id = s1.doc_id),
    med AS (SELECT lang, ROUND(quantile_cont(nll_r, 0.5), 6) AS med_r
            FROM s1lm GROUP BY lang),
    s2 AS (SELECT doc_id FROM s1lm JOIN med USING (lang)
           WHERE nll_r <= med_r),
    d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN s2 USING (doc_id)),
    reps AS (SELECT MIN(doc_id) AS doc_id FROM d2 GROUP BY md5(LOWER(text))),
    s3 AS (SELECT d2.doc_id, d2.text FROM d2 JOIN reps USING (doc_id)),
    raw_toks3 AS (
      SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
            FROM s3)),
    sh3 AS (
      SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
      FROM (SELECT doc_id, w, i,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
            FROM raw_toks3)
      WHERE nw IS NOT NULL),
    sz3 AS (SELECT id, COUNT(*) AS n FROM sh3 GROUP BY id),
    common3 AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
      FROM sh3 a JOIN sh3 b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2),
    dominated AS (
      SELECT DISTINCT id_b AS doc_id
      FROM common3
      JOIN sz3 sa ON sa.id = id_a
      JOIN sz3 sb ON sb.id = id_b
      WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.8),
    s4 AS (
      SELECT doc_id FROM s3
      WHERE doc_id NOT IN (SELECT doc_id FROM dominated))
    SELECT CAST(1 AS BIGINT) AS stage, 'nb_lang' AS name,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_in,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_kept
    UNION ALL
    SELECT 2, 'lm_ppl',
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, 'exact_dedup',
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    UNION ALL
    SELECT 4, 'near_dup',
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s4) AS BIGINT)
    ORDER BY stage
"""

# quality-classifier calibration sweep (extensions.pipe_curation_sweep):
# the text_nb_classify / text_lm_score CTEs nested verbatim, the
# NB-agreement branch crossed with four nearest-rank retention
# percentiles via one unnest - rank prefix (pct * n + 99) // 100 in
# exact integer arithmetic, round-6 fractions from exact int64 sums
EXTENSION_ORACLE["pipe_curation_sweep"] = f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]}),
    lm AS ({EXTENSION_ORACLE["text_lm_score"]}),
    base AS (
      SELECT d.doc_id, d.lang,
             CAST(len(list_filter(string_split(lower(d.text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tok,
             lm.nll_r
      FROM documents d JOIN lm ON lm.id = d.doc_id
      WHERE d.lang IS NOT NULL),
    u AS (
      SELECT FALSE AS nb_filter, doc_id, lang, n_tok, nll_r FROM base
      UNION ALL
      SELECT TRUE, b.doc_id, b.lang, b.n_tok, b.nll_r
      FROM base b JOIN cls ON cls.doc_id = b.doc_id
      WHERE cls.pred = cls.lang),
    ranked AS (
      SELECT nb_filter, n_tok,
             ROW_NUMBER() OVER (PARTITION BY nb_filter, lang
                                ORDER BY nll_r, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY nb_filter, lang) AS n
      FROM u),
    totals AS (
      SELECT nb_filter, CAST(COUNT(*) AS BIGINT) AS n_docs_in,
             CAST(SUM(n_tok) AS BIGINT) AS tok_in
      FROM ranked GROUP BY nb_filter),
    kept AS (
      SELECT nb_filter, CAST(pct AS BIGINT) AS pct,
             CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
             CAST(SUM(n_tok) AS BIGINT) AS tok_kept
      FROM ranked, (SELECT unnest([25, 50, 75, 100]) AS pct) p
      WHERE rn <= (pct * n + 99) // 100
      GROUP BY 1, 2)
    SELECT nb_filter, pct, n_docs_in, n_docs_kept, tok_in, tok_kept,
           ROUND(n_docs_kept / n_docs_in, 6) AS doc_frac,
           ROUND(tok_kept / tok_in, 6) AS tok_frac
    FROM kept JOIN totals USING (nb_filter)
    ORDER BY nb_filter, pct
"""

# filter-order ablation (extensions.pipe_stage_order): BOTH orders of
# the trained funnel in one statement - the filter-first chain is the
# pipe_curation_trained CTE chain verbatim (s1..s4); the dedup-first
# chain (b1..b4) re-runs the same four gates with dedup leading, the
# per-language median recalibrated on ITS lm-stage population (b3).
# The shingle/jaccard near-dup SQL is instantiated once per order over
# that order's survivor set (jaccard is pairwise, so survivor-scoped
# shingles equal full-corpus pairs filtered to survivors).
_ND_SQL = """
    raw_toks{sfx} AS (
      SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
            FROM {src})),
    sh{sfx} AS (
      SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
      FROM (SELECT doc_id, w, i,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
            FROM raw_toks{sfx})
      WHERE nw IS NOT NULL),
    sz{sfx} AS (SELECT id, COUNT(*) AS n FROM sh{sfx} GROUP BY id),
    common{sfx} AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
      FROM sh{sfx} a JOIN sh{sfx} b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2),
    dominated{sfx} AS (
      SELECT DISTINCT id_b AS doc_id
      FROM common{sfx}
      JOIN sz{sfx} sa ON sa.id = id_a
      JOIN sz{sfx} sb ON sb.id = id_b
      WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.8)
"""

_ORD_STAGE = """
    SELECT '{ord}' AS ord, CAST({i} AS BIGINT) AS stage, '{name}' AS name,
           CAST((SELECT COUNT(*) FROM {src_in}) AS BIGINT) AS n_in,
           CAST((SELECT COUNT(*) FROM {src_kept}) AS BIGINT) AS n_kept
"""

EXTENSION_ORACLE["pipe_stage_order"] = (
    f"""
    WITH cls AS ({EXTENSION_ORACLE["text_nb_classify"]}),
    lm AS ({EXTENSION_ORACLE["text_lm_score"]}),
    agree AS (SELECT doc_id, lang FROM cls WHERE pred = lang),
    -- filter-first (the pipe_curation_trained chain)
    s1 AS (SELECT doc_id, lang FROM agree),
    s1lm AS (SELECT s1.doc_id, s1.lang, lm.nll_r
             FROM s1 JOIN lm ON lm.id = s1.doc_id),
    med AS (SELECT lang, ROUND(quantile_cont(nll_r, 0.5), 6) AS med_r
            FROM s1lm GROUP BY lang),
    s2 AS (SELECT doc_id FROM s1lm JOIN med USING (lang)
           WHERE nll_r <= med_r),
    d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN s2 USING (doc_id)),
    reps AS (SELECT MIN(doc_id) AS doc_id FROM d2 GROUP BY md5(LOWER(text))),
    s3 AS (SELECT d2.doc_id, d2.text FROM d2 JOIN reps USING (doc_id)),
"""
    + _ND_SQL.format(sfx="3", src="s3")
    + """,
    s4 AS (
      SELECT doc_id FROM s3
      WHERE doc_id NOT IN (SELECT doc_id FROM dominated3)),
    -- dedup-first (the same gates, dedup leading; median recalibrated
    -- on the b3 population)
    repsb AS (SELECT MIN(doc_id) AS doc_id
              FROM documents GROUP BY md5(LOWER(text))),
    b1 AS (SELECT d.doc_id, d.text FROM documents d JOIN repsb USING (doc_id)),
"""
    + _ND_SQL.format(sfx="B", src="b1")
    + """,
    b2 AS (
      SELECT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM dominatedB)),
    b3 AS (SELECT b2.doc_id, agree.lang
           FROM b2 JOIN agree USING (doc_id)),
    b3lm AS (SELECT b3.doc_id, b3.lang, lm.nll_r
             FROM b3 JOIN lm ON lm.id = b3.doc_id),
    medb AS (SELECT lang, ROUND(quantile_cont(nll_r, 0.5), 6) AS med_r
             FROM b3lm GROUP BY lang),
    b4 AS (SELECT doc_id FROM b3lm JOIN medb USING (lang)
           WHERE nll_r <= med_r)
"""
    + " UNION ALL ".join(
        _ORD_STAGE.format(ord=o, i=i, name=name, src_in=si, src_kept=sk)
        for o, stages in (
            (
                "filter_first",
                [
                    ("nb_lang", "documents", "s1"),
                    ("lm_ppl", "s1", "s2"),
                    ("exact_dedup", "s2", "s3"),
                    ("near_dup", "s3", "s4"),
                ],
            ),
            (
                "dedup_first",
                [
                    ("exact_dedup", "documents", "b1"),
                    ("near_dup", "b1", "b2"),
                    ("nb_lang", "b2", "b3"),
                    ("lm_ppl", "b3", "b4"),
                ],
            ),
        )
        for i, (name, si, sk) in enumerate(stages, 1)
    )
    + "    ORDER BY ord, stage\n"
)

# hashed-feature averaged perceptron (operators/linear.py): the
# LR_STEPS=5 full-batch integer subgradient steps unrolled as chained
# CTEs (the graph_pagerank unrolled-superstep discipline) - every
# quantity BIGINT (counts, weights, scores), so the training replay is
# exact in any engine and any aggregation order. w0 is the empty table;
# step t scores under w(t-1) (missing weight -> 0), predicts by
# (s DESC, lbl ASC) row_number (the engine's strictly-greater ascending
# argmax fold), accumulates the misclassified-doc delta, and w(t) =
# w(t-1) + d(t); the published model is the SUM of w1..w5 (averaged
# perceptron - argmax-equivalent to the average, no division).
# Every step CTE is MATERIALIZED: w{t} references w{t-1} twice (the
# score join and the union), so DuckDB's default CTE INLINING would
# re-expand the chain exponentially (2^5 copies of the step-1 subtree -
# measured as a multi-minute hang); materialization executes each step
# once, which is also exactly the engine's semantics (one bounded
# weight table per step).
_LR_STEP = """
    s{t} AS MATERIALIZED (
      SELECT f.id, f.label, l.lbl,
             CAST(COALESCE(SUM(f.cnt * w.w), 0) AS BIGINT) AS s
      FROM lrfeats f CROSS JOIN lrlabels l
      LEFT JOIN w{p} w ON w.bucket = f.bucket AND w.lbl = l.lbl
      GROUP BY 1, 2, 3),
    p{t} AS MATERIALIZED (
      SELECT id, label, lbl AS pred
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY s DESC, lbl ASC) AS rn
            FROM s{t})
      WHERE rn = 1),
    d{t} AS MATERIALIZED (
      SELECT f.bucket, l.lbl,
             CAST(SUM(f.cnt *
                      (CASE WHEN f.label = l.lbl THEN 1 ELSE 0 END
                       - CASE WHEN p.pred = l.lbl THEN 1 ELSE 0 END))
                  AS BIGINT) AS w
      FROM lrfeats f JOIN p{t} p ON p.id = f.id
      CROSS JOIN lrlabels l
      WHERE p.pred <> p.label
      GROUP BY 1, 2),
    w{t} AS MATERIALIZED (
      SELECT bucket, lbl, CAST(SUM(w) AS BIGINT) AS w
      FROM (SELECT * FROM w{p} UNION ALL SELECT * FROM d{t})
      GROUP BY 1, 2)
"""

_LR_CTES = (
    f"""
    lrtoks AS (
      SELECT doc_id AS id, lang AS label,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS token
      FROM documents WHERE lang IS NOT NULL),
    lrfeats AS MATERIALIZED (
      SELECT id, label,
             {H.format(x="'lr:' || token")} % 512 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lrtoks GROUP BY 1, 2, 3),
    lrlabels AS (SELECT DISTINCT lang AS lbl
                 FROM documents WHERE lang IS NOT NULL),
    w0 AS (SELECT CAST(NULL AS BIGINT) AS bucket,
                  CAST(NULL AS VARCHAR) AS lbl,
                  CAST(NULL AS BIGINT) AS w
           WHERE FALSE),
"""
    + ",".join(_LR_STEP.format(t=t, p=t - 1) for t in range(1, 6))
    + """,
    wavg AS MATERIALIZED (
      SELECT bucket, lbl, CAST(SUM(w) AS BIGINT) AS w
      FROM (SELECT * FROM w1 UNION ALL SELECT * FROM w2
            UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4
            UNION ALL SELECT * FROM w5)
      GROUP BY 1, 2),
    sF AS (
      SELECT f.id, f.label, l.lbl,
             CAST(COALESCE(SUM(f.cnt * w.w), 0) AS BIGINT) AS s
      FROM lrfeats f CROSS JOIN lrlabels l
      LEFT JOIN wavg w ON w.bucket = f.bucket AND w.lbl = l.lbl
      GROUP BY 1, 2, 3),
    lrcls AS MATERIALIZED (
      SELECT id AS doc_id, label AS lang, lbl AS pred, s AS score
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                         ORDER BY s DESC, lbl ASC) AS rn
            FROM sF)
      WHERE rn = 1)
"""
)

# the LR-gated trained funnel (extensions.pipe_curation_lr): the
# pipe_curation_trained chain with lrcls as stage 1 and the per-lang
# median recalibrated on ITS survivors
EXTENSION_ORACLE["pipe_curation_lr"] = (
    f"""
    WITH {_LR_CTES},
    lm AS ({EXTENSION_ORACLE["text_lm_score"]}),
    g1 AS (SELECT doc_id, lang FROM lrcls WHERE pred = lang),
    g1lm AS (SELECT g1.doc_id, g1.lang, lm.nll_r
             FROM g1 JOIN lm ON lm.id = g1.doc_id),
    gmed AS (SELECT lang, ROUND(quantile_cont(nll_r, 0.5), 6) AS med_r
             FROM g1lm GROUP BY lang),
    g2 AS (SELECT doc_id FROM g1lm JOIN gmed USING (lang)
           WHERE nll_r <= med_r),
    gd2 AS (SELECT d.doc_id, d.text FROM documents d JOIN g2 USING (doc_id)),
    greps AS (SELECT MIN(doc_id) AS doc_id FROM gd2 GROUP BY md5(LOWER(text))),
    g3 AS (SELECT gd2.doc_id, gd2.text FROM gd2 JOIN greps USING (doc_id)),
"""
    + _ND_SQL.format(sfx="G", src="g3")
    + """,
    g4 AS (
      SELECT doc_id FROM g3
      WHERE doc_id NOT IN (SELECT doc_id FROM dominatedG))
    SELECT CAST(1 AS BIGINT) AS stage, 'lr_lang' AS name,
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_in,
           CAST((SELECT COUNT(*) FROM g1) AS BIGINT) AS n_kept
    UNION ALL
    SELECT 2, 'lm_ppl',
           CAST((SELECT COUNT(*) FROM g1) AS BIGINT),
           CAST((SELECT COUNT(*) FROM g2) AS BIGINT)
    UNION ALL
    SELECT 3, 'exact_dedup',
           CAST((SELECT COUNT(*) FROM g2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM g3) AS BIGINT)
    UNION ALL
    SELECT 4, 'near_dup',
           CAST((SELECT COUNT(*) FROM g3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM g4) AS BIGINT)
    ORDER BY stage
"""
)

# LR-vs-NB gate agreement (extensions.pipe_lr_agreement): both trained
# classifier CTEs nested, the pipe_classifier_agreement kappa SQL over
# (pred_lr, pred_nb)
EXTENSION_ORACLE["pipe_lr_agreement"] = f"""
    WITH {_LR_CTES},
    cls AS ({EXTENSION_ORACLE["text_nb_classify"]}),
    j AS (SELECT lrcls.doc_id, lrcls.pred AS pred_lr, cls.pred AS pred_nb
          FROM lrcls JOIN cls USING (doc_id)),
    conf AS (SELECT pred_lr, pred_nb, CAST(COUNT(*) AS BIGINT) AS n
             FROM j GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(CASE WHEN pred_lr = pred_nb THEN n ELSE 0 END)
                        AS BIGINT) AS n_agree
            FROM conf),
    rowm AS (SELECT pred_lr AS k, CAST(SUM(n) AS BIGINT) AS rn
             FROM conf GROUP BY 1),
    colm AS (SELECT pred_nb AS k, CAST(SUM(n) AS BIGINT) AS cn
             FROM conf GROUP BY 1),
    pe AS (SELECT CAST(COALESCE(SUM(rn * cn), 0) AS BIGINT) AS pe_num
           FROM rowm JOIN colm USING (k)),
    scal AS (
      SELECT ROUND(CAST(n_agree AS DOUBLE) / nn, 6) AS po_r,
             ROUND(pe_num / (CAST(nn AS DOUBLE) * nn), 6) AS pe_r,
             ROUND((CAST(n_agree AS DOUBLE) / nn
                    - pe_num / (CAST(nn AS DOUBLE) * nn))
                   / (1.0 - pe_num / (CAST(nn AS DOUBLE) * nn)), 6) AS kappa_r
      FROM tot, pe)
    SELECT pred_lr, pred_nb, n, po_r, pe_r, kappa_r
    FROM conf, scal ORDER BY pred_lr, pred_nb
"""

# per-dump MinHash dedup ablation (extensions.pipe_dump_dedup): the
# dedup_minhash_lsh SQL nested verbatim as the pair source; dump =
# doc_id % 5 replayed; per-dump domination is the same pair set
# restricted to same-dump endpoints (a pure predicate - dump is
# id-derived)
EXTENSION_ORACLE["pipe_dump_dedup"] = f"""
    WITH mh AS (SELECT id_a, id_b
                FROM ({EXTENSION_ORACLE["dedup_minhash_lsh"]})),
    domg AS (SELECT DISTINCT id_b AS doc_id FROM mh),
    domd AS (SELECT DISTINCT id_b AS doc_id FROM mh
             WHERE id_a % 5 = id_b % 5),
    d AS (SELECT doc_id, CAST(doc_id % 5 AS INT) AS dump,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents)
    SELECT dump,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN g.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_global,
           CAST(SUM(CASE WHEN p.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_dump,
           CAST(SUM(n_tok) AS BIGINT) AS tok_total,
           CAST(SUM(CASE WHEN g.doc_id IS NULL THEN n_tok ELSE 0 END)
                AS BIGINT) AS tok_kept_global,
           CAST(SUM(CASE WHEN p.doc_id IS NULL THEN n_tok ELSE 0 END)
                AS BIGINT) AS tok_kept_dump,
           ROUND(SUM(CASE WHEN g.doc_id IS NULL THEN n_tok ELSE 0 END)
                 / SUM(n_tok), 6) AS tok_frac_global,
           ROUND(SUM(CASE WHEN p.doc_id IS NULL THEN n_tok ELSE 0 END)
                 / SUM(n_tok), 6) AS tok_frac_dump
    FROM d
    LEFT JOIN domg g ON g.doc_id = d.doc_id
    LEFT JOIN domd p ON p.doc_id = d.doc_id
    GROUP BY dump ORDER BY dump
"""

# chunk-grain ANN with parent-document max-pooling
# (extensions.sim_chunk_ann): the text_chunk window arithmetic gives the
# chunk set, dense ids from a global ROW_NUMBER, the derived chunk
# vectors (parent embedding on the exact m/512 binary grid plus integer
# jitter), then the FULL coarse-k-means + residual-PQ + ADC chain
# reused verbatim (the sim_ann_ivfpq oracle machinery reads the `vecs`
# CTE, which here is the chunk store), candidate cap 20
# (CHUNK_ANN_CAND_K) and doc top-5 (CHUNK_ANN_DOC_TOPK) hard-coded to
# the engine constants. The chain is shared with sim_chunk_ann_recall,
# whose exact leg pools the all-pairs float cosine with the identical
# windows.
_CHUNK_ANN_CTES = f"""t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
      FROM documents),
    ch AS (
      SELECT doc_id, unnest(generate_series(0,
               CASE WHEN len(l) <= 64 THEN 0
                    ELSE CAST(FLOOR((len(l) - 64 + 47) / 48.0) AS INT)
               END)) AS chunk_idx
      FROM t WHERE len(l) > 0),
    cmap AS (
      SELECT ROW_NUMBER() OVER (ORDER BY doc_id, chunk_idx) - 1 AS id,
             doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx
      FROM ch),
    cvecs AS (
      SELECT id, doc_id, chunk_idx,
             list((FLOOR(vx * 512)
                   + ((doc_id * 31 + chunk_idx * 7 + idx - 1) % 17 - 8))
                  / 512.0 ORDER BY idx) AS v
      FROM (SELECT cm.id, cm.doc_id, cm.chunk_idx,
                   unnest(CAST(e.embedding AS DOUBLE[])) AS vx,
                   generate_subscripts(e.embedding, 1) AS idx
            FROM cmap cm JOIN embeddings e ON e.vec_id = cm.doc_id)
      GROUP BY id, doc_id, chunk_idx),
    vecs AS (
      SELECT id, v, sqrt(list_inner_product(v, v)) AS nrm FROM cvecs),
    {_KMEANS_CTES}
    {_IVFPQ_CHAIN},
    pooled AS (
      SELECT r.q_id, qm.doc_id AS q_doc, qm.chunk_idx AS q_chunk_idx,
             cm.doc_id AS cand_doc, cm.chunk_idx AS cand_chunk_idx,
             r.acos_r
      FROM ivfpqranked r
      JOIN cmap cm ON cm.id = r.cand_id
      JOIN cmap qm ON qm.id = r.q_id
      WHERE r.rank <= 20 AND cm.doc_id != qm.doc_id),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, cand_doc
                                   ORDER BY acos_r DESC,
                                            cand_chunk_idx ASC) AS brn
      FROM pooled),
    docranked AS (
      SELECT q_id, q_doc, q_chunk_idx, cand_doc, cand_chunk_idx, acos_r,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY acos_r DESC, cand_doc ASC) AS rank
      FROM best WHERE brn = 1)"""

EXTENSION_ORACLE["sim_chunk_ann"] = f"""
    WITH {_CHUNK_ANN_CTES}
    SELECT q_id, q_doc, q_chunk_idx, cand_doc, cand_chunk_idx, acos_r, rank
    FROM docranked WHERE rank <= 5 ORDER BY q_id, rank
"""

# recall@5 of the chunk-grain IVFPQ parent-doc ranking vs the exact
# float-cosine parent-doc ranking (extensions.sim_chunk_ann_recall):
# the shared chain, an all-pairs exact leg pooled with the IDENTICAL
# windows, and the _recall_vs_exact hit arithmetic at k=5
# sign-LSH geometry census (extensions.sim_lsh_census): the SAME
# hyperplane sign-bucket SQL as dedup_embedding, one UNION ALL branch
# per (geometry, band), exact integer per-bucket C(nb,2) sums - the
# quadratic candidate law measured in-engine, no pair materialized
EXTENSION_ORACLE["sim_lsh_census"] = (
    f"""
    WITH {_VECS},
    cen AS (
"""
    + "\n      UNION ALL\n".join(
        f"""      SELECT {bands} AS bands, {bits} AS band_bits,
             {b} AS band, {_hp_bucket_sql(bits, b * bits)} AS bv
      FROM vecs"""
        for bands, bits in ((8, 8), (4, 16))
        for b in range(bands)
    )
    + """
    ),
    pb AS (
      SELECT bands, band_bits, band, bv, CAST(COUNT(*) AS BIGINT) AS nb
      FROM cen GROUP BY 1, 2, 3, 4)
    SELECT CAST(bands AS BIGINT) AS bands,
           CAST(band_bits AS BIGINT) AS band_bits,
           CAST(SUM(nb) // bands AS BIGINT) AS n_vectors,
           CAST(SUM(nb * (nb - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(MAX(nb) AS BIGINT) AS max_bucket
    FROM pb GROUP BY bands, band_bits ORDER BY band_bits
"""
)

# chunk-grain recall-vs-nprobe sweep (extensions.sim_chunk_probe_sweep):
# ONE shared chunk-ANN chain - coarse assignment, residual codes, and
# every ADC lookup table are nprobe-INDEPENDENT - plus one
# probe-filtered tail per setting. The candidate set at nprobe=k is
# exactly the adc rows whose (unique) cell ranks within the query's k
# nearest centroids, so each tail re-instantiates only probes/qc/adc/
# ranking/pooling with the chain's own SQL, suffix-renamed; the np=2
# tail is the chain's own docranked. The exact leg is
# sim_chunk_ann_recall's, verbatim.
_CHUNK_SWEEP_TAIL = f"""
    probesS{{s}} AS (SELECT id, v, nrm, cid AS cell FROM assign
                   WHERE rn <= {{np}} AND id < 10),
    qcS{{s}} AS (
      SELECT p.id AS q_id, p.cell, p.nrm AS q_nrm,
             ROUND(list_inner_product(p.v, c.cv), 6) AS qc_dot,
             ROUND(list_inner_product(c.cv, c.cv), 6) AS ipcc
      FROM probesS{{s}} p JOIN {_KMEANS_FINAL} c ON p.cell = c.cid),
    adcS{{s}} AS (
      SELECT t.q_id, k.id AS cand_id,
             ROUND((MAX(t.qc_dot) + ({_IVFPQ_PD_SUM}))
                   / (MAX(t.q_nrm)
                      * sqrt(MAX(t.ipcc) + 2 * ({_IVFPQ_CROSS_SUM})
                             + ({_IVFPQ_NSQ_SUM}))), 6) AS acos_r
      FROM cand k
      JOIN qcS{{s}} t ON k.cell = t.cell AND k.id != t.q_id
      JOIN pdt ON pdt.q_id = t.q_id AND pdt.m = k.m AND pdt.code = k.code
      JOIN nsqt ON nsqt.m = k.m AND nsqt.code = k.code
      JOIN crosst ON crosst.cell = k.cell AND crosst.m = k.m
                 AND crosst.code = k.code
      GROUP BY t.q_id, k.id),
    rankedS{{s}} AS (
      SELECT q_id, cand_id, acos_r,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY acos_r DESC, cand_id ASC) AS rank
      FROM adcS{{s}}),
    pooledS{{s}} AS (
      SELECT r.q_id, cm.doc_id AS cand_doc, cm.chunk_idx AS cand_chunk_idx,
             r.acos_r
      FROM rankedS{{s}} r
      JOIN cmap cm ON cm.id = r.cand_id
      JOIN cmap qm ON qm.id = r.q_id
      WHERE r.rank <= 20 AND cm.doc_id != qm.doc_id),
    bestS{{s}} AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, cand_doc
                                   ORDER BY acos_r DESC,
                                            cand_chunk_idx ASC) AS brn
      FROM pooledS{{s}}),
    dockS{{s}} AS (
      SELECT q_id, cand_doc,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY acos_r DESC, cand_doc ASC) AS rank
      FROM bestS{{s}} WHERE brn = 1),
    topS{{s}} AS (SELECT q_id, cand_doc AS cand_id FROM dockS{{s}}
                WHERE rank <= 5)
"""

_CHUNK_SWEEP_STAT = """
    SELECT CAST({np} AS BIGINT) AS nprobe,
           CAST((SELECT COUNT(*) FROM {top}) AS BIGINT) AS n_out,
           CAST((SELECT COUNT(*) FROM {top} t
                 JOIN cexact e ON e.q_id = t.q_id
                              AND e.cand_id = t.cand_id) AS BIGINT) AS n_hit,
           CAST((SELECT COUNT(*) FROM cexact) AS BIGINT) AS n_exact
"""

# For the sweep ONLY, every chain CTE is force-MATERIALIZED (the
# _LR_STEP lesson): three ADC tails each reference cand/pdt/nsqt/crosst,
# and DuckDB's default inlining would re-execute the whole k-means +
# residual-coding chain once per tail - measured as a process-memory
# blow-up at the driver gate's scale. Same values, each stage executed
# once. The shared sim_chunk_ann/recall oracles keep default inlining
# (single tail - no fan-out to amplify).
import re as _re  # noqa: E402

_CHUNK_ANN_CTES_MAT = _re.sub(
    r"(?m)^(\s*)(\w+) AS \(", r"\1\2 AS MATERIALIZED (", _CHUNK_ANN_CTES
)

EXTENSION_ORACLE["sim_chunk_probe_sweep"] = (
    f"""
    WITH {_CHUNK_ANN_CTES_MAT},
    exactsc AS (
      SELECT q.id AS q_id, c.id AS cand_id,
             ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6)
               AS cos_r
      FROM vecs q JOIN vecs c ON c.id != q.id
      WHERE q.id < 10),
    epool AS (
      SELECT e.q_id, cm.doc_id AS cand_doc, cm.chunk_idx AS cand_chunk_idx,
             e.cos_r
      FROM exactsc e
      JOIN cmap cm ON cm.id = e.cand_id
      JOIN cmap qm ON qm.id = e.q_id
      WHERE cm.doc_id != qm.doc_id),
    ebest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, cand_doc
                                   ORDER BY cos_r DESC,
                                            cand_chunk_idx ASC) AS brn
      FROM epool),
    eranked AS (
      SELECT q_id, cand_doc,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_r DESC, cand_doc ASC) AS rank
      FROM ebest WHERE brn = 1),
    cexact AS (SELECT q_id, cand_doc AS cand_id FROM eranked WHERE rank <= 5),
    top2 AS (SELECT q_id, cand_doc AS cand_id FROM docranked WHERE rank <= 5),
"""
    + _CHUNK_SWEEP_TAIL.format(s=1, np=1)
    + ","
    + _CHUNK_SWEEP_TAIL.format(s=4, np=4)
    + ",\n    stats AS ("
    + " UNION ALL ".join(
        _CHUNK_SWEEP_STAT.format(np=np, top=top)
        for np, top in ((1, "topS1"), (2, "top2"), (4, "topS4"))
    )
    + """)
    SELECT nprobe, n_out, n_hit, n_exact,
           ROUND(CAST(n_hit AS DOUBLE) / n_exact, 6) AS recall_r
    FROM stats ORDER BY nprobe
"""
)

EXTENSION_ORACLE["sim_chunk_ann_recall"] = f"""
    WITH {_CHUNK_ANN_CTES},
    exactsc AS (
      SELECT q.id AS q_id, c.id AS cand_id,
             ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6)
               AS cos_r
      FROM vecs q JOIN vecs c ON c.id != q.id
      WHERE q.id < 10),
    epool AS (
      SELECT e.q_id, cm.doc_id AS cand_doc, cm.chunk_idx AS cand_chunk_idx,
             e.cos_r
      FROM exactsc e
      JOIN cmap cm ON cm.id = e.cand_id
      JOIN cmap qm ON qm.id = e.q_id
      WHERE cm.doc_id != qm.doc_id),
    ebest AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id, cand_doc
                                   ORDER BY cos_r DESC,
                                            cand_chunk_idx ASC) AS brn
      FROM epool),
    eranked AS (
      SELECT q_id, cand_doc,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_r DESC, cand_doc ASC) AS rank
      FROM ebest WHERE brn = 1),
    exact AS (SELECT q_id, cand_doc AS cand_id FROM eranked WHERE rank <= 5),
    annd AS (SELECT q_id, cand_doc AS cand_id FROM docranked WHERE rank <= 5),
    hits AS (
      SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM exact e JOIN annd a ON a.q_id = e.q_id AND a.cand_id = e.cand_id
      GROUP BY e.q_id),
    qids AS (SELECT DISTINCT q_id FROM exact)
    SELECT qids.q_id AS q_id,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(n, 0) / 5.0, 6) AS recall_r
    FROM qids LEFT JOIN hits USING (q_id) ORDER BY q_id
"""

# URL/domain filtering (extensions.pipe_url_filter, RefinedWeb stage 0):
# the deterministic URL derivation and all four rules replayed verbatim -
# domain/path-word list indexing, the integer-tenths soft word score,
# the round-6 digit fraction, and the length cap. Shared as a CTE chain
# so pipe_refinedweb / pipe_token_attribution nest it for their stage 1.
_URL_CTES = """
    urlbase AS (
      SELECT doc_id,
             list_extract(['archive-docs.org', 'best-casino-777.com',
               'city-library.net', 'daily-news-site.com',
               'edu-lectures.edu', 'free-prize-claim.net',
               'garden-forum.org', 'home-cooking.net', 'indie-music.com',
               'journal-open.org', 'kids-stories.net',
               'live-webcam-chat.com', 'maps-service.com',
               'news-world.org', 'open-data.gov', 'photo-blog.net'],
               CAST(doc_id % 16 + 1 AS INT)) AS domain,
             list_extract(['article', 'recipes', 'poker', 'travel',
               'music', 'webcam', 'science', 'escort', 'sports',
               'weather', 'history'],
               CAST(doc_id % 11 + 1 AS INT)) AS pword
      FROM documents),
    urlstr AS (
      SELECT doc_id, domain,
             'https://' || domain || '/' || pword || '/item'
             || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 23 = 0
                     THEN '/' || lpad(CAST(doc_id % 1000000000 AS VARCHAR),
                                      18, '7')
                     ELSE '' END
             || CASE WHEN doc_id % 19 = 0
                     THEN '/' || repeat('long-section-name', 4)
                     ELSE '' END AS url
      FROM urlbase),
    urlsc AS (
      SELECT doc_id, url,
             domain IN ('best-casino-777.com', 'free-prize-claim.net',
                        'live-webcam-chat.com') AS f_blocklist,
             CAST(CASE WHEN contains(url, 'escort') THEN 30 ELSE 0 END
                + CASE WHEN contains(url, 'webcam') THEN 25 ELSE 0 END
                + CASE WHEN contains(url, 'poker') THEN 20 ELSE 0 END
                + CASE WHEN contains(url, 'casino') THEN 20 ELSE 0 END
                + CASE WHEN contains(url, 'prize') THEN 15 ELSE 0 END
                AS BIGINT) AS score_tenths,
             ROUND((length(url)
                    - length(regexp_replace(url, '[0-9]', '', 'g')))
                   / length(url), 6) AS digit_frac_r,
             CAST(length(url) AS BIGINT) AS url_len
      FROM urlstr),
    urlkeep AS (
      SELECT doc_id, url, f_blocklist,
             score_tenths >= 20 AS f_words,
             digit_frac_r > 0.2 AS f_digits,
             url_len > 80 AS f_length,
             score_tenths, digit_frac_r, url_len,
             (NOT f_blocklist AND NOT score_tenths >= 20
              AND NOT digit_frac_r > 0.2 AND NOT url_len > 80) AS keep
      FROM urlsc)"""

EXTENSION_ORACLE["pipe_url_filter"] = f"""
    WITH {_URL_CTES.lstrip()}
    SELECT doc_id, url, f_blocklist, f_words, f_digits, f_length,
           score_tenths, digit_frac_r, url_len, keep
    FROM urlkeep
    ORDER BY doc_id
"""

# URL-grain crawl dedup (extensions.pipe_url_dedup): the raw crawl-record
# derivation (group = doc_id // 3, scheme/www/case/tracking/slash variant
# channels, five weekly crawl_ts snapshots) and the canonical_url regex
# chain replayed verbatim (every pattern is RE2-and-Java portable);
# keep-latest per canonical URL as a row_number window where the engine
# uses a groupBy max_by - same (crawl_ts DESC, doc_id DESC) order.
EXTENSION_ORACLE["pipe_url_dedup"] = """
    WITH crawlg AS (
      SELECT doc_id, doc_id // 3 AS g FROM documents),
    crawlparts AS (
      SELECT doc_id, g,
             list_extract(['archive-docs.org', 'best-casino-777.com',
               'city-library.net', 'daily-news-site.com',
               'edu-lectures.edu', 'free-prize-claim.net',
               'garden-forum.org', 'home-cooking.net', 'indie-music.com',
               'journal-open.org', 'kids-stories.net',
               'live-webcam-chat.com', 'maps-service.com',
               'news-world.org', 'open-data.gov', 'photo-blog.net'],
               CAST(g % 16 + 1 AS INT)) AS host,
             list_extract(['article', 'recipes', 'poker', 'travel',
               'music', 'webcam', 'science', 'escort', 'sports',
               'weather', 'history'],
               CAST(g % 11 + 1 AS INT)) AS pword,
             CASE WHEN g % 4 = 0 AND doc_id % 11 = 0
                  THEN '?utm_campaign=crawl&page='
                       || CAST(g % 9 + 1 AS VARCHAR)
                  WHEN g % 4 = 0 AND doc_id % 2 = 1
                  THEN '?page=' || CAST(g % 9 + 1 AS VARCHAR)
                       || '&utm_source=feed'
                  WHEN g % 4 = 0
                  THEN '?page=' || CAST(g % 9 + 1 AS VARCHAR)
                  WHEN doc_id % 2 = 1 THEN '?utm_source=feed'
                  WHEN doc_id % 7 = 0 THEN '?ref=social'
                  ELSE '' END AS qs
      FROM crawlg),
    crawlraw AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://'
                   ELSE 'http://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN upper(host) ELSE host END)
             || '/' || pword || '/page' || CAST(g AS VARCHAR)
             || (CASE WHEN doc_id % 6 = 0 AND qs = '' THEN '/'
                      ELSE '' END)
             || qs AS url,
             CAST(1704067200 + ((doc_id * 7 + 3) % 5) * 604800
                  AS BIGINT) AS crawl_ts
      FROM crawlparts),
    crawlcanon AS (
      SELECT doc_id, crawl_ts,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(lower(url), '#.*$', '', 'g'),
                         '^https?://', '', 'g'),
                       '^www\\.', '', 'g'),
                     '&(?:utm_[a-z]+|ref|fbclid)=[^&#]*', '', 'g'),
                   '\\?(?:utm_[a-z]+|ref|fbclid)=[^&#]*&', '?', 'g'),
                 '\\?(?:utm_[a-z]+|ref|fbclid)=[^&#]*$', '', 'g'),
               '/$', '', 'g') AS canon_url
      FROM crawlraw),
    crawlranked AS (
      SELECT canon_url, doc_id, crawl_ts,
             ROW_NUMBER() OVER (PARTITION BY canon_url
                                ORDER BY crawl_ts DESC, doc_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY canon_url) AS n_crawls
      FROM crawlcanon)
    SELECT canon_url,
           CAST(n_crawls AS BIGINT) AS n_crawls,
           doc_id AS kept_doc_id,
           crawl_ts AS kept_crawl_ts
    FROM crawlranked WHERE rn = 1
    ORDER BY canon_url
"""

# the RefinedWeb-shape heuristic funnel (extensions.pipe_refinedweb):
# every stage runs over the ONE derived stopword-lined corpus (the
# _lined_docs stopwords=True arithmetic, replayed in the `lined` CTE)
# gated by the derived-URL stage-0 pass (the _URL_CTES chain verbatim);
# the text_langid and text_gopher_rules oracles are nested verbatim
# with their source rebound onto it (a nested WITH may read an outer
# CTE), the C4 rule arithmetic is inlined over the same text, dedup is
# at the C4 cleaned grain, and the near-dup stage is
# pipe_curation_trained's pair SQL over the derived text
EXTENSION_ORACLE["pipe_refinedweb"] = f"""
    WITH raw AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents),
    lined AS (
      SELECT doc_id, lang,
             array_to_string(list_transform(
               generate_series(0, CAST(ceil(len(toks) / 10.0) AS INT) - 1),
               i -> list_extract(['the', 'be', 'to', 'of', 'and', 'that',
                                  'have', 'with'],
                                 CAST((len(toks) + i) % 8 + 1 AS INT))
                    || ' '
                    || array_to_string(list_slice(toks, i*10 + 1, i*10 + 10), ' ')
                    || CASE WHEN (len(toks) + i) % 3 <> 2 THEN '.' ELSE '' END),
               ' ' || chr(10) || ' ')
             || CASE WHEN doc_id % 97 = 0
                     THEN chr(10) || 'config block follows here {{'
                     ELSE '' END
             || CASE WHEN doc_id % 89 = 0
                     THEN chr(10) || 'lorem ipsum filler text here.'
                     ELSE '' END AS text
      FROM raw WHERE len(toks) > 0),{_URL_CTES},
    s0 AS (SELECT l.doc_id FROM lined l
           JOIN urlkeep u USING (doc_id) WHERE u.keep),
    lid AS ({EXTENSION_ORACLE["text_langid"].replace("FROM documents", "FROM lined")}),
    s1 AS (SELECT d.doc_id FROM lined d
           JOIN lid USING (doc_id) WHERE lid.pred_lang = d.lang
             AND d.doc_id IN (SELECT doc_id FROM s0)),
    gop AS ({EXTENSION_ORACLE["text_gopher_rules"].replace("FROM documents", "FROM lined")}),
    s2 AS (SELECT doc_id FROM s1 JOIN gop USING (doc_id) WHERE gop.keep),
    c4t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)), x -> trim(x, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)) <> '') AS lines,
             contains(text, '{{') AS has_brace,
             contains(lower(text), 'lorem ipsum') AS has_lorem
      FROM lined),
    c4k AS (
      SELECT doc_id, has_brace, has_lorem,
             COALESCE(array_to_string(list_filter(lines, l ->
                right(rtrim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), 1) IN ('.', '!', '?', '"')
                AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
                AND NOT contains(lower(l), 'javascript')), chr(10)), '')
               AS cleaned
      FROM c4t WHERE len(lines) > 0),
    c4 AS (
      SELECT doc_id,
             ((length(cleaned) - length(replace(cleaned, '.', ''))
               + length(cleaned) - length(replace(cleaned, '!', ''))
               + length(cleaned) - length(replace(cleaned, '?', ''))) >= 3
              AND NOT has_brace AND NOT has_lorem) AS keep,
             md5(cleaned) AS cleaned_md5
      FROM c4k),
    s3 AS (SELECT c4.doc_id, c4.cleaned_md5
           FROM s2 JOIN c4 USING (doc_id) WHERE c4.keep),
    s4 AS (SELECT MIN(doc_id) AS doc_id FROM s3 GROUP BY cleaned_md5),
    d4 AS (SELECT d.doc_id, d.text FROM documents d JOIN s4 USING (doc_id)),
    raw_toks4 AS (
      SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
            FROM d4)),
    sh4 AS (
      SELECT DISTINCT doc_id AS id, w || ' ' || nw AS s
      FROM (SELECT doc_id, w, i,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS nw
            FROM raw_toks4)
      WHERE nw IS NOT NULL),
    sz4 AS (SELECT id, COUNT(*) AS n FROM sh4 GROUP BY id),
    common4 AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
      FROM sh4 a JOIN sh4 b ON a.s = b.s AND a.id < b.id
      GROUP BY 1, 2),
    dominated AS (
      SELECT DISTINCT id_b AS doc_id
      FROM common4
      JOIN sz4 sa ON sa.id = id_a
      JOIN sz4 sb ON sb.id = id_b
      WHERE ROUND(c / (sa.n + sb.n - c), 6) >= 0.8),
    s5 AS (
      SELECT doc_id FROM s4
      WHERE doc_id NOT IN (SELECT doc_id FROM dominated))
    SELECT CAST(1 AS BIGINT) AS stage, 'url_filter' AS name,
           CAST((SELECT COUNT(*) FROM lined) AS BIGINT) AS n_in,
           CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_kept
    UNION ALL
    SELECT 2, 'lang_id',
           CAST((SELECT COUNT(*) FROM s0) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT 3, 'gopher',
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 4, 'c4',
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    UNION ALL
    SELECT 5, 'exact_cleaned',
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s4) AS BIGINT)
    UNION ALL
    SELECT 6, 'near_dup',
           CAST((SELECT COUNT(*) FROM s4) AS BIGINT),
           CAST((SELECT COUNT(*) FROM s5) AS BIGINT)
    ORDER BY stage
"""

# token-weighted funnel report (extensions.pipe_token_attribution):
# the pipe_refinedweb CTE chain verbatim (string-reused up to its stage
# selects), one narrow (doc_id, n_tok) raw-budget CTE, and per-stage
# scalar token sums with the engine's guarded round-6 kept fraction
_RW_CTES = EXTENSION_ORACLE["pipe_refinedweb"].split(
    "SELECT CAST(1 AS BIGINT) AS stage"
)[0].rstrip()

# (the kept_frac alias cannot laterally reference subquery aliases in
# DuckDB, so each stage row computes the sums in an inner select)
_TOK_STAGE = """
    SELECT stage, name, tok_in, tok_kept,
           CASE WHEN tok_in > 0 THEN ROUND(tok_kept / tok_in, 6) END
               AS kept_frac
    FROM (SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS name,
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT)
                  FROM ntok JOIN {src_in} USING (doc_id)) AS tok_in,
                 (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT)
                  FROM ntok JOIN {src_kept} USING (doc_id)) AS tok_kept)
"""

EXTENSION_ORACLE["pipe_token_attribution"] = (
    _RW_CTES
    + """,
    ntok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents)
"""
    + " UNION ALL ".join(
        _TOK_STAGE.format(i=i, name=name, src_in=si, src_kept=sk)
        for i, (name, si, sk) in enumerate(
            [
                ("url_filter", "lined", "s0"),
                ("lang_id", "s0", "s1"),
                ("gopher", "s1", "s2"),
                ("c4", "s2", "s3"),
                ("exact_cleaned", "s3", "s4"),
                ("near_dup", "s4", "s5"),
            ],
            start=1,
        )
    )
    + "    ORDER BY stage\n"
)

# CCNet perplexity terciles (extensions.text_ppl_buckets): the
# text_lm_score CTE verbatim (full-corpus LM), exact NEAREST-RANK
# tercile cuts per language (ranks ceil(n/3) and ceil(2n/3), ties by
# doc_id - no interpolation, so no float-op-order surface), buckets
# compared on the shared round-6 values
EXTENSION_ORACLE["text_ppl_buckets"] = f"""
    WITH lm AS ({EXTENSION_ORACLE["text_lm_score"]}),
    d AS (SELECT doc.doc_id, doc.lang, lm.nll_r
          FROM documents doc JOIN lm ON lm.id = doc.doc_id
          WHERE doc.lang IS NOT NULL),
    r AS (SELECT lang, nll_r,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY nll_r, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM d),
    cuts AS (SELECT lang, MIN(nll_r) AS c1, MAX(nll_r) AS c2
             FROM r
             WHERE rn = CAST(ceil(n / 3.0) AS BIGINT)
                OR rn = CAST(ceil(2 * n / 3.0) AS BIGINT)
             GROUP BY lang)
    SELECT d.doc_id, d.lang, d.nll_r, c.c1, c.c2,
           CASE WHEN d.nll_r <= c.c1 THEN 'head'
                WHEN d.nll_r <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM d JOIN cuts c USING (lang)
    ORDER BY d.doc_id
"""


# recall-per-method comparison (extensions.sim_ann_compare): ONE exact
# top-k CTE shared by all three approximate rankings - the same LSH / PQ /
# IVFPQ chains as the retired per-method recall oracles, combined. The
# IVFPQ chain's internal `adc` CTE is word-renamed to avoid colliding with
# the plain-PQ chain's `adc` in a single WITH clause.
import re as _re  # noqa: E402

_IVFPQ_CHAIN_RENAMED = _re.sub(r"\badc\b", "iadc", _IVFPQ_CHAIN)

EXTENSION_ORACLE["sim_ann_compare"] = f"""
        WITH {_VECS},
        {_PQ_CTES}
        {_PQ_RANKED},
        {_KMEANS_CTES}
        {_IVFPQ_CHAIN_RENAMED},
        fcents AS (SELECT id AS cid, v AS cv, nrm AS cnrm FROM vecs
                   WHERE id < 8),
        fassign AS (
          SELECT id, v, nrm, cid,
                 ROW_NUMBER() OVER (
                   PARTITION BY id
                   ORDER BY ROUND(list_inner_product(v, cv) / (nrm * cnrm), 6)
                              DESC, cid ASC) AS rn
          FROM vecs, fcents),
        fcells AS (SELECT id, v, nrm, cid AS cell FROM fassign WHERE rn = 1),
        fprobes AS (SELECT id, v, nrm, cid AS cell FROM fassign
                    WHERE rn <= 2 AND id < 10),
        fivfann AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM fprobes q JOIN fcells c ON q.cell = c.cell AND c.id != q.id)
          WHERE rank <= 3),
        lshb AS (
          SELECT id, v, nrm, {_hp_bucket_sql(4)} AS bkt
          FROM vecs),
        lshann AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM lshb q JOIN lshb c ON q.bkt = c.bkt AND c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        exact AS (
          SELECT q_id, cand_id FROM (
            SELECT q.id AS q_id, c.id AS cand_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY q.id
                     ORDER BY ROUND(list_inner_product(q.v, c.v)
                                    / (q.nrm * c.nrm), 6) DESC, c.id ASC) AS rank
            FROM vecs q JOIN vecs c ON c.id != q.id
            WHERE q.id < 10)
          WHERE rank <= 3),
        allann AS (
          SELECT 'ivf' AS method, q_id, cand_id FROM fivfann
          UNION ALL
          SELECT 'lsh' AS method, q_id, cand_id FROM lshann
          UNION ALL
          SELECT 'pq' AS method, q_id, cand_id FROM pqranked WHERE rank <= 3
          UNION ALL
          SELECT 'ivfpq' AS method, q_id, cand_id FROM ivfpqranked
          WHERE rank <= 3),
        hits AS (
          SELECT a.method, e.q_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM exact e JOIN allann a ON a.q_id = e.q_id
                                    AND a.cand_id = e.cand_id
          GROUP BY a.method, e.q_id),
        grid AS (
          SELECT m.method, q.q_id
          FROM (SELECT DISTINCT q_id FROM exact) q,
               (VALUES ('ivf'), ('ivfpq'), ('lsh'), ('pq')) m(method))
        SELECT grid.method AS method, grid.q_id AS q_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(n, 0) / 3.0, 6) AS recall_r
        FROM grid LEFT JOIN hits ON hits.method = grid.method
                                AND hits.q_id = grid.q_id
        ORDER BY method, q_id
    """

# retired from the battery in r9 (VERDICT r8 #7) - sim_ann_compare covers
# all three against one shared exact baseline
for _retired in ("sim_ann_recall", "sim_pq_recall", "sim_ivfpq_recall"):
    EXTENSION_ORACLE.pop(_retired, None)

# append-mode sessionization (extensions.stream_sessions_evict): the same
# gaps-and-islands sessions, restricted to those the final watermark has
# closed - end <= ms-truncated max event time minus the 1 h delay (Spark
# tracks watermarks in ms; emission predicate pinned empirically at two
# scale factors). The filter wraps the SESSIONIZED result: filtering the
# Spark session aggregation directly on w.end is unsound (Catalyst pushes
# the predicate below the session merge), which is why the engine side
# witnesses the filter through the streaming runtime instead.
EXTENSION_ORACLE["stream_sessions_evict"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        wm AS (
          SELECT CAST(FLOOR(MAX(t) / 1000) AS BIGINT) * 1000
                 - 3600000000 AS w
          FROM e),
        m AS (
          SELECT user_id, t, value,
                 CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                        OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                           >= 21600000000
                      THEN 1 ELSE 0 END AS ns
          FROM e),
        i AS (
          SELECT user_id, t, value,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM m),
        s AS (
          SELECT user_id,
                 CAST(MIN(t) AS BIGINT) AS start_us,
                 CAST(MAX(t) + 21600000000 AS BIGINT) AS end_us,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 ROUND(SUM(value), 6) AS sum_v
          FROM i GROUP BY user_id, sid)
        SELECT user_id, start_us, end_us, n_events, sum_v
        FROM s WHERE end_us <= (SELECT w FROM wm)
        ORDER BY user_id, start_us
    """

# bucketed-layout witness (extensions.scale_bucketed): values from first
# principles over the events-derived datapoint stream; n_exchanges and
# salted_mismatch are hard-coded 0 - the Spark side derives them from its
# own executed plan / salted-vs-plain comparison, so a shuffle appearing
# in the bucketed pipeline (or a salted-agg divergence) flips the value
# hash on the driver's run.
EXTENSION_ORACLE["scale_bucketed"] = """
        WITH dp AS (
          SELECT user_id AS att_conf_id,
                 CASE WHEN event_type <> 'error' THEN value END AS value_r
          FROM events),
        pa AS (
          SELECT att_conf_id,
                 CAST(COUNT(value_r) AS BIGINT) AS n_points,
                 ROUND(SUM(value_r) / COUNT(value_r), 6) AS mean_r
          FROM dp GROUP BY att_conf_id),
        ab AS (
          SELECT d.att_conf_id, CAST(COUNT(*) AS BIGINT) AS n_above_mean
          FROM dp d JOIN pa ON pa.att_conf_id = d.att_conf_id
          WHERE d.value_r > pa.mean_r
          GROUP BY d.att_conf_id)
        SELECT pa.att_conf_id AS att_conf_id, n_points, mean_r,
               CAST(COALESCE(n_above_mean, 0) AS BIGINT) AS n_above_mean,
               CAST(0 AS INTEGER) AS n_exchanges,
               CAST(0 AS INTEGER) AS salted_mismatch
        FROM pa LEFT JOIN ab ON ab.att_conf_id = pa.att_conf_id
        ORDER BY att_conf_id
    """

# compaction witness (extensions.scale_compact): per-stage file counts
# from row-count arithmetic alone - LEAST(64, n) round-robin fragments,
# CEIL(n / 4096) range-compacted files - so the Spark side's ON-DISK
# counts must equal the planned layout; the three booleans are hard-coded
# true (disk-vs-arithmetic match, event_id checksum round-trip, zero
# overlapping file ranges after compaction), each derived independently
# on the Spark side so any layout/loss/clustering defect flips the hash.
# Z-order layout witness (extensions.scale_zorder / operators/zorder.py):
# the oracle replays the identical deterministic bit algebra - floor
# scaling to 8-bit grids, the unrolled Morton interleave below, top-6-bit
# buckets - and pins every envelope prune count for both layouts and both
# probe dims; files_ok / checksum_ok certify the physical write the
# oracle cannot see and are hard-coded true.
def _morton_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


EXTENSION_ORACLE["scale_zorder"] = f"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        st AS (
          SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
                 MIN(day) AS dmin, MAX(day) AS dmax FROM ev),
        sc AS (
          SELECT user_id, day,
                 CAST(FLOOR((user_id - umin) * 256.0 / (umax - umin + 1)) AS BIGINT) AS au,
                 CAST(FLOOR((day - dmin) * 256.0 / (dmax - dmin + 1)) AS BIGINT) AS ad
          FROM ev CROSS JOIN st),
        laid AS (
          SELECT user_id, day,
                 ({_morton_sql('au', 'ad')}) >> 10 AS zb,
                 au >> 2 AS sb
          FROM sc),
        pe AS (
          SELECT umin + (umax - umin) // 2 AS up,
                 dmin + (dmax - dmin) // 2 AS dp FROM st),
        ez AS (
          SELECT zb, MIN(user_id) AS mu, MAX(user_id) AS xu,
                 MIN(day) AS md, MAX(day) AS xd FROM laid GROUP BY zb),
        es AS (
          SELECT sb, MIN(user_id) AS mu, MAX(user_id) AS xu,
                 MIN(day) AS md, MAX(day) AS xd FROM laid GROUP BY sb)
        SELECT * FROM (
          SELECT 'zorder' AS layout, 'user_id' AS probe_dim,
                 (SELECT COUNT(*) FROM ez) AS n_buckets,
                 (SELECT COUNT(*) FROM ez, pe WHERE mu <= up AND up <= xu)
                   AS n_touched,
                 true AS files_ok, true AS checksum_ok
          UNION ALL
          SELECT 'zorder', 'day', (SELECT COUNT(*) FROM ez),
                 (SELECT COUNT(*) FROM ez, pe WHERE md <= dp AND dp <= xd),
                 true, true
          UNION ALL
          SELECT 'rangesort', 'user_id', (SELECT COUNT(*) FROM es),
                 (SELECT COUNT(*) FROM es, pe WHERE mu <= up AND up <= xu),
                 true, true
          UNION ALL
          SELECT 'rangesort', 'day', (SELECT COUNT(*) FROM es),
                 (SELECT COUNT(*) FROM es, pe WHERE md <= dp AND dp <= xd),
                 true, true)
        ORDER BY layout, probe_dim
    """

EXTENSION_ORACLE["scale_compact"] = """
        WITH n AS (SELECT COUNT(*) AS c FROM events)
        SELECT * FROM (
          SELECT 'compacted' AS stage,
                 CAST(CEIL(c / 4096.0) AS BIGINT) AS n_files,
                 CAST(c AS BIGINT) AS n_rows,
                 true AS files_ok, true AS checksum_ok, true AS clustered_ok
          FROM n
          UNION ALL
          SELECT 'fragmented', CAST(LEAST(64, c) AS BIGINT), CAST(c AS BIGINT),
                 true, true, true
          FROM n)
        ORDER BY stage
    """

# sketch distinct-count witness (extensions.events_distinct_approx): exact
# per-group cardinalities from first principles; hll_ok / merge_ok are
# hard-coded true - the Spark side derives them from its own HLL estimates
# (accuracy bound + partial-sketch union invariance), so a sketch outside
# its error contract or a non-merge-invariant estimate flips the hash.
EXTENSION_ORACLE["events_distinct_approx"] = """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               true AS hll_ok, true AS merge_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """

# distributed PCA (extensions.sim_pca_gram / operators/pca.py): the
# oracle replays the identical integer pipeline - round(v*1e9) int64
# quantization, DECIMAL(38,0) moment sums (exact, order-free), then the
# covariance-from-moments double expression on identical inputs
_PCA_CO = """
          SELECT vec_id AS id, i,
                 CAST(ROUND(v * 1000000000, 0) AS BIGINT) AS q
          FROM (SELECT vec_id,
                       unnest(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE))) AS v,
                       unnest(generate_series(0, len(embedding) - 1)) AS i
                FROM embeddings)"""

EXTENSION_ORACLE["sim_pca_gram"] = f"""
        WITH co AS ({_PCA_CO}),
        f AS (SELECT i, SUM(CAST(q AS DECIMAL(38,0))) AS s, COUNT(*) AS n
              FROM co GROUP BY i),
        sec AS (
          SELECT i, j,
                 SUM(p // 67108864) AS s_hi,
                 SUM(p % 67108864) AS s_lo
          FROM (SELECT a.i AS i, b.i AS j, a.q * b.q AS p
                FROM co a JOIN co b ON a.id = b.id AND a.i <= b.i)
          GROUP BY i, j),
        nv AS (SELECT MAX(n) AS nv FROM f)
        SELECT sec.i, sec.j,
               -- + 0.0 canonicalizes signed zero to +0.0 (IEEE), matching
               -- the engine side; see operators/pca.py covariance_df
               ROUND((CAST(s_hi AS DOUBLE) * 67108864.0
                      + CAST(s_lo AS DOUBLE)
                      - CAST(fi.s AS DOUBLE) * CAST(fj.s AS DOUBLE) / nv)
                     / (nv * 1.0e18), 6) + 0.0 AS cov_r
        FROM sec
        JOIN f fi ON fi.i = sec.i
        JOIN f fj ON fj.i = sec.j
        CROSS JOIN nv
        ORDER BY sec.i, sec.j
    """

# PCA eigen facts (extensions.sim_pca): n_vectors and the moment-exact
# trace replayed in SQL; the four eigensolve/projection contracts are
# hard-coded true - each is derived independently on the Spark side
# (numpy residual/orthogonality, a distributed projection-variance
# pass), so a defect flips the hash
EXTENSION_ORACLE["sim_pca"] = f"""
        WITH co AS ({_PCA_CO}),
        f AS (SELECT i, SUM(CAST(q AS DECIMAL(38,0))) AS s, COUNT(*) AS n
              FROM co GROUP BY i),
        d AS (SELECT i,
                     CAST(SUM(q * q // 67108864) AS DECIMAL(38,0)) * 67108864
                       + SUM(q * q % 67108864) AS s
              FROM co GROUP BY i),
        nv AS (SELECT MAX(n) AS nv FROM f),
        tr AS (
          SELECT ROUND(CAST(SUM(d.s * nv - f.s * f.s) AS DOUBLE)
                       / (MAX(nv) * MAX(nv) * 1.0e18), 6) AS trace_r,
                 MAX(nv) AS nv
          FROM d JOIN f ON f.i = d.i CROSS JOIN nv)
        SELECT comp, CAST(nv AS BIGINT) AS n_vectors, trace_r,
               true AS resid_ok, true AS var_ok,
               true AS ortho_ok, true AS ordered_ok
        FROM tr CROSS JOIN (SELECT unnest([1, 2, 3]) AS comp)
        ORDER BY comp
    """

# CMS heavy hitters (extensions.events_heavy_hitters): exact top-10
# (user:event) keys with deterministic (n desc, key asc) ties; the three
# sketch contracts hard-coded true - the Spark side derives them from
# its own CountMinSketch probes, so an accuracy or mergeability
# violation flips the hash
EXTENSION_ORACLE["events_heavy_hitters"] = """
        WITH c AS (
          SELECT user_id || ':' || event_type AS key, COUNT(*) AS n
          FROM events GROUP BY 1),
        r AS (
          SELECT key, n,
                 CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rk
          FROM c)
        SELECT rk, key, CAST(n AS BIGINT) AS n_exact,
               true AS cms_ge_exact, true AS cms_within_eps,
               true AS merge_exact
        FROM r WHERE rk <= 10 ORDER BY rk
    """

# JSON metadata extraction (extensions.events_props_parse): same field via
# DuckDB's JSON path functions; paths_agree hard-coded true - the Spark
# side derives it from its own from_json vs get_json_object null-safe
# comparison, so a parser-path divergence (incl. malformed-row handling)
# flips the hash.
EXTENSION_ORACLE["events_props_parse"] = """
        SELECT event_id, event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k,
               true AS paths_agree
        FROM events ORDER BY event_id
    """

# dataset card (extensions.pipe_stats): the text_quality per-doc score
# re-derived, then rolled up per (lang, source); mean is ROUND(SUM/COUNT, 6)
# - the scale_bucketed mean_r discipline
EXTENSION_ORACLE["pipe_stats"] = """
        WITH t AS (
          SELECT doc_id, lang, source, length(text) AS n_chars,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang, source, n_chars,
                 len(toks) AS n,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM t),
        q AS (
          SELECT lang, source, n_chars, n,
                 ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                       + 0.3 * (n_dist / n), 6) AS quality
          FROM f)
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n) AS BIGINT) AS sum_tokens,
               CAST(MIN(n) AS BIGINT) AS min_tokens,
               CAST(MAX(n) AS BIGINT) AS max_tokens,
               ROUND(SUM(quality) / COUNT(*), 6) AS mean_quality
        FROM q GROUP BY lang, source ORDER BY lang, source
    """

# PMI collocations (extensions.text_collocations / textquality.collocations):
# same tokenizer as text_quality, subscript-indexed adjacent pairs, exact
# integer counts, and the PMI algebra in the same association order -
# (c12/B) / ((c1/N) * (c2/N)) - so the round-6 ln agrees
EXTENSION_ORACLE["text_collocations"] = """
        WITH t AS (
          SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        uni AS (SELECT unnest(toks) AS w FROM t),
        n AS (SELECT COUNT(*) AS nt FROM uni),
        uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        bi AS (
          SELECT toks[i] AS w1, toks[i + 1] AS w2
          FROM (SELECT toks, generate_subscripts(toks, 1) AS i FROM t)
          WHERE i < len(toks)),
        b AS (SELECT COUNT(*) AS bt FROM bi),
        bc AS (
          SELECT w1, w2, COUNT(*) AS c12 FROM bi
          GROUP BY w1, w2 HAVING COUNT(*) >= 5)
        SELECT bc.w1, bc.w2, CAST(bc.c12 AS BIGINT) AS c12,
               ROUND(ln((CAST(bc.c12 AS DOUBLE) / bt)
                        / ((CAST(ua.c AS DOUBLE) / nt)
                           * (CAST(ub.c AS DOUBLE) / nt))), 6) AS pmi_r
        FROM bc
        JOIN uc ua ON ua.w = bc.w1
        JOIN uc ub ON ub.w = bc.w2
        CROSS JOIN n CROSS JOIN b
        ORDER BY pmi_r DESC, w1, w2 LIMIT 50
    """

# temperature rebalancing (extensions.pipe_temperature_mix /
# sampling.temperature_rebalance, alpha=0.5): keep_bp =
# ROUND(10000 * sqrt(n_min / n_d)) - every step IEEE correctly rounded -
# and kept counts from the same md5 bucket rule as pipe_domain_mix
EXTENSION_ORACLE["pipe_temperature_mix"] = f"""
        WITH d AS (
          SELECT doc_id, lang || '/' || source AS domain FROM documents),
        c AS (SELECT domain, COUNT(*) AS n_total FROM d GROUP BY domain),
        m AS (SELECT MIN(n_total) AS n_min FROM c),
        th AS (
          SELECT domain, n_total,
                 CAST(ROUND(10000 * sqrt(CAST(n_min AS DOUBLE) / n_total))
                      AS INT) AS keep_bp
          FROM c, m),
        k AS (
          SELECT d.domain, COUNT(*) AS n_kept
          FROM d JOIN th ON th.domain = d.domain
          WHERE {H.format(x="'temper:' || CAST(doc_id AS VARCHAR)")} % 10000
                < th.keep_bp
          GROUP BY d.domain)
        SELECT th.domain, CAST(th.n_total AS BIGINT) AS n_total, th.keep_bp,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM th LEFT JOIN k ON k.domain = th.domain
        ORDER BY th.domain
    """

# curriculum tiers (extensions.pipe_curriculum / rank.quantile_tiers):
# the text_quality score, globally ranked by (quality, doc_id) - the
# oracle's ROW_NUMBER equals the engine's distributed range-partitioned
# rank because the order is total - then tier = floor((rank-1)*4/n) + 1
EXTENSION_ORACLE["pipe_curriculum"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, len(toks) AS n,
                 len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM t),
        q AS (
          SELECT doc_id,
                 ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                       + 0.3 * (n_dist / n), 6) AS quality
          FROM f),
        r AS (
          SELECT doc_id, quality,
                 CAST(ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS BIGINT)
                   AS rank,
                 COUNT(*) OVER () AS n
          FROM q)
        SELECT doc_id, quality, rank,
               CAST(FLOOR((rank - 1) * 4 / CAST(n AS DOUBLE)) + 1 AS BIGINT)
                 AS tier
        FROM r ORDER BY doc_id
    """

# duplicated-span accounting (extensions.dedup_spans / dedup.span_dedup):
# same non-overlapping 8-token windows; first occurrence by (doc_id,
# window index) via ROW_NUMBER over the window's 60-BIT MD5 HASH - the
# SAME key the engine partitions on (the dedup_substr/dedup_winnow rule:
# hashing both sides keeps the engines on the identical criterion, so a
# 60-bit collision marks the same span duplicated in both rather than
# flipping parity); within-doc repeats count as duplicates
EXTENSION_ORACLE["dedup_spans"] = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents),
        s AS (
          SELECT doc_id, i AS w,
                 {H.format(
                     x="array_to_string(list_slice(l, i * 8 + 1, i * 8 + 8), ' ')"
                 )} AS h
          FROM (SELECT doc_id, l,
                       unnest(generate_series(0, CAST(len(l) // 8 AS INT) - 1)) AS i
                FROM t WHERE len(l) >= 8)),
        r AS (
          SELECT doc_id, w,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, w) AS rk
          FROM s)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               ROUND(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END)
                     / COUNT(*), 6) AS dup_frac_r
        FROM r GROUP BY doc_id ORDER BY doc_id
    """

# exact substring-level dedup (extensions.dedup_substr /
# dedup.repeated_substrings): identical overlapping 12-token windows
# (stride 1), duplicated iff the window's 60-bit md5 hash occurs >= 2
# times anywhere (the SAME hash the engine counts - hashing both sides
# keeps the two engines on the identical criterion, so a 60-bit
# collision marks the same window duplicated in both rather than
# flipping parity; the dedup_winnow oracle already follows this rule),
# gaps-and-islands merge of positions within step <= 12, per-doc
# coverage stats; DISTINCT-free - every occurrence row participates
EXTENSION_ORACLE["dedup_substr"] = f"""
        WITH t AS (
          SELECT doc_id AS id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents),
        tt AS (SELECT id, l, len(l) AS n FROM t WHERE len(l) >= 12),
        wins AS (
          SELECT id, i - 1 AS p,
                 {H.format(x="array_to_string(list_slice(l, i, i + 11), ' ')")}
                   AS h
          FROM (SELECT id, l, unnest(generate_series(1, n - 11)) AS i
                FROM tt)),
        cnt AS (SELECT h, COUNT(*) AS c FROM wins GROUP BY h),
        dup AS (
          SELECT w.id, w.p FROM wins w
          JOIN cnt ON cnt.h = w.h AND cnt.c >= 2),
        lagged AS (
          SELECT id, p, lag(p) OVER (PARTITION BY id ORDER BY p) AS pp
          FROM dup),
        isl AS (
          SELECT id, p,
                 SUM(CASE WHEN p - COALESCE(pp, p - 13) > 12
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY id ORDER BY p
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
          FROM lagged),
        runs AS (
          SELECT id, run_id, MAX(p) - MIN(p) + 12 AS run_tokens
          FROM isl GROUP BY id, run_id),
        per AS (
          SELECT id, COUNT(*) AS n_runs, SUM(run_tokens) AS dup_tokens,
                 MAX(run_tokens) AS longest_run
          FROM runs GROUP BY id)
        SELECT tt.id AS doc_id,
               CAST(tt.n AS BIGINT) AS n_tokens,
               CAST(COALESCE(n_runs, 0) AS BIGINT) AS n_runs,
               CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(COALESCE(longest_run, 0) AS BIGINT) AS longest_run,
               ROUND(COALESCE(dup_tokens, 0) / CAST(tt.n AS DOUBLE), 6)
                 AS dup_frac_r
        FROM tt LEFT JOIN per ON per.id = tt.id
        ORDER BY doc_id
    """

# asymmetric containment dedup (extensions.dedup_containment /
# dedup.containment_pairs): naive inverted-index form - all pairs sharing
# a shingle, containment = common / min(|A|, |B|) - so parity checks the
# algorithm against the prefix-filtered engine plan
EXTENSION_ORACLE["dedup_containment"] = f"""
        WITH {_SHINGLES},
        csz AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
        ccommon AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               ROUND(c / LEAST(sa.n, sb.n), 6) AS cont_r
        FROM ccommon
        JOIN csz sa ON sa.id = id_a
        JOIN csz sb ON sb.id = id_b
        WHERE ROUND(c / LEAST(sa.n, sb.n), 6) >= 0.6
        ORDER BY id_a, id_b
    """

# per-user 3-sigma outlier audit (extensions.events_anomaly): moments
# rounded at the aggregation boundary, then identical double arithmetic
# for mean/sd/flags in both engines
EXTENSION_ORACLE["events_anomaly"] = """
        WITH ev AS (
          SELECT user_id, value FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)),
        mom AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(SUM(value), 6) AS s1,
                 ROUND(SUM(value * value), 6) AS s2
          FROM ev GROUP BY user_id
          HAVING COUNT(*) >= 2),
        st AS (
          SELECT user_id, n,
                 ROUND(s1 / n, 6) AS mean_r,
                 ROUND(sqrt(GREATEST((s2 - s1 * s1 / n) / (n - 1), 0.0)), 6)
                   AS sd_r
          FROM mom)
        SELECT st.user_id, st.n, st.mean_r, st.sd_r,
               CAST(SUM(CASE WHEN ABS(ev.value - st.mean_r) > 3.0 * st.sd_r
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM ev JOIN st ON st.user_id = ev.user_id
        GROUP BY st.user_id, st.n, st.mean_r, st.sd_r
        ORDER BY st.user_id
    """

# per-document TF-IDF keywords (extensions.text_keywords /
# textquality.tfidf_keywords): same tokenizer, integer tf/df counts,
# score = tf * ln(N/df) round-6, (score desc, term asc) tie rule
EXTENSION_ORACLE["text_keywords"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        tf AS (
          SELECT doc_id, w, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS w FROM t)
          GROUP BY doc_id, w),
        dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
        n AS (SELECT COUNT(*) AS nn FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.w,
                 CAST(tf.tf AS BIGINT) AS tf,
                 ROUND(tf.tf * ln(CAST(nn AS DOUBLE) / dfq.df), 6) AS score_r
          FROM tf JOIN dfq ON dfq.w = tf.w CROSS JOIN n),
        ranked AS (
          SELECT doc_id, w, tf, score_r,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score_r DESC, w ASC) AS BIGINT) AS rk
          FROM scored)
        SELECT doc_id, w AS term, tf, score_r, rk
        FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
    """

# streaming-sink compaction (extensions.stream_sink_compact): layout
# facts from row-count arithmetic; the booleans certify exactly-once
# landing (event_id checksum vs the batch table), planned-vs-on-disk
# file counts, and key-disjoint compacted ranges
EXTENSION_ORACLE["stream_sink_compact"] = """
        WITH n AS (SELECT COUNT(*) AS c FROM events)
        SELECT * FROM (
          SELECT 'compacted' AS stage,
                 CAST(CEIL(c / 4096.0) AS BIGINT) AS n_files,
                 CAST(c AS BIGINT) AS n_rows,
                 true AS files_ok, true AS checksum_ok, true AS clustered_ok
          FROM n
          UNION ALL
          SELECT 'landed', CAST(LEAST(16, c) AS BIGINT), CAST(c AS BIGINT),
                 true, true, true
          FROM n)
        ORDER BY stage
    """

# ordered conversion funnel (extensions.events_funnel_seq): conditional
# MIN chaining on integer microsecond epochs
EXTENSION_ORACLE["events_funnel_seq"] = """
        WITH ev AS (
          SELECT user_id, event_type,
                 CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
          FROM events),
        s1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT ev.user_id, MIN(us) AS t2
               FROM ev JOIN s1 ON s1.user_id = ev.user_id
               WHERE event_type = 'view' AND us > t1 GROUP BY ev.user_id),
        s3 AS (SELECT ev.user_id, MIN(us) AS t3
               FROM ev JOIN s2 ON s2.user_id = ev.user_id
               WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id)
        SELECT * FROM (
          SELECT 1 AS stage, 'signup' AS step,
                 CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
          UNION ALL
          SELECT 2, 'view_after_signup', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
          UNION ALL
          SELECT 3, 'purchase_after_view', CAST((SELECT COUNT(*) FROM s3) AS BIGINT))
        ORDER BY stage
    """

# cohort retention matrix (extensions.events_retention): integer
# day-truncated epochs, first-seen cohort, distinct active users per
# (cohort, offset)
EXTENSION_ORACLE["events_retention"] = """
        WITH ev AS (
          SELECT DISTINCT user_id,
                 CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
                      AS BIGINT) AS day
          FROM events),
        cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM ev
                   GROUP BY user_id)
        SELECT c.cohort_day, ev.day - c.cohort_day AS day_offset,
               CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
        FROM ev JOIN cohort c ON c.user_id = ev.user_id
        GROUP BY c.cohort_day, day_offset
        ORDER BY c.cohort_day, day_offset
    """

# BPE-budgeted packing (extensions.pipe_pack_bpe): the pipe_pack cumsum
# with the BPE pre-tokenizer count as the length unit
EXTENSION_ORACLE["pipe_pack_bpe"] = r"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text),
                   '''[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\s]+')) AS n_tok,
                 ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   AS h
          FROM documents),
        c AS (
          SELECT doc_id, (h % 10000) % 16 AS shard, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY (h % 10000) % 16 ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_tok
          FROM t)
        SELECT doc_id, shard, start_tok, start_tok + n_tok AS end_tok,
               CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS seq_id
        FROM c ORDER BY doc_id
    """

# semantic duplicate clusters (extensions.dedup_clusters_semantic):
# transitive closure over the SAME naive banded-LSH pair SQL as
# dedup_embedding, mirrored from the dedup_clusters recursive CTE
EXTENSION_ORACLE["dedup_clusters_semantic"] = f"""
        WITH RECURSIVE {_VECS},
        sbanded AS (
          SELECT id, v, nrm,
               {_EMB_BAND_COLS}
          FROM vecs),
        spairs AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM sbanded a JOIN sbanded b
            ON a.id < b.id AND ({_EMB_BAND_OR})
          WHERE ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                  >= 0.4),
        sedges AS (
          SELECT id_a AS u, id_b AS v FROM spairs
          UNION
          SELECT id_b AS u, id_a AS v FROM spairs),
        sreach(u, v) AS (
          SELECT u, v FROM sedges
          UNION
          SELECT r.u, e.v FROM sreach r JOIN sedges e ON r.v = e.u),
        slbl AS (SELECT u AS id, MIN(v) AS mn FROM sreach GROUP BY u)
        SELECT emb.vec_id AS id,
               CAST(LEAST(emb.vec_id, COALESCE(l.mn, emb.vec_id)) AS BIGINT)
                 AS cluster_id
        FROM embeddings emb LEFT JOIN slbl l ON l.id = emb.vec_id
        ORDER BY id
    """


def _pagerank_sql(iters: int = 8, scale: int = 10**12, topk: int = 20) -> str:
    """Unroll graph.pagerank's integer supersteps as chained CTEs."""
    # MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and
    # every step references its predecessor twice - inlined, the chain
    # re-evaluates the whole prefix 2^t times (observed as a hang)
    steps = []
    prev = "p0"
    for t in range(1, iters + 1):
        steps.append(f"""
        p{t} AS MATERIALIZED (
          SELECT p.id, p.deg,
                 (15 * ({scale} // nn.n)) // 100
                   + (85 * COALESCE(c.s, 0)) // 100 AS pr
          FROM {prev} p
          LEFT JOIN (
            SELECT e.dst AS id, SUM(q.pr // q.deg) AS s
            FROM e JOIN {prev} q ON q.id = e.src GROUP BY e.dst) c
            ON c.id = p.id
          CROSS JOIN nn)""")
        prev = f"p{t}"
    return f"""
        WITH {_SHINGLES}, {_JACCARD},
        pairs AS MATERIALIZED (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
        e AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM pairs),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        p0 AS MATERIALIZED (
          SELECT id, deg, {scale} // nn.n AS pr FROM deg CROSS JOIN nn),
        {",".join(steps)},
        ranked AS (
          SELECT ROW_NUMBER() OVER (ORDER BY pr DESC, id) AS rk, id, pr
          FROM {prev})
        SELECT CAST(rk AS BIGINT) AS rk, id, CAST(pr AS BIGINT) AS pr
        FROM ranked WHERE rk <= {topk} ORDER BY rk
    """


EXTENSION_ORACLE["graph_pagerank"] = _pagerank_sql()


# ---- round 10 ----------------------------------------------------------

# Efraimidis-Spirakis weighted sample (extensions.pipe_sample_weighted /
# sampling.weighted_sample): the same key algebra - seeded 60-bit uniform,
# round-6 ln(u)/w ranking, id tiebreak, top-100
# DSIR importance resampling (operators/sampling.dsir_select): identical
# 256-bucket hashed token model (seeded portable md5), per-bucket
# log-ratios and Gumbel keys in int64 micro-nats, u = (h mod 2^52 + 0.5)
# / 2^52 exact in float64, top-50 by key with doc_id tie-break
EXTENSION_ORACLE["pipe_dsir"] = f"""
        WITH tb AS (
          -- COALESCE pins NULL labels to the POOL on this side too: the
          -- counts CASE WHEN already routed NULL to cr, but the pool
          -- CTE's WHERE NOT is_t would silently DROP the NULL row while
          -- Spark's coalesced is_t scores it (r14 review finding)
          SELECT doc_id, COALESCE(lang = 'en', FALSE) AS is_t,
                 {H.format(x="'dsir:' || token")} % 256 AS b
          FROM (SELECT doc_id, lang,
                       unnest(list_filter(string_split(lower(text), ' '),
                                          x -> x <> '')) AS token
                FROM documents)),
        counts AS (
          SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
                    SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
          FROM tb GROUP BY 1),
        tot AS (SELECT COALESCE(SUM(ct), 0) AS tt,
                       COALESCE(SUM(cr), 0) AS tr FROM counts),
        model AS (
          SELECT b, CAST(ROUND((ln((ct + 1.0) / (tt + 256))
                                - ln((cr + 1.0) / (tr + 256))) * 1e6, 0)
                         AS BIGINT) AS lr_fp
          FROM counts, tot),
        pool AS (
          SELECT tb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(lr_fp) AS BIGINT) AS logratio_fp
          FROM tb JOIN model USING (b) WHERE NOT is_t GROUP BY 1),
        keyed AS (
          SELECT doc_id, n_tokens, logratio_fp,
                 CAST(ROUND(-ln(-ln((({H.format(
                     x="'dsir-g:' || CAST(doc_id AS VARCHAR)")}
                     % 4503599627370496) + 0.5) / 4503599627370496.0))
                     * 1e6, 0) AS BIGINT) AS gumbel_fp
          FROM pool)
        SELECT doc_id, n_tokens, logratio_fp, gumbel_fp,
               logratio_fp + gumbel_fp AS key_fp
        FROM keyed ORDER BY key_fp DESC, doc_id ASC LIMIT 50
    """

EXTENSION_ORACLE["pipe_sample_weighted"] = f"""
        WITH k AS (
          SELECT doc_id, lang, source, n_chars,
                 CAST(ROUND(ln(({H.format(x="'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
                               / 1152921504606846976.0) * 1e9, 0) AS BIGINT)
                   AS lnu_fp
          FROM documents
          WHERE n_chars > 0)  -- mirror the operator's w>0 contract guard
        SELECT doc_id, lang, source, n_chars,
               ROUND(lnu_fp / n_chars, 6) AS w_key_r
        FROM k ORDER BY lnu_fp / n_chars DESC, doc_id LIMIT 100
    """

# blocked edit-distance linkage (extensions.dedup_fuzzy /
# dedup.fuzzy_pairs): the same blocked formulation - shared distinct
# word-5-gram with df <= 64 (the posting-list cap), +-16-char band, the
# R x R guarantee-restoring fallback for docs the cap de-guaranteed
# (raw grams > 48 but uncapped <= 48), levenshtein <= 8 (DuckDB's
# levenshtein is the identical unit-cost DP)
EXTENSION_ORACLE["dedup_fuzzy"] = """
        WITH raw_toks AS (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
                FROM documents)),
        g5 AS (
          SELECT DISTINCT doc_id AS id,
                 w || ' ' || w2 || ' ' || w3 || ' ' || w4 || ' ' || w5 AS s
          FROM (SELECT doc_id, w, i,
                       lead(w)    OVER (PARTITION BY doc_id ORDER BY i) AS w2,
                       lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3,
                       lead(w, 3) OVER (PARTITION BY doc_id ORDER BY i) AS w4,
                       lead(w, 4) OVER (PARTITION BY doc_id ORDER BY i) AS w5
                FROM raw_toks)
          WHERE w5 IS NOT NULL),
        g5h AS (SELECT DISTINCT id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
                FROM g5),
        rare AS (
          SELECT id, h FROM g5h
          WHERE h IN (SELECT h FROM g5h GROUP BY h HAVING COUNT(*) <= 64)),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM rare a JOIN rare b ON a.h = b.h AND a.id < b.id),
        r_ids AS (
          SELECT nr.id
          FROM (SELECT id, COUNT(*) AS n FROM g5h GROUP BY id) nr
          LEFT JOIN (SELECT id, COUNT(*) AS n FROM rare GROUP BY id) nu
            ON nu.id = nr.id
          WHERE nr.n > 48 AND COALESCE(nu.n, 0) <= 48),
        rcand AS (
          SELECT ra.id AS id_a, rb.id AS id_b
          FROM r_ids ra JOIN r_ids rb ON ra.id < rb.id),
        pairs AS (SELECT id_a, id_b FROM cand
                  UNION SELECT id_a, id_b FROM rcand)
        SELECT c.id_a, c.id_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev
        FROM pairs c
        JOIN documents da ON da.doc_id = c.id_a
        JOIN documents db ON db.doc_id = c.id_b
        WHERE abs(length(da.text) - length(db.text)) <= 16
          AND levenshtein(da.text, db.text) <= 8
        ORDER BY id_a, id_b
    """

# quality-aware cluster representative (extensions.dedup_keep_best):
# recursive-CTE closure (the dedup_clusters oracle) + the text_quality
# score algebra + per-cluster (quality desc, id) argmax
EXTENSION_ORACLE["dedup_keep_best"] = f"""
        WITH RECURSIVE {_SHINGLES}, {_JACCARD},
        pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lbl AS (SELECT u AS id, MIN(v) AS mn FROM reach GROUP BY u),
        clus AS (
          SELECT d.doc_id,
                 CAST(LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS BIGINT)
                   AS cluster_id
          FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
        qt AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents),
        qf AS (
          SELECT doc_id, len(toks) AS n,
                 len(list_filter(toks,
                     x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                 len(list_distinct(toks)) AS n_dist
          FROM qt),
        q AS (
          SELECT doc_id,
                 ROUND(0.4 * (n_stop / n) + 0.3 * least(n / 100.0, 1.0)
                       + 0.3 * (n_dist / n), 6) AS quality
          FROM qf),
        ranked AS (
          SELECT c.cluster_id, c.doc_id, q.quality,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                    ORDER BY q.quality DESC, c.doc_id) AS rk,
                 COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
          FROM clus c JOIN q USING (doc_id))
        SELECT cluster_id, doc_id AS rep_id, quality AS rep_quality_r,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rk = 1 ORDER BY cluster_id
    """

# sparse TF-IDF trigram cosine (extensions.sim_sparse_topk /
# textquality.tfidf_cosine_pairs): identical weight algebra - round-6
# tf*ln(N/df) as DECIMAL(18,6), exact decimal dots/norms, round-6 cosine,
# df cap 100, global top-20
EXTENSION_ORACLE["sim_sparse_topk"] = """
        WITH raw_toks AS (
          SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
                FROM documents)),
        tg AS (
          SELECT doc_id AS id, w || ' ' || w2 || ' ' || w3 AS s
          FROM (SELECT doc_id, w, i,
                       lead(w)    OVER (PARTITION BY doc_id ORDER BY i) AS w2,
                       lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
                FROM raw_toks)
          WHERE w3 IS NOT NULL),
        tf AS (SELECT id, s, COUNT(*) AS tf FROM tg GROUP BY id, s),
        dfq AS (SELECT s, COUNT(*) AS df FROM tf GROUP BY s),
        n AS (SELECT COUNT(*) AS nn FROM documents),
        wts AS (
          SELECT id, s,
                 CAST(ROUND(tf * ln(CAST(nn AS DOUBLE) / df), 6)
                      AS DECIMAL(18,6)) AS w
          FROM tf JOIN dfq USING (s) CROSS JOIN n
          WHERE df <= 100),
        nrm AS (SELECT id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS nr
                FROM wts GROUP BY id),
        dots AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 CAST(SUM(a.w * b.w) AS DOUBLE) AS dot
          FROM wts a JOIN wts b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2),
        cos AS (
          SELECT id_a, id_b, ROUND(dot / (na.nr * nb.nr), 6) AS cos_r
          FROM dots
          JOIN nrm na ON na.id = id_a
          JOIN nrm nb ON nb.id = id_b)
        SELECT id_a, id_b, cos_r FROM cos
        ORDER BY cos_r DESC, id_a, id_b LIMIT 20
    """

# vocabulary coverage (extensions.text_vocab / textquality.vocab_coverage):
# top-20 vocab by (count desc, word asc), per-doc in-vocab ratio
EXTENSION_ORACLE["text_vocab"] = """
        WITH toks AS (
          SELECT doc_id AS id, unnest(
                 list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
          FROM documents),
        vocab AS (
          SELECT w FROM (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w)
          ORDER BY cnt DESC, w ASC LIMIT 20)
        SELECT id AS doc_id,
               COUNT(*)::BIGINT AS n_tokens,
               SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 1 ELSE 0 END)::BIGINT
                 AS n_in_vocab,
               ROUND(1.0 - SUM(CASE WHEN w IN (SELECT w FROM vocab)
                                    THEN 1 ELSE 0 END) / COUNT(*), 6) AS oov_r
        FROM toks GROUP BY id ORDER BY doc_id
    """

# order-invariant dataset manifest (extensions.pipe_manifest): the split
# bucket rule of pipe_split + per-(split, source) XOR'd content hashes
EXTENSION_ORACLE["pipe_manifest"] = f"""
        WITH d AS (
          SELECT doc_id, source, n_chars, text,
                 CASE WHEN b < 8000 THEN 'train'
                      WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT *,
                       {H.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
                FROM documents))
        SELECT split, source, COUNT(*)::BIGINT AS n_docs,
               bit_xor({H.format(x="CAST(doc_id AS VARCHAR) || ':' || text")})
                 AS xor_h,
               SUM(n_chars)::BIGINT AS total_chars,
               MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM d GROUP BY split, source ORDER BY split, source
    """

# trailing-7-day RANGE-frame features (extensions.events_rolling): the
# identical integer-second frame; count/max/min are order-free aggregates
EXTENSION_ORACLE["events_rolling"] = """
        WITH ev AS (
          SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec, value
          FROM events WHERE value IS NOT NULL AND NOT isnan(value))
        SELECT event_id, user_id, sec,
               COUNT(*) OVER w AS n_7d,
               ROUND(MAX(value) OVER w, 6) AS max_7d,
               ROUND(MIN(value) OVER w, 6) AS min_7d
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec
                             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """

# SCD2 interval build (extensions.events_scd2): identical gaps-and-islands
# run assignment over (us, event_id), intervals via lead of run starts
EXTENSION_ORACLE["events_scd2"] = """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us, event_id
          FROM events),
        lagged AS (
          SELECT user_id, event_type, us, event_id,
                 lag(event_type) OVER w AS prev_t,
                 lag(us) OVER w AS prev_us
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        runs AS (
          -- null-safe run break, mirroring the engine's eqNullSafe: a
          -- NULL event_type must open its own run, and partition start
          -- is detected on the never-null prev_us
          SELECT user_id, event_type, us,
                 SUM(CASE WHEN prev_us IS NULL
                            OR prev_t IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run_id
          FROM lagged),
        agg AS (
          SELECT user_id, run_id, MIN(event_type) AS event_type,
                 MIN(us) AS valid_from_us,
                 COUNT(*)::BIGINT AS n_events
          FROM runs GROUP BY user_id, run_id)
        SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
               valid_from_us,
               lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
                 AS valid_to_us,
               n_events
        FROM agg ORDER BY user_id, run_id
    """


# kNN graph (extensions.sim_knn_graph): the near_dup banding replayed as
# one OR-join with the threshold open, symmetric directed edges, top-3
# per source node by (cos desc, nbr)
EXTENSION_ORACLE["sim_knn_graph"] = f"""
        WITH {_VECS},
        banded AS (
          SELECT id, v, nrm,
               {_EMB_BAND_COLS}
          FROM vecs),
        cand AS (
          SELECT a.id AS id_a, b.id AS id_b,
                 ROUND(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6)
                   AS cos_r
          FROM banded a JOIN banded b
            ON a.id < b.id AND ({_EMB_BAND_OR})),
        edges AS (
          SELECT id_a AS id, id_b AS nbr, cos_r FROM cand
          UNION ALL
          SELECT id_b AS id, id_a AS nbr, cos_r FROM cand),
        ranked AS (
          SELECT id, nbr, cos_r,
                 CAST(ROW_NUMBER() OVER (PARTITION BY id
                        ORDER BY cos_r DESC, nbr ASC) AS BIGINT) AS rk
          FROM edges)
        SELECT id, rk, nbr, cos_r FROM ranked WHERE rk <= 3
        ORDER BY id, rk
    """

# per-column stats card (extensions.scale_colstats): naive per-column
# SELECTs unioned - every statistic a count, distinct count, or order
# statistic (NaN excluded from value's ndv/min/max, counted apart)
EXTENSION_ORACLE["scale_colstats"] = """
        SELECT * FROM (
          SELECT 'event_id' AS col_name,
                 SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
                 0::BIGINT AS n_nan,
                 COUNT(DISTINCT event_id)::BIGINT AS ndv,
                 CAST(MIN(event_id) AS DOUBLE) AS min_num,
                 CAST(MAX(event_id) AS DOUBLE) AS max_num,
                 CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
          FROM events
          UNION ALL
          SELECT 'ts_us',
                 SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT, 0::BIGINT,
                 COUNT(DISTINCT epoch_us(ts))::BIGINT,
                 CAST(MIN(epoch_us(ts)) AS DOUBLE), CAST(MAX(epoch_us(ts)) AS DOUBLE),
                 NULL, NULL
          FROM events
          UNION ALL
          SELECT 'user_id',
                 SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT, 0::BIGINT,
                 COUNT(DISTINCT user_id)::BIGINT,
                 CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
                 NULL, NULL
          FROM events
          UNION ALL
          SELECT 'value',
                 SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
                 SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END)::BIGINT,
                 COUNT(DISTINCT CASE WHEN NOT isnan(value) THEN value END)::BIGINT,
                 ROUND(MIN(CASE WHEN NOT isnan(value) THEN value END), 6),
                 ROUND(MAX(CASE WHEN NOT isnan(value) THEN value END), 6),
                 NULL, NULL
          FROM events
          UNION ALL
          SELECT 'event_type',
                 SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT, 0::BIGINT,
                 COUNT(DISTINCT event_type)::BIGINT,
                 NULL, NULL, MIN(event_type), MAX(event_type)
          FROM events
          UNION ALL
          SELECT 'props',
                 SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT, 0::BIGINT,
                 COUNT(DISTINCT props)::BIGINT,
                 NULL, NULL, MIN(props), MAX(props)
          FROM events)
        ORDER BY col_name
    """

# per-source KL drift (extensions.text_domain_shift): identical count
# algebra, round-6 terms summed as DECIMAL then cast once to DOUBLE
EXTENSION_ORACLE["text_domain_shift"] = """
        WITH toks AS (
          SELECT source, unnest(
                 list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
          FROM documents),
        cnt_ws AS (SELECT source, w, COUNT(*) AS c_sw FROM toks GROUP BY source, w),
        n_s AS (SELECT source, SUM(c_sw) AS n_s FROM cnt_ws GROUP BY source),
        cnt_w AS (SELECT w, SUM(c_sw) AS c_w FROM cnt_ws GROUP BY w),
        n_tot AS (SELECT SUM(c_w) AS n_tot FROM cnt_w),
        term AS (
          SELECT cnt_ws.source, n_s.n_s,
                 CAST(ROUND((c_sw / n_s.n_s)
                       * ln((CAST(c_sw AS DOUBLE) * n_tot)
                            / (CAST(c_w AS DOUBLE) * n_s.n_s)), 6)
                      AS DECIMAL(18,6)) AS term
          FROM cnt_ws
          JOIN cnt_w USING (w)
          JOIN n_s ON n_s.source = cnt_ws.source
          CROSS JOIN n_tot)
        SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_tokens,
               CAST(SUM(term) AS DOUBLE) AS kl_r
        FROM term GROUP BY source ORDER BY source
    """

# soft-dedup weights (extensions.pipe_reweight): recursive-CTE clusters +
# per-cluster member counts, weight = round(1/n, 6)
EXTENSION_ORACLE["pipe_reweight"] = f"""
        WITH RECURSIVE {_SHINGLES}, {_JACCARD},
        pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION
          SELECT id_b AS u, id_a AS v FROM pairs),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
        lbl AS (SELECT u AS id, MIN(v) AS mn FROM reach GROUP BY u),
        clus AS (
          SELECT d.doc_id,
                 CAST(LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS BIGINT)
                   AS cluster_id
          FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
        SELECT doc_id, cluster_id,
               CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS n_members,
               ROUND(1.0 / COUNT(*) OVER (PARTITION BY cluster_id), 6) AS w_r
        FROM clus ORDER BY doc_id
    """

# dedup threshold sweep (extensions.pipe_dedup_sweep): exact jaccard
# pairs once at the loosest bar, counts per threshold
EXTENSION_ORACLE["pipe_dedup_sweep"] = f"""
        WITH {_SHINGLES}, {_JACCARD},
        base AS (SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.6),
        swept AS (
          SELECT id_a, id_b, jaccard, t
          FROM base, unnest([0.6, 0.7, 0.8, 0.9, 0.95]) AS u(t)
          WHERE jaccard >= t),
        np AS (SELECT t, COUNT(*)::BIGINT AS n_pairs FROM swept GROUP BY t),
        nd AS (
          SELECT t, COUNT(DISTINCT id)::BIGINT AS n_docs
          FROM (SELECT t, id_a AS id FROM swept
                UNION ALL SELECT t, id_b FROM swept)
          GROUP BY t)
        SELECT np.t, n_pairs, n_docs FROM np JOIN nd USING (t) ORDER BY t
    """


# persisted-index round trip (extensions.sim_index_persist): serving from
# the reloaded parquet artifacts must equal the in-memory PQ path, so the
# oracle is sim_topk_pq's unrolled SQL verbatim - any storage loss or
# artifact mismatch flips the hash
EXTENSION_ORACLE["sim_index_persist"] = EXTENSION_ORACLE["sim_topk_pq"]

# incremental index append (extensions.sim_index_append): the oracle
# trains the codebooks on the BASE corpus only (id % 10 != 3), then
# re-encodes the WHOLE corpus against them in one shot - PQ encoding is
# per-row, so the engine's append path (persist base codes, encode the
# batch against the reloaded frozen codebooks, parquet-append, re-serve)
# must land on the identical code table; any codebook drift across the
# reload, lost append file, or batch/base skew flips the hash
# MIPS top-k (extensions.sim_mips / similarity.topk_mips): exact
# inner-product ranking, round-6 key + id tiebreak; aug_ok (the
# norm-augmentation reduction identity, raw-vs-raw rank equality) is
# derived independently on the Spark side from materialized augmented
# arrays and pinned true here - a broken reduction flips the hash
EXTENSION_ORACLE["sim_mips"] = f"""
        WITH {_VECS}
        SELECT q_id, cand_id, ip_r, rank, true AS aug_ok FROM (
          SELECT q.id AS q_id, c.id AS cand_id,
                 ROUND(list_inner_product(q.v, c.v), 6) AS ip_r,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.id
                   ORDER BY ROUND(list_inner_product(q.v, c.v), 6) DESC,
                            c.id ASC) AS rank
          FROM vecs q JOIN vecs c ON c.id != q.id
          WHERE q.id < 10)
        WHERE rank <= 5 ORDER BY q_id, rank
    """

# Hamilton apportionment (extensions.pipe_mixture_schedule /
# sampling.mixture_schedule): exact integer quota/remainder algebra,
# extras by remainder rank (domain tiebreak), slots sum == budget
EXTENSION_ORACLE["pipe_mixture_schedule"] = """
        WITH c AS (
          SELECT lang || '/' || source AS domain, COUNT(*)::BIGINT AS n_docs
          FROM documents GROUP BY 1),
        t AS (SELECT SUM(n_docs) AS nn FROM c),
        q AS (
          SELECT domain, n_docs,
                 (100000 * n_docs) // nn AS base_slots,
                 (100000 * n_docs) % nn AS rem
          FROM c CROSS JOIN t),
        l AS (SELECT 100000 - SUM(base_slots) AS leftover FROM q),
        r AS (SELECT domain, n_docs, base_slots, rem,
                     ROW_NUMBER() OVER (ORDER BY rem DESC, domain ASC) AS rk
              FROM q)
        SELECT domain, n_docs,
               CAST(base_slots AS BIGINT) AS base_slots,
               CAST(rem AS BIGINT) AS rem,
               CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                 AS extra,
               CAST(base_slots
                    + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
                 AS slots
        FROM r CROSS JOIN l ORDER BY domain
    """

_APQ_CTES, _APQ_FINAL = _pq_ctes(_PQ_ITERS, src="basev", p="b")
EXTENSION_ORACLE["sim_index_append"] = f"""
        WITH {_VECS},
        basev AS (SELECT id, v, nrm FROM vecs WHERE id % 10 != 3),
        {_APQ_CTES}
        psv AS (
          SELECT id, nrm, m,
                 list_slice(v, m * {_PQ_SD} + 1, (m + 1) * {_PQ_SD}) AS sv
          FROM vecs, range(0, {_PQ_M}) r(m)),
        {_PQ_RANKED.replace(_PQ_FINAL, _APQ_FINAL)}
        SELECT q_id, cand_id, acos_r, rank FROM pqranked
        WHERE rank <= 5 ORDER BY q_id, rank
    """

# robust winnowing (extensions.text_winnow / textquality.winnow_fingerprints):
# the engine evaluates the rightmost-window-minimum criterion per row with
# nearest-smaller distances over arrays; the oracle replays it as a bounded
# +-(w-1) neighbor self-join - p is selected iff some valid window start s
# keeps all left neighbors >= h_p and all right neighbors > h_p, i.e.
# greatest(0, p - pl + 1) <= least(n - w, p + nl - w) with pl = nearest
# strictly-smaller distance left, nl = nearest <= distance right, capped at w
_WINNOW_H = H.format(x="array_to_string(list_slice(l, i, i + 3), ' ')")
# shared winnow selection CTEs: sel = (doc_id, p, h), the robust
# rightmost-window-minimum selections (used by text_winnow AND
# dedup_winnow)
_WINNOW_CTES = f"""t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS l
          FROM documents),
        tt AS (SELECT doc_id, l, len(l) - 3 AS n FROM t WHERE len(l) >= 8),
        g AS (
          SELECT doc_id, i - 1 AS p, n, {_WINNOW_H} AS h
          FROM (SELECT doc_id, l, n, unnest(generate_series(1, n)) AS i
                FROM tt)),
        nb AS (
          SELECT a.doc_id, a.p, a.h, a.n,
                 COALESCE(MIN(CASE WHEN b.p < a.p AND b.h < a.h
                                   THEN a.p - b.p END), 5) AS pl,
                 COALESCE(MIN(CASE WHEN b.p > a.p AND b.h <= a.h
                                   THEN b.p - a.p END), 5) AS nl
          FROM g a JOIN g b
            ON b.doc_id = a.doc_id
           AND b.p BETWEEN a.p - 4 AND a.p + 4 AND b.p <> a.p
          GROUP BY a.doc_id, a.p, a.h, a.n),
        sel AS (
          SELECT doc_id, p, h FROM nb
          WHERE greatest(0, p - pl + 1) <= least(n - 5, p + nl - 5))"""

EXTENSION_ORACLE["text_winnow"] = f"""
        WITH {_WINNOW_CTES},
        per AS (
          SELECT doc_id, COUNT(*) AS n_fp,
                 CAST(SUM((h % 1000003) * (p + 1)) % 2147483647 AS BIGINT)
                   AS ck
          FROM sel GROUP BY doc_id)
        SELECT tt.doc_id,
               CAST(tt.n AS BIGINT) AS n_grams,
               CAST(per.n_fp AS BIGINT) AS n_fp,
               ROUND(per.n_fp / CAST(tt.n - 4 AS DOUBLE), 6) AS density_r,
               per.ck AS fp_checksum
        FROM tt JOIN per USING (doc_id) ORDER BY doc_id
    """

# day-grid forward fill (extensions.events_gap_fill): day grain via
# arg_max over the unique (user_id, epoch_us) order, dense grid from
# generate_series, IGNORE NULLS window carry; checksums are integer
# (floor-micro quantized) - never a cross-engine float sum
EXTENSION_ORACLE["events_gap_fill"] = """
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
                 value
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        daily AS (
          SELECT user_id, day, arg_max(value, us) AS v
          FROM ev GROUP BY user_id, day),
        span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                 FROM daily GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
                 FROM span),
        f AS (
          SELECT g.user_id, g.day, d.v,
                 last_value(d.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
          FROM grid g LEFT JOIN daily d
            ON d.user_id = g.user_id AND d.day = g.day)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(COUNT(v) AS BIGINT) AS n_obs,
               CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_filled,
               CAST(SUM(CAST(floor(v * 1e6) AS BIGINT)) AS BIGINT)
                 AS obs_micro,
               CAST(SUM(CAST(floor(fv * 1e6) AS BIGINT) * (day % 97 + 1))
                    AS BIGINT) AS fill_ck
        FROM f GROUP BY user_id ORDER BY user_id
    """

# PII scrub (extensions.text_pii_scrub): identical deterministic dirty
# corpus rebuilt from doc_id, same three RE2/Java-portable regexes applied
# email -> ip -> phone with the 'g' flag; md5 of the scrubbed text pins
# every replacement byte
EXTENSION_ORACLE["text_pii_scrub"] = """
        WITH dirty AS (
          SELECT doc_id,
                 text || CASE doc_id % 4
                   WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                               || '@example.com for access'
                   WHEN 1 THEN ' call 555-'
                               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                               || ' now'
                   WHEN 2 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                               || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                               || ' responds'
                   ELSE '' END AS d
          FROM documents),
        scrub AS (
          SELECT doc_id, d,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(d,
                       '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>',
                       'g'),
                     '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                     '<IP>', 'g'),
                   '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS clean
          FROM dirty)
        SELECT doc_id,
               CAST(len(regexp_extract_all(d,
                 '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT)
                 AS n_email,
               CAST(len(regexp_extract_all(d,
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
                 AS n_ip,
               CAST(len(regexp_extract_all(d,
                 '\\b\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone,
               CAST(strlen(clean) AS BIGINT) AS n_chars_clean,
               md5(clean) AS clean_md5
        FROM scrub ORDER BY doc_id
    """

# deterministic epoch shuffle (extensions.pipe_epoch_shuffle): the naive
# PARTITION BY epoch ROW_NUMBER the distributed rank must reproduce
_SHUF_H = H.format(
    x="CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
)
EXTENSION_ORACLE["pipe_epoch_shuffle"] = f"""
        WITH e AS (
          SELECT doc_id, unnest(generate_series(0, 3)) AS epoch
          FROM documents),
        k AS (SELECT epoch, doc_id, {_SHUF_H} AS key FROM e),
        p AS (
          SELECT epoch, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY epoch
                                    ORDER BY key, doc_id) AS pos
          FROM k)
        SELECT CAST(epoch AS BIGINT) AS epoch,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_pos,
               CAST(arg_min(doc_id, pos) AS BIGINT) AS first_doc,
               CAST(arg_max(doc_id, pos) AS BIGINT) AS last_doc,
               CAST(SUM((pos % 2147483647) * ((doc_id + 1) % 2147483647)
                        % 2147483647) % 2147483647 AS BIGINT) AS perm_ck
        FROM p GROUP BY epoch ORDER BY epoch
    """


def _kcenter_ctes(k: int) -> str:
    """Unrolled greedy farthest-first trace: c1 = min id; d_i carries the
    running best-center similarity; c_{i+1} = the ORDER BY s, id LIMIT 1
    pick. Quadratic re-scoring per step - the naive form the engine's
    superstep/broadcast construction must reproduce."""
    parts = [
        "c1 AS (SELECT id, v, nrm FROM vecs ORDER BY id LIMIT 1)",
        """d1 AS (
          SELECT x.id, x.v, x.nrm,
                 ROUND(list_inner_product(x.v, c.v) / (x.nrm * c.nrm), 6) AS s
          FROM vecs x, c1 c WHERE x.id <> c.id)""",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"c{i} AS (SELECT id, v, nrm, s FROM d{i-1} "
            f"ORDER BY s ASC, id ASC LIMIT 1)"
        )
        if i < k:
            parts.append(f"""d{i} AS (
          SELECT x.id, x.v, x.nrm,
                 greatest(x.s,
                   ROUND(list_inner_product(x.v, c.v) / (x.nrm * c.nrm), 6))
                   AS s
          FROM d{i-1} x, c{i} c WHERE x.id <> c.id)""")
    return ",\n        ".join(parts)


_KCENTER_SEL = "\n        UNION ALL ".join(
    ["SELECT 1 AS rank, id AS vec_id, 1.0 AS far_s FROM c1"]
    + [f"SELECT {i}, id, s FROM c{i}" for i in range(2, 6)]
)
EXTENSION_ORACLE["sim_kcenter"] = f"""
        WITH {_VECS},
        {_kcenter_ctes(5)}
        SELECT rank, vec_id, far_s FROM (
        {_KCENTER_SEL}
        ) ORDER BY rank
    """

# parallel-anchor LTTB (extensions.events_lttb): same exact-integer
# anchors and IEEE area expression; selection via the naive ROW_NUMBER
# (the engine uses a map-side max_by - different formulation)
EXTENSION_ORACLE["events_lttb"] = """
        WITH pts AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value AS v
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        span AS (
          SELECT user_id, MIN(us) AS u0, MAX(us) - MIN(us) + 1 AS sp
          FROM pts GROUP BY user_id),
        pb AS (
          SELECT p.user_id, p.event_id, p.us, p.v,
                 least(CAST(floor((p.us - s.u0) * 24 / s.sp) AS BIGINT), 23)
                   AS b,
                 p.us - s.u0 AS tq,
                 (p.us - s.u0) / 1e6 AS tp
          FROM pts p JOIN span s ON s.user_id = p.user_id),
        anchors AS (
          SELECT user_id, b,
                 SUM(tq) / COUNT(*) / 1e6 AS tbar,
                 SUM(CAST(floor(v * 1e6) AS BIGINT)) / COUNT(*) / 1e6 AS vbar
          FROM pb GROUP BY user_id, b),
        nb AS (
          SELECT user_id, b,
                 lag(tbar) OVER w AS t_prev, lag(vbar) OVER w AS v_prev,
                 lead(tbar) OVER w AS t_next, lead(vbar) OVER w AS v_next
          FROM anchors WINDOW w AS (PARTITION BY user_id ORDER BY b)),
        scored AS (
          SELECT p.user_id, p.b, p.event_id, p.us, p.tp, p.v,
                 n.t_prev, n.t_next,
                 ROUND(abs((n.t_prev - n.t_next) * (p.v - n.v_prev)
                           - (n.t_prev - p.tp) * (n.v_next - n.v_prev)), 6)
                   AS area
          FROM pb p JOIN nb n ON n.user_id = p.user_id AND n.b = p.b),
        ranked AS (
          SELECT user_id, b, event_id, tp, v,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, b
                   ORDER BY CASE WHEN t_prev IS NULL OR t_next IS NULL
                                 THEN 0.0 ELSE area END DESC,
                            CASE WHEN t_prev IS NULL OR t_next IS NOT NULL
                                 THEN us ELSE -us END ASC) AS rn
          FROM scored)
        SELECT user_id, b AS bucket, event_id,
               ROUND(tp, 6) AS t_r, ROUND(v, 6) AS v_r
        FROM ranked WHERE rn = 1 ORDER BY user_id, bucket
    """

# integer-exact CUSUM (extensions.events_changepoint): same scaled
# statistic S_k = n*cumsum(q) - k*T; the oracle uses QUALIFY-style
# window ranking instead of the engine's max/min reductions
EXTENSION_ORACLE["events_changepoint"] = """
        WITH pts AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CAST(floor(value * 1e6) AS BIGINT) AS q
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        tot AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS t
          FROM pts GROUP BY user_id),
        cum AS (
          SELECT p.user_id, p.us, o.n, o.t,
                 ROW_NUMBER() OVER w AS k,
                 CAST(SUM(p.q) OVER (PARTITION BY p.user_id ORDER BY p.us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cq
          FROM pts p JOIN tot o ON o.user_id = p.user_id
          WINDOW w AS (PARTITION BY p.user_id ORDER BY p.us)),
        s AS (
          SELECT user_id, us, n, k,
                 abs(n * cq - k * t) AS s_abs
          FROM cum),
        r AS (
          SELECT user_id, us, n, k, s_abs,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY s_abs DESC, k ASC) AS rn
          FROM s)
        SELECT user_id, n, CAST(k AS BIGINT) AS cp_k, us AS cp_us,
               CAST(s_abs AS BIGINT) AS drift,
               ROUND(s_abs / (n * n * 1e6), 6) AS drift_r
        FROM r WHERE rn = 1 ORDER BY user_id
    """


def _mmr_ctes(k: int) -> str:
    """Chained greedy MMR trace: rel once, then per step the full-pool
    max-sim-to-selected update and the ORDER BY score LIMIT 1 pick."""
    parts = [
        """qv AS (SELECT v, nrm FROM vecs WHERE id = 0),
        pool AS (
          SELECT x.id, x.v, x.nrm,
                 ROUND(list_inner_product(x.v, q.v) / (x.nrm * q.nrm), 6)
                   AS rel
          FROM vecs x, qv q WHERE x.id <> 0)""",
        "m1 AS (SELECT id, v, nrm, rel, rel AS score FROM pool "
        "ORDER BY rel DESC, id ASC LIMIT 1)",
        """p1 AS (
          SELECT x.id, x.v, x.nrm, x.rel,
                 ROUND(list_inner_product(x.v, c.v) / (x.nrm * c.nrm), 6)
                   AS ms
          FROM pool x, m1 c WHERE x.id <> c.id)""",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""m{i} AS (
          SELECT id, v, nrm, rel,
                 ROUND(0.7 * rel - 0.3 * ms, 6) AS score
          FROM p{i-1} ORDER BY score DESC, id ASC LIMIT 1)"""
        )
        if i < k:
            parts.append(
                f"""p{i} AS (
          SELECT x.id, x.v, x.nrm, x.rel,
                 greatest(x.ms,
                   ROUND(list_inner_product(x.v, c.v) / (x.nrm * c.nrm), 6))
                   AS ms
          FROM p{i-1} x, m{i} c WHERE x.id <> c.id)"""
            )
    return ",\n        ".join(parts)


_MMR_SEL = "\n        UNION ALL ".join(
    [f"SELECT {i} AS rank, id AS vec_id, rel AS rel_r, score AS score_r "
     f"FROM m{i}" for i in range(1, 6)]
)
EXTENSION_ORACLE["sim_mmr"] = f"""
        WITH {_VECS},
        {_mmr_ctes(5)}
        SELECT rank, vec_id, rel_r, score_r FROM (
        {_MMR_SEL}
        ) ORDER BY rank
    """

# cross-doc winnow matching (extensions.dedup_winnow): distinct selected
# hashes per doc, df-capped postings, pair counts - same CTEs as
# text_winnow plus the naive posting join
EXTENSION_ORACLE["dedup_winnow"] = f"""
        WITH {_WINNOW_CTES},
        post AS (SELECT DISTINCT doc_id AS id, h FROM sel),
        okh AS (SELECT h FROM (SELECT h, COUNT(*) AS c FROM post GROUP BY h)
                WHERE c <= 64),
        cp AS (SELECT p.id, p.h FROM post p JOIN okh USING (h))
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM cp a JOIN cp b ON a.h = b.h AND a.id < b.id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ORDER BY id_a, id_b
    """

# dedup-method recall/precision harness (extensions.dedup_compare): each
# constituent method's FULL oracle query runs as a subquery (DuckDB
# allows WITH inside derived tables), counted the naive way against the
# exact-Jaccard reference
EXTENSION_ORACLE["dedup_compare"] = f"""
        WITH exact AS (
          SELECT id_a, id_b FROM ({EXTENSION_ORACLE["dedup_ngram_jaccard"]})),
        m_minhash AS (
          SELECT id_a, id_b FROM ({EXTENSION_ORACLE["dedup_minhash_lsh"]})),
        m_simhash AS (
          SELECT id_a, id_b FROM ({EXTENSION_ORACLE["dedup_simhash"]})),
        m_winnow AS (
          SELECT id_a, id_b FROM ({EXTENSION_ORACLE["dedup_winnow"]})),
        ne AS (SELECT COUNT(*) AS n_exact FROM exact),
        stats AS (
          SELECT 'minhash_lsh' AS method,
                 (SELECT COUNT(*) FROM m_minhash) AS n_out,
                 (SELECT COUNT(*) FROM m_minhash m
                   JOIN exact e ON e.id_a = m.id_a AND e.id_b = m.id_b)
                   AS n_hit
          UNION ALL
          SELECT 'simhash',
                 (SELECT COUNT(*) FROM m_simhash),
                 (SELECT COUNT(*) FROM m_simhash m
                   JOIN exact e ON e.id_a = m.id_a AND e.id_b = m.id_b)
          UNION ALL
          SELECT 'winnow',
                 (SELECT COUNT(*) FROM m_winnow),
                 (SELECT COUNT(*) FROM m_winnow m
                   JOIN exact e ON e.id_a = m.id_a AND e.id_b = m.id_b))
        SELECT method,
               CAST(n_out AS BIGINT) AS n_out,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(ne.n_exact AS BIGINT) AS n_exact,
               ROUND(n_hit / CAST(ne.n_exact AS DOUBLE), 6) AS recall_r,
               ROUND(n_hit / CAST(n_out AS DOUBLE), 6) AS precision_r
        FROM stats CROSS JOIN ne ORDER BY method
    """

# streaming online CUSUM (extensions.stream_cusum): batch closed form -
# P = prefix sum of centered micro values in (us, event_id) order,
# S_k = P_k - least(0, prefix-min P); the drained stream state must
# equal this exactly (integer arithmetic both sides)
EXTENSION_ORACLE["stream_cusum"] = """
        WITH pts AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(floor(value * 1e6) AS BIGINT) - 50000000 AS x
          FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
        c AS (
          SELECT user_id, us, event_id,
                 CAST(SUM(x) OVER w AS BIGINT) AS p
          FROM pts
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        s AS (
          SELECT user_id, us, event_id, p,
                 p - least(CAST(0 AS BIGINT),
                           CAST(MIN(p) OVER w AS BIGINT)) AS drift
          FROM c
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               -- (user_id, us) is unique, so us alone is the total order
               CAST(arg_max(p, us) AS BIGINT) AS p_final,
               CAST(MAX(drift) AS BIGINT) AS max_drift,
               CAST(SUM(CASE WHEN drift > 500000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_alarms
        FROM s GROUP BY user_id ORDER BY user_id
    """

# leakage-safe split (extensions.pipe_split_safe): the dedup_clusters
# transitive-closure oracle as a subquery, bucket rule keyed on the
# cluster representative with the 'splitsafe' seed
EXTENSION_ORACLE["pipe_split_safe"] = f"""
        WITH cl AS (
          SELECT doc_id, cluster_id
          FROM ({EXTENSION_ORACLE["dedup_clusters"]}))
        SELECT doc_id, cluster_id,
               CASE WHEN b < 8000 THEN 'train'
                    WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id, cluster_id,
                     ('0x' || substr(md5('splitsafe:'
                        || CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT
                       % 10000 AS b
              FROM cl)
        ORDER BY doc_id
    """

# IVF nprobe recall sweep (extensions.sim_ivf_probe_sweep): each probe
# setting's full IVF query is the sim_ann_ivf SQL with its probe bound
# rewritten, run as a subquery against the exact-top-k reference
def _ivf_at_nprobe(np_: int) -> str:
    sql = EXTENSION_ORACLE["sim_ann_ivf"]
    assert sql.count("rn <= 2") == 1
    return sql.replace("rn <= 2", f"rn <= {np_}")


_IVF_SWEEP_STATS = "\n          UNION ALL\n".join(
    f"""          SELECT {np_} AS nprobe,
                 (SELECT COUNT(*) FROM m{np_}) AS n_out,
                 (SELECT COUNT(*) FROM m{np_} m
                   JOIN exact e ON e.q_id = m.q_id
                    AND e.cand_id = m.cand_id) AS n_hit"""
    for np_ in (1, 2, 4)
)
_IVF_SWEEP_SUBQ = ",\n".join(
    f"""        m{np_} AS (
          SELECT q_id, cand_id FROM ({_ivf_at_nprobe(np_)}))"""
    for np_ in (1, 2, 4)
)
# exact reference at the IVF top-k (3), not sim_topk_cosine's 5
_EXACT_AT_ANN_TOPK = EXTENSION_ORACLE["sim_topk_cosine"]
assert _EXACT_AT_ANN_TOPK.count("rank <= 5") == 1
_EXACT_AT_ANN_TOPK = _EXACT_AT_ANN_TOPK.replace("rank <= 5", "rank <= 3")

EXTENSION_ORACLE["sim_ivf_probe_sweep"] = f"""
        WITH exact AS (
          SELECT q_id, cand_id
          FROM ({_EXACT_AT_ANN_TOPK})),
{_IVF_SWEEP_SUBQ},
        ne AS (SELECT COUNT(*) AS n_exact FROM exact),
        stats AS (
{_IVF_SWEEP_STATS})
        SELECT CAST(nprobe AS BIGINT) AS nprobe,
               CAST(n_out AS BIGINT) AS n_out,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(ne.n_exact AS BIGINT) AS n_exact,
               ROUND(n_hit / CAST(ne.n_exact AS DOUBLE), 6) AS recall_r
        FROM stats CROSS JOIN ne ORDER BY nprobe
    """

# block-mean content signature (extensions.multimodal_phash): identical
# p * B // n block rule per character, integer cross-multiplied bit test
EXTENSION_ORACLE["multimodal_phash"] = """
        WITH ch AS (
          SELECT doc_id, strlen(text) AS n,
                 unnest(string_split(text, '')) AS c,
                 generate_subscripts(string_split(text, ''), 1) - 1 AS p
          FROM documents WHERE strlen(text) >= 32),
        bl AS (
          SELECT doc_id, n, CAST(p * 32 // n AS BIGINT) AS i,
                 ascii(c) AS b
          FROM ch),
        agg AS (
          SELECT doc_id, n, i, SUM(b) AS s, COUNT(*) AS cnt
          FROM bl GROUP BY doc_id, n, i),
        tot AS (SELECT doc_id, SUM(s) AS total FROM agg GROUP BY doc_id),
        bits AS (
          SELECT a.doc_id, a.n, a.i,
                 CASE WHEN a.s * a.n > t.total * a.cnt
                      THEN 1 ELSE 0 END AS bit
          FROM agg a JOIN tot t ON t.doc_id = a.doc_id)
        SELECT doc_id,
               CAST(MAX(n) AS BIGINT) AS n_bytes,
               CAST(SUM(bit * (CAST(1 AS BIGINT) << i)) AS BIGINT) AS sig,
               CAST(SUM(bit) AS BIGINT) AS n_ones
        FROM bits GROUP BY doc_id ORDER BY doc_id
    """

# perceptual near-dup pairs (extensions.multimodal_near_dup): the
# multimodal_phash signature CTE verbatim, 4x8-bit band candidacy
# replayed in SQL (parity checks the pigeonhole filter itself), one
# bit_count(xor) verify per candidate
EXTENSION_ORACLE["multimodal_near_dup"] = f"""
    WITH sigs AS ({EXTENSION_ORACLE["multimodal_phash"]}),
    bands AS (
      SELECT doc_id, sig, b.band AS band,
             (sig >> (b.band * 8)) & 255 AS bv
      FROM sigs, (SELECT unnest([0, 1, 2, 3]) AS band) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.sig AS sig_a, b.sig AS sig_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
    ORDER BY doc_a, doc_b
"""


# --- round 11, batch 6 ---------------------------------------------------

# per-source token-budget fill (extensions.pipe_token_budget): identical
# md5 walk order + windowed running sum; 800 mirrors extensions.TOKEN_BUDGET
EXTENSION_ORACLE["pipe_token_budget"] = f"""
        SELECT doc_id, source, n_tokens, cum_tokens,
               cum_tokens <= 800 AS selected
        FROM (SELECT doc_id, source, n_tokens,
                     CAST(SUM(n_tokens) OVER (
                         PARTITION BY source ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
              FROM (SELECT doc_id, source,
                           CAST(len(list_filter(string_split(lower(text), ' '),
                                                x -> x <> '')) AS BIGINT)
                               AS n_tokens,
                           {H.format(x="'budget:' || CAST(doc_id AS VARCHAR)")}
                               AS h
                    FROM documents))
        ORDER BY doc_id
    """

# cross-source near-dup matrix (extensions.dedup_cross_source): the
# ngram-Jaccard oracle as a subquery, rolled up by normalized source pair
EXTENSION_ORACLE["dedup_cross_source"] = f"""
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM ({EXTENSION_ORACLE["dedup_ngram_jaccard"]}) pr
        JOIN documents da ON pr.id_a = da.doc_id
        JOIN documents db ON pr.id_b = db.doc_id
        GROUP BY 1, 2
        ORDER BY 1, 2
    """

# fixed-point quantized (id, label, dim, qd) rows + exact integer class
# centroids on the 1e-6 grid - shared by the two centroid queries; the
# FLOOR(double) is safe because numerator < 2^53 (exact) and quotient
# granularity 1/n dwarfs double rounding error
_CENTROID_Q = """
  q AS (
    SELECT vec_id AS id, label, i - 1 AS d,
           CAST(ROUND(x * 1000, 0) AS BIGINT) AS qd
    FROM (SELECT vec_id, label,
                 unnest(CAST(embedding AS DOUBLE[])) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)),
  cent AS (
    SELECT label AS c_label, d,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(FLOOR(CAST(SUM(qd) AS DOUBLE) * 1000 / COUNT(*)) AS BIGINT)
               AS c
    FROM q GROUP BY 1, 2)
"""

# nearest-class-mean confusion matrix (extensions.sim_nearest_centroid):
# exact integer distances, argmin = MIN(dist * 1024 + label)
EXTENSION_ORACLE["sim_nearest_centroid"] = f"""
        WITH {_CENTROID_Q},
        dist AS (
          SELECT q.id, q.label, c.c_label,
                 CAST(SUM((q.qd * 1000 - c.c) * (q.qd * 1000 - c.c))
                      AS BIGINT) AS dd
          FROM q JOIN cent c ON q.d = c.d
          GROUP BY 1, 2, 3),
        pred AS (
          SELECT id, label,
                 CAST(MIN(dd * 1024 + c_label) % 1024 AS BIGINT) AS label_pred
          FROM dist GROUP BY 1, 2)
        SELECT label AS label_true, label_pred,
               CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """

# per-label dispersion (extensions.sim_cluster_stats): own-centroid
# distances only; HUGEINT-exact sum cast to double once, rescaled to
# original embedding units (/ 1e12) BEFORE the 6-decimal round (rounding
# at the raw ~1e12 grid magnitude is sub-ulp and engine-divergent)
EXTENSION_ORACLE["sim_cluster_stats"] = f"""
        WITH {_CENTROID_Q},
        norms AS (
          SELECT c_label, MAX(n_vecs) AS n_vecs,
                 CAST(SUM(c * c) AS BIGINT) AS centroid_norm_sq
          FROM cent GROUP BY 1),
        dist AS (
          SELECT q.id, q.label,
                 CAST(SUM((q.qd * 1000 - c.c) * (q.qd * 1000 - c.c))
                      AS BIGINT) AS dd
          FROM q JOIN cent c ON q.d = c.d AND q.label = c.c_label
          GROUP BY 1, 2),
        agg AS (SELECT label, SUM(dd) AS sum_d FROM dist GROUP BY 1)
        SELECT n.c_label AS label, n.n_vecs, n.centroid_norm_sq,
               ROUND(CAST(a.sum_d AS DOUBLE) / 1e12 / n.n_vecs, 6)
                   AS mean_dist_r
        FROM norms n JOIN agg a ON a.label = n.c_label
        ORDER BY label
    """

# per-vector own-class outliers (extensions.sim_outliers /
# similarity.centroid_outliers): the polluted-store derivation
# (vec_id % 41 == 0 scaled x3, in DOUBLE - the engine casts to double
# before scaling so the multiply is the same IEEE op) replayed ahead of
# the centroid grid CTEs, which are rebound onto the derived table;
# then per-vector exact dd, |labels|-row sums, the engine's division
# order, NULL ratio / false flag for zero-mean classes
_CENTROID_Q_POLLUTED = _CENTROID_Q.replace("FROM embeddings", "FROM polluted")

EXTENSION_ORACLE["sim_outliers"] = f"""
        WITH polluted AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 41 = 0
                      THEN list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * 3)
                      ELSE CAST(embedding AS DOUBLE[]) END AS embedding,
                 label
          FROM embeddings),
        {_CENTROID_Q_POLLUTED},
        dist AS (
          SELECT q.id, q.label,
                 CAST(SUM((q.qd * 1000 - c.c) * (q.qd * 1000 - c.c))
                      AS BIGINT) AS dd
          FROM q JOIN cent c ON q.d = c.d AND q.label = c.c_label
          GROUP BY 1, 2),
        agg AS (SELECT label, CAST(SUM(dd) AS BIGINT) AS sum_d,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM dist GROUP BY 1)
        SELECT d.id AS vec_id, d.label,
               ROUND(CAST(d.dd AS DOUBLE) / 1e12, 6) AS dist_r,
               ROUND(CAST(a.sum_d AS DOUBLE) / 1e12 / a.n, 6) AS mean_dist_r,
               CASE WHEN a.sum_d > 0
                    THEN ROUND((CAST(d.dd AS DOUBLE) / 1e12)
                               / (CAST(a.sum_d AS DOUBLE) / 1e12 / a.n), 6)
                    END AS ratio_r,
               COALESCE(CASE WHEN a.sum_d > 0
                    THEN ROUND((CAST(d.dd AS DOUBLE) / 1e12)
                               / (CAST(a.sum_d AS DOUBLE) / 1e12 / a.n), 6)
                         >= 4.0 END, FALSE) AS is_outlier
        FROM dist d JOIN agg a USING (label)
        ORDER BY vec_id
    """

# boilerplate gram exposure (extensions.text_boilerplate): shared k-gram
# rows, df >= 2 survivors, per-doc position counts; 8/2 mirror
# extensions.BOILER_K / BOILER_MIN_DF
EXTENSION_ORACLE["text_boilerplate"] = f"""
        WITH g AS ({_kgram_rows_sql(8)}),
        bl AS (
          SELECT s FROM (SELECT s, COUNT(DISTINCT id) AS df_docs
                         FROM g GROUP BY 1)
          WHERE df_docs >= 2),
        nb AS (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS n_boiler
          FROM g JOIN bl USING (s) GROUP BY 1),
        base AS (
          SELECT doc_id AS id,
                 CAST(GREATEST(0,
                      len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) - 7) AS BIGINT)
                     AS n_grams
          FROM documents)
        SELECT base.id, n_grams,
               COALESCE(n_boiler, 0) AS n_boiler,
               CASE WHEN n_grams > 0
                    THEN ROUND(COALESCE(n_boiler, 0) / n_grams, 6)
                    ELSE 0.0 END AS boiler_frac
        FROM base LEFT JOIN nb ON nb.id = base.id
        ORDER BY base.id
    """


# --- round 11, batch 7 ---------------------------------------------------

# per-doc unigram entropy (extensions.text_entropy): the NAIVE road -
# explode to (doc, word) rows + two GROUP BYs - vs the engine's row-local
# array fold; terms snapped to integer nanonats exactly as the engine
# does; the documents-spine LEFT JOIN keeps zero-token docs (which the
# engine emits as (id, 0, 0, 0.0) but unnest would silently drop)
EXTENSION_ORACLE["text_entropy"] = """
        WITH tok AS (
          SELECT doc_id AS id,
                 unnest(list_filter(string_split(lower(text), ' '),
                                    x -> x <> '')) AS w
          FROM documents),
        n AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens
              FROM tok GROUP BY 1),
        c AS (SELECT id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        t AS (
          SELECT c.id,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CAST(ROUND((c.c / n.n_tokens)
                                     * ln(c.c / n.n_tokens) * 1e9, 0)
                               AS BIGINT)) AS BIGINT) AS nanonats
          FROM c JOIN n USING (id) GROUP BY c.id)
        SELECT d.doc_id AS id,
               COALESCE(n.n_tokens, 0) AS n_tokens,
               COALESCE(t.n_distinct, 0) AS n_distinct,
               COALESCE(ROUND(-(CAST(t.nanonats AS DOUBLE) / 1e9) + 0.0, 6),
                        0.0) AS entropy_r
        FROM documents d
        LEFT JOIN n ON n.id = d.doc_id
        LEFT JOIN t ON t.id = d.doc_id
        ORDER BY d.doc_id
    """

# per-dimension embedding moments (extensions.sim_dim_stats): exact
# integer sums on the 1e-3 grid, double moments rescaled to original
# units before the round; +0.0 signed-zero canonicalization AFTER the
# round (the sim_pca_gram rule - inside the round it preserves the
# engines' -0.0-vs-+0.0 disagreement for true values in (-0.5e-6, 0))
EXTENSION_ORACLE["sim_dim_stats"] = """
        WITH dims AS (
          SELECT i - 1 AS d, CAST(ROUND(x * 1000, 0) AS BIGINT) AS qd
          FROM (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings)),
        agg AS (
          SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(qd) AS BIGINT) AS s,
                 CAST(SUM(qd * qd) AS BIGINT) AS s2,
                 CAST(SUM(CASE WHEN qd = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_zero
          FROM dims GROUP BY 1)
        SELECT d, n,
               ROUND((CAST(s AS DOUBLE) / n) / 1e3, 6) + 0.0 AS mean_r,
               ROUND((CAST(s2 AS DOUBLE) / n
                      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                     / 1e6, 6) + 0.0 AS var_r,
               n_zero
        FROM agg ORDER BY d
    """


# domain-interleaved stream order (extensions.pipe_interleave): per-source
# md5-walk rank, then a global row_number over (within_rank, source, id)
EXTENSION_ORACLE["pipe_interleave"] = f"""
        SELECT doc_id, source, within_rank,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY within_rank, source, doc_id) AS BIGINT)
                   AS stream_pos
        FROM (SELECT doc_id, source,
                     CAST(ROW_NUMBER() OVER (
                         PARTITION BY source ORDER BY h, doc_id) AS BIGINT)
                         AS within_rank
              FROM (SELECT doc_id, source,
                           {H.format(
                               x="'interleave:' || CAST(doc_id AS VARCHAR)")}
                               AS h
                    FROM documents))
        ORDER BY doc_id
    """


# streaming raster (extensions.stream_raster): the oracle IS q20's - the
# streaming drain must equal the batch 2-D binned aggregate bit-for-bit,
# so aliasing (not copying) guarantees the two checks can never drift
from .oracle import CORE_ORACLE as _CORE_ORACLE  # noqa: E402

EXTENSION_ORACLE["stream_raster"] = _CORE_ORACLE["q20"]

# lifecycle_image_stream: the streamed /image PNG pinned per corpus
# (the compose/encode stack is not SQL-expressible; the INDEPENDENT
# derivation - batch bin_2d truncated at the same watermark, run
# through the same compositor - lives in tests/test_round13.py, this
# pin makes it driver-visible, exactly the lifecycle_image pattern).
# Regenerate literals after any legitimate render/fixture change by
# running the query at sf0.001/sf0.01 and copying the row.
EXTENSION_ORACLE["lifecycle_image_stream"] = """
    WITH pinned(n_events, axis, width, height, n_lit,
                pixel_sha256, y0, y1) AS (
      VALUES
        (1000, 0, 200, 120, CAST(84 AS BIGINT),
         'b274f10aecaed392a3aa79a2bbab66bc23331a3b682d713021428b903720ae80',
         CAST('-12.3945' AS DOUBLE), CAST('279.6445' AS DOUBLE)),
        (10000, 0, 200, 120, CAST(97 AS BIGINT),
         '93582aca34fdfcc4a489f296ba94508866359127b83ecc1c77dc1f012a5a3654',
         CAST('-12.258500000000002' AS DOUBLE),
         CAST('260.9485' AS DOUBLE)))
    SELECT axis, width, height, n_lit, pixel_sha256, y0, y1
    FROM pinned
    WHERE n_events = (SELECT COUNT(*) FROM events)
    ORDER BY axis
"""

# hybrid retrieval RRF (NEW r14, mirrors extensions.sim_hybrid_rrf):
# the text_bm25 statistics/scoring CTEs + the sim_topk_cosine ranking,
# each reduced to its top-20 (ORDER BY score DESC, id ASC - the
# engine's TakeOrdered bound), fused full-outer with Cormack's
# 1/(60+rank). CAST(1 AS DOUBLE): DuckDB's bare 1.0 literal is DECIMAL
# and decimal division diverges from the engine's IEEE double in the
# 6th decimal; the engine sums lex-then-vec in the same order.
EXTENSION_ORACLE["sim_hybrid_rrf"] = f"""
    WITH {_VECS},
    t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents),
    st AS (
      SELECT COUNT(*) AS n, ROUND(AVG(len(toks)), 6) AS avgdl FROM t),
    dfs AS (
      SELECT {", ".join(
        f"SUM(CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0"
        f" THEN 1 ELSE 0 END) AS df{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM t),
    idf AS (
      SELECT {", ".join(
        f"ROUND(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1), 6) AS idf{i}"
        for i in range(len(_BM25_TERMS)))}
      FROM st, dfs),
    bm AS (
      SELECT doc_id,
             ROUND({" + ".join(
               f"idf{i} * tf{i} * 2.2 / (tf{i} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
               for i in range(len(_BM25_TERMS)))}, 6) AS bm25
      FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
                   {", ".join(
                     f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
                     for i, t in enumerate(_BM25_TERMS))}
            FROM t), st, idf),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC)
                  AS BIGINT) AS lex_rank
      FROM (SELECT doc_id, bm25 FROM bm
            ORDER BY bm25 DESC, doc_id ASC LIMIT 20)),
    vscored AS (
      SELECT c.id AS doc_id,
             ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
      FROM vecs q JOIN vecs c ON c.id != q.id
      WHERE q.id = 0),
    vranked AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos_r DESC, doc_id ASC)
                  AS BIGINT) AS vec_rank
      FROM vscored),
    vec AS (SELECT doc_id, vec_rank FROM vranked WHERE vec_rank <= 20)
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
           ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank),
                          CAST(0 AS DOUBLE))
                 + COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank),
                            CAST(0 AS DOUBLE)), 6) AS rrf_r
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf_r DESC, doc_id
"""

# hard-negative mining (NEW r14, mirrors extensions.sim_hard_negatives):
# the sim_topk_cosine ranking with the cross-class constraint folded
# into the join condition - top-5 most-similar DIFFERENT-label vectors
# per query, round-6 cosine, id tie-break.
EXTENSION_ORACLE["sim_hard_negatives"] = """
    WITH lvecs AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm,
             label
      FROM embeddings),
    scored AS (
      SELECT q.id AS q_id, c.id AS cand_id, c.label AS cand_label,
             ROUND(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos_r
      FROM lvecs q JOIN lvecs c
        ON c.id != q.id AND c.label != q.label
      WHERE q.id < 10),
    ranked AS (
      SELECT q_id, cand_id, cand_label, cos_r,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos_r DESC, cand_id ASC)
                  AS BIGINT) AS rank
      FROM scored)
    SELECT q_id, cand_id, cand_label, cos_r, rank FROM ranked
    WHERE rank <= 5 ORDER BY q_id, rank
"""

# image-text alignment gate (NEW r19, mirrors
# extensions.multimodal_alignment - VERDICT r18 #5, the CLIP-score
# curation stage): independent replay of BOTH towers from the documents
# table (the "image" payload is the UTF-8 text bytes, ASCII corpus, so
# the per-word md5 walk is byte-identical), the doc_id % 7 caption swap,
# the exact integer sparse dot / sqrt-norm cosine at round-6, the 0.93
# keep cut and the per-source retention rollup. Constants mirror
# multimodal.ALIGN_DIM=64 / ALIGN_TF_CAP=3 and
# extensions.ALIGN_MISALIGN_EVERY=7 / ALIGN_MIN_COS=0.93.
EXTENSION_ORACLE["multimodal_alignment"] = f"""
    WITH wc AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS w
            FROM documents)
      GROUP BY doc_id, w),
    img AS (
      SELECT doc_id, {H.format(x="w")} % 64 AS dim, SUM(n) AS iw
      FROM wc GROUP BY 1, 2),
    txt AS (
      SELECT doc_id, {H.format(x="w")} % 64 AS dim,
             SUM(LEAST(n, 3)) AS tw
      FROM wc GROUP BY 1, 2),
    in2 AS (SELECT doc_id, SUM(iw * iw) AS n2 FROM img GROUP BY doc_id),
    tn2 AS (SELECT doc_id, SUM(tw * tw) AS n2 FROM txt GROUP BY doc_id),
    pairs AS (
      SELECT d.doc_id AS img_id, c.doc_id AS cap_id, d.source
      FROM documents d
      JOIN documents c
        ON c.doc_id = CASE WHEN d.doc_id % 7 = 0 THEN d.doc_id + 1
                           ELSE d.doc_id END),
    dots AS (
      SELECT p.img_id, p.cap_id, SUM(i.iw * t.tw) AS dot
      FROM pairs p
      JOIN img i ON i.doc_id = p.img_id
      JOIN txt t ON t.doc_id = p.cap_id AND t.dim = i.dim
      GROUP BY 1, 2),
    scored AS (
      SELECT p.img_id, p.source,
             CASE WHEN a.n2 > 0 AND b.n2 > 0 THEN
               ROUND(COALESCE(d.dot, 0) / (sqrt(a.n2) * sqrt(b.n2)), 6)
             END AS score
      FROM pairs p
      LEFT JOIN dots d ON d.img_id = p.img_id AND d.cap_id = p.cap_id
      JOIN in2 a ON a.doc_id = p.img_id
      JOIN tn2 b ON b.doc_id = p.cap_id)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN score >= 0.93 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN score >= 0.93 THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS retention_r,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY source ORDER BY source
"""

# streaming ANN index append (NEW r19, mirrors
# extensions.stream_index_append - VERDICT r18 #8): PQ encoding is
# per-row, so the stream's foreachBatch append-encode against reloaded
# frozen codebooks must land the identical code table as the batch
# append, which itself equals one full re-encode against base-trained
# codebooks - sim_index_append's unrolled SQL verbatim. The engine-side
# exactly-once contracts (codes_exact: n_vectors * PQ_M rows, all
# (id, m) keys distinct, across a mid-stream restart;
# resumed_only_delta: phase 2 read exactly the late files) are derived
# on the Spark side and pinned true here (the sim_mips aug_ok
# discipline) - a replayed duplicate batch, a lost append file, or a
# directory re-read on restart flips the hash.
EXTENSION_ORACLE["stream_index_append"] = f"""
    SELECT q_id, cand_id, acos_r, rank,
           true AS codes_exact, true AS resumed_only_delta
    FROM ({EXTENSION_ORACLE["sim_index_append"]})
    ORDER BY q_id, rank
"""
