"""Mirror of the driver's correctness gate: every declared query's Spark
result must equal its DuckDB oracle on the same parquet (sf0.001 here for
speed; the driver runs sf0.01).

Comparison is strict: columns aligned by sorted name, rows sorted by all
columns, exact equality for every cell (the query battery is engineered so
float results are bit-identical across engines - see plans/oracle.py).
"""

import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


def _check_lifecycle_image(sdf):
    """Non-vacuous rows-only invariants (the full pinned-digest oracle
    lives in tests/test_raster_png.py): one row per requested axis
    (y_axis = u % 2 over 8 attrs -> 2 axes), the requested viewport, lit
    pixels on every axis, well-formed sha256, finite padded y-range."""
    assert len(sdf) == 2, f"expected one row per axis, got {len(sdf)}"
    assert sorted(sdf["axis"]) == [0, 1]
    assert (sdf["width"] == 200).all() and (sdf["height"] == 120).all()
    assert (sdf["n_lit"] > 0).all()
    assert sdf["pixel_sha256"].str.fullmatch(r"[0-9a-f]{64}").all()
    assert (sdf["y0"] < sdf["y1"]).all()


# every declared query WITHOUT an oracle twin must register a real
# invariant here - an unregistered name fails instead of vacuously passing.
# (As of r12 every query is oracle-twinned - lifecycle_image got a
# pinned-digest oracle - so this path is currently dormant; the
# lifecycle_image invariant stays registered as the fallback if the pin
# is ever dropped.)
ROWS_ONLY_CHECKS = {
    "lifecycle_image": _check_lifecycle_image,
}


def _canon(df):
    """pandas frame -> (sorted col names, sorted row tuples with canonical cells)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                # repr, not float: python's == equates -0.0 with +0.0 but
                # the driver's value-hash does not (r10: sim_pca_gram cell
                # (5,9) was -0.0 in DuckDB vs +0.0 in Spark and flipped
                # the hash while being ==-equal). repr('-0.0') != '0.0'
                # makes the local gate exactly as strict as the driver's.
                canon_row.append(repr(float(v)))
            elif hasattr(v, "item"):  # numpy scalar
                item = v.item()
                if isinstance(item, float):
                    item = None if math.isnan(item) else repr(item)
                canon_row.append(item)
            else:
                canon_row.append(v)
        out.append(tuple(canon_row))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return cols, out


@pytest.mark.parametrize("name", sorted(QUERIES, key=lambda n: (len(n), n)))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    if name not in ORACLE:
        check = ROWS_ONLY_CHECKS.get(name)
        assert check is not None, (
            f"{name} has no oracle twin and no registered rows-only invariant"
        )
        check(sdf)
        return
    ddf = duck.sql(ORACLE[name]).df()
    s_cols, s_rows = _canon(sdf)
    d_cols, d_rows = _canon(ddf)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    # numeric FAMILY must agree too: python equates 5 == 5.0, but the
    # driver's value-hash need not - a DuckDB HUGEINT (e.g. an uncast SUM)
    # arrives as float64 and would silently pass the cell comparison below
    fam = lambda k: "f" if k == "f" else ("i" if k in "iu" else k)  # noqa: E731
    for c in s_cols:
        sk, dk = sdf[c].dtype.kind, ddf[c].dtype.kind
        assert not ({fam(sk), fam(dk)} == {"i", "f"}), (
            f"{name}.{c}: dtype family differs: spark {sdf[c].dtype} vs oracle {ddf[c].dtype}"
        )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_multimodal_corpus_is_ascii(duck):
    """The multimodal_extract oracle equates ascii(char) with the UTF-8 byte
    value, which holds only for ASCII text; the Spark kernel averages raw
    payload bytes. Assert the assumption so corpus drift breaks loudly."""
    non_ascii = duck.sql(
        "SELECT COUNT(*) FROM documents WHERE octet_length(encode(text)) != strlen(text)"
    ).fetchone()[0]
    assert non_ascii == 0
