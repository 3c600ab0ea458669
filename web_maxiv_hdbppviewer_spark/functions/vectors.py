"""Vector column expressions for embedding similarity.

All arithmetic stays JVM-side: ``zip_with`` + ``aggregate`` higher-order
functions over array columns - no Python UDF in the hot path. Embeddings are
cast float->double BEFORE any multiply so products are exact doubles of the
stored float32 values; this makes results reproducible across engines
(float32 multiplies would differ from double multiplies in the last bits).

Scale: dot products are per-row expressions (no shuffle); norms should be
computed once and materialized alongside the vectors (see
operators/similarity.py) so a top-k scan reads (id, vec, norm) and never
recomputes norms inside a join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None, norm_b: Column | None = None) -> Column:
    """Cosine similarity; pass precomputed norms to avoid recomputation in joins."""
    na = norm_a if norm_a is not None else norm(a)
    nb = norm_b if norm_b is not None else norm(b)
    return dot(a, b) / (na * nb)
