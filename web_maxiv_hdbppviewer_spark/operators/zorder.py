"""Z-order (Morton) clustering for multi-dimensional data skipping.

A single-key range layout (operators/compact.py) prunes file min/max
stats on ONE dimension: a predicate on any other column touches every
file. Interleaving the bits of two dimensions into one Morton key and
range-clustering on THAT gives every file a bounded rectangle in
(a, b)-space, so point predicates on EITHER dimension prune to
~sqrt-fraction of the files - the standard lakehouse Z-ORDER BY layout
(Delta/Iceberg/Hudi all ship it; the curve is Morton '66).

Everything here is deterministic integer arithmetic - no sampling, no
RangePartitioner - so bucket assignment, per-bucket min/max envelopes,
and files-touched counts are exactly reproducible by any SQL engine
(the DuckDB oracle replays the identical bit algebra).

All expressions are plain Column arithmetic (shiftleft / bitwise OR /
AND), JVM codegen the whole way; nothing leaves the engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dimension resolution: each dim scaled to [0, 2^ZBITS)
ZBITS = 8


def scale_to_bits(v: Column, vmin: Column, vmax: Column, bits: int = ZBITS) -> Column:
    """Map v in [vmin, vmax] to the integer grid [0, 2^bits): floor
    linear scaling, exact in double for any realistic id/time magnitudes
    (products < 2^53). Constant columns (vmax == vmin) map to 0."""
    span = vmax - vmin + F.lit(1)
    return F.floor((v - vmin) * F.lit(1 << bits) / span).cast("long")


def interleave_bits(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton key of two bits-wide non-negative ints: bit 2i of the
    result is bit i of ``a``, bit 2i+1 is bit i of ``b`` (so the top of
    the key alternates b-MSB, a-MSB, ... and truncating high bits keeps
    a rectangle in both dims). Unrolled OR chain - ``bits`` is a small
    compile-time constant, the whole key is one codegen expression."""
    # Column.__and__/__or__ are LOGICAL operators; bit ops need the
    # explicit bitwiseAND/bitwiseOR methods (and a BIGINT-typed mask).
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def z_bucket(z: Column, n_buckets_log2: int, bits: int = ZBITS) -> Column:
    """Top ``n_buckets_log2`` bits of a 2*bits-wide Morton key: the
    file/bucket id of the z-clustered layout. Buckets are axis-aligned
    rectangles of side 2^(bits - ceil(n/2)) x 2^(bits - floor(n/2))."""
    return F.shiftrightunsigned(z, 2 * bits - n_buckets_log2)


def bucket_envelopes(df, bucket: str, dims: list[str]):
    """Per-bucket min/max envelope of each dimension - exactly the
    parquet footer statistics a scan planner prunes with."""
    aggs = []
    for d in dims:
        aggs += [F.min(d).alias(f"min_{d}"), F.max(d).alias(f"max_{d}")]
    return df.groupBy(bucket).agg(*aggs)


def n_touched(envelopes, dim: str, probe: Column) -> Column:
    """How many buckets a point predicate ``dim = probe`` must scan:
    buckets whose [min, max] envelope contains the probe (aggregate
    expression; use inside .agg on the envelope frame)."""
    hit = (F.col(f"min_{dim}") <= probe) & (probe <= F.col(f"max_{dim}"))
    return F.sum(hit.cast("long"))
