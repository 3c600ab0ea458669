"""Maintenance helper for the lifecycle_image PINNED-digest oracle.

The oracle (plans/oracle.py "lifecycle_image") is literal rows keyed on
the events row count - one set per corpus the gates run (sf0.001 suite,
sf0.01 driver). If the fixture, the raster/compose/encode stack, or the
testdata ever changes legitimately, the pin must be regenerated; run

    python -m web_maxiv_hdbppviewer_spark.plans.pin_lifecycle_image

and paste the printed VALUES rows into the oracle. The independent
compositor in tests/test_raster_png.py and the pin-triangle test in
tests/test_round12.py both verify the new literals before the driver
ever sees them, so a stale paste fails the suite, not the gate.
"""

from __future__ import annotations


def main() -> None:
    import duckdb

    from ..session import get_spark
    from .queries import lifecycle_image

    spark = get_spark(app_name="pin-lifecycle-image")
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/events.parquet'"
        ).fetchone()[0]
        for r in lifecycle_image(spark, sf_dir).collect():
            print(
                f"            ({n}, {r.axis}, {r.width}, {r.height}, "
                f"CAST({r.n_lit} AS BIGINT),\n"
                f"             '{r.pixel_sha256}',\n"
                f"             CAST('{r.y0!r}' AS DOUBLE), "
                f"CAST('{r.y1!r}' AS DOUBLE)),"
            )


if __name__ == "__main__":
    main()
