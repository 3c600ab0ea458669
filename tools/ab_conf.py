#!/usr/bin/env python
"""A/B a runtime-settable SQLConf over a fixed query subset in ONE
session, interleaved ABAB to cancel warm-order effects.

Usage: python tools/ab_conf.py CONF VALUE_A VALUE_B QUERY [QUERY ...]
Prints per-phase totals; read the A-vs-B deltas, not absolutes.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    conf, val_a, val_b = sys.argv[1:4]
    names = sys.argv[4:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="ab-conf")
    queries = entry_mod.queries()
    queries["q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def run_subset() -> float:
        t0 = time.perf_counter()
        for n in names:
            queries[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        return round(time.perf_counter() - t0, 4)

    results: list[tuple[str, float]] = []
    for phase, val in (("warm", val_a), ("A1", val_a), ("B1", val_b),
                       ("A2", val_a), ("B2", val_b), ("A3", val_a),
                       ("B3", val_b)):
        spark.conf.set(conf, val)
        results.append((phase, run_subset()))
        print(f"{phase} ({conf}={val}): {results[-1][1]}", flush=True)
    a = sorted(t for p, t in results if p.startswith("A"))
    b = sorted(t for p, t in results if p.startswith("B"))
    print(f"A median {a[len(a)//2]}  B median {b[len(b)//2]}")


if __name__ == "__main__":
    main()
