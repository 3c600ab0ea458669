#!/usr/bin/env python
"""Isolated-median adjudication protocol (VERDICT r15 #2 / r16 #2).

The sandbox has roaming slow phases; a single in-battery line (or even a
battery-end reprobe, r16's false-confirm) cannot distinguish host phase
from regression. The standing adjudicator is this protocol: for each
named query, a FRESH process runs 1 warmup + 3 timed executions at
$SPARK_GRAFT_SF_DIR and the median of the 3 is the query's settled
number. Calibration probes (md5 and shuffle, the bench.py pair) bracket
the runs so the reading itself carries phase evidence.

Usage:  python tools/isolated_median.py QUERY [QUERY ...]
Prints one JSON line per query; parent process spawns one child per
query so no state (JVM, memos, page cache beyond the OS) is shared
between adjudications.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, statistics, sys, time
sys.path.insert(0, %(here)r)
name = %(name)r
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from web_maxiv_hdbppviewer_spark.session import get_spark
import __spark_entry__ as entry_mod

spark = get_spark(app_name="isolated-median")
q = entry_mod.queries()[name]

def cal():
    import hashlib
    t0 = time.perf_counter()
    h = hashlib.md5()
    blk = bytes(range(256)) * 4096
    for _ in range(64):
        h.update(blk)
    spark.range(0, 1 << 22, 1, 32).selectExpr("sum(id)").write.format(
        "noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)

def shufcal():
    t0 = time.perf_counter()
    spark.range(0, 1 << 21, 1, 32).selectExpr(
        "id %% 9973 AS k", "id AS v"
    ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)

cal0, shuf0 = cal(), shufcal()
q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(round(time.perf_counter() - t0, 4))
cal1, shuf1 = cal(), shufcal()
print("ISOLATED " + json.dumps({
    "query": name,
    "warm_runs_s": runs,
    "median_s": round(statistics.median(runs), 4),
    "host_cal_s": [cal0, cal1],
    "shuffle_cal_s": [shuf0, shuf1],
    "sf_dir": sf_dir,
}, separators=(",", ":")), flush=True)
"""


def main() -> None:
    results = []
    for name in sys.argv[1:]:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD % {"here": HERE, "name": name}],
            capture_output=True,
            text=True,
            cwd=HERE,
        )
        line = next(
            (
                ln[len("ISOLATED "):]
                for ln in proc.stdout.splitlines()
                if ln.startswith("ISOLATED ")
            ),
            None,
        )
        if line is None:
            print(
                json.dumps(
                    {"query": name, "error": proc.stderr[-500:]},
                    separators=(",", ":"),
                ),
                flush=True,
            )
            continue
        results.append(json.loads(line))
        print(line, flush=True)
    if results:
        print(
            json.dumps(
                {
                    "protocol": "isolated_median",
                    "medians": {
                        r["query"]: r["median_s"] for r in results
                    },
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
