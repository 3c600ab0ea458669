#!/usr/bin/env python
"""Capture .explain("formatted") for named declared queries into
plans/r20/<query>_<tag>.txt (the optimization round's plan evidence;
the judge checks plan claims against these files).

Each query is captured in a FRESH subprocess (VERDICT r19 #4: several
r19 "before" dumps were captured with a session memo already warm, so
before/after pairs showed the same post-memo shape). A cold process
shows a memoized family's FULL derivation; pass --warm to execute the
query once first (materializing the session checkpoints it reads) so
the dump shows the steady-state consumer shape instead. Tag your files
accordingly (convention: `_before` / `_after` cold, `_after_warm` for
the steady-state tail of a memo consumer).

Usage: python tools/capture_plan.py [--warm] TAG QUERY [QUERY ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, %(here)r)
name, tag, warm = %(name)r, %(tag)r, %(warm)r
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from web_maxiv_hdbppviewer_spark.session import get_spark
import __spark_entry__ as entry_mod

spark = get_spark(app_name="capture-plan")
queries = entry_mod.queries()
if warm:
    # materialize the session memos this query reads, then re-derive:
    # the second construction's plan is the steady-state consumer shape
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
df = queries[name](spark, sf_dir)
plan = df._sc._jvm.PythonSQLUtils.explainString(
    df._jdf.queryExecution(), "formatted"
)
out_dir = os.path.join(%(here)r, "plans", "r20")
os.makedirs(out_dir, exist_ok=True)
path = os.path.join(out_dir, f"{name}_{tag}.txt")
with open(path, "w") as f:
    f.write(plan)
print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)", flush=True)
"""


def main() -> None:
    args = sys.argv[1:]
    warm = False
    if args and args[0] == "--warm":
        warm = True
        args = args[1:]
    tag = args[0]
    names = args[1:]
    for name in names:
        code = _CHILD % {"here": HERE, "name": name, "tag": tag, "warm": warm}
        subprocess.run([sys.executable, "-c", code], check=True)


if __name__ == "__main__":
    main()
