#!/usr/bin/env python
"""Generate INVENTORY.md: the machine-derived battery inventory
(VERDICT r14 #6).

One row per declared query: where it is implemented (query function
file:line - whose docstring cites the operator modules and reference
lines), its oracle kind, the freshest driver-witness round from the
committed CORRECTNESS_r*.json ledger, and its latest local bench line
from BENCH_LOCAL.json (with the auto-reprobe reading when one was
taken). The table is generated from the artifacts, never hand-edited;
tests/test_inventory.py checks the committed file is current for the
artifact set it was generated from (footer fingerprint), and skips -
documented, not red - across the artifact boundary when a new round's
files land (the next regeneration picks them up).

Run from the repo root:  python tools/gen_inventory.py
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_fingerprint() -> str:
    """Stable hash of the inventory's INPUT SET: the artifact filenames
    plus their query-name payloads (not timings - local bench reruns of
    identical code must not invalidate the committed table)."""
    parts = []
    for p in sorted(
        glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
    ):
        with open(p) as f:
            parts.append(os.path.basename(p) + ":" + ",".join(sorted(json.load(f))))
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def generate() -> str:
    sys.path.insert(0, HERE)
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()

    latest: dict[str, int] = {}
    for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        with open(p) as f:
            for name, rec in json.load(f).items():
                latest[name] = max(latest.get(name, 0), rnd)

    bench: dict[str, float] = {}
    reprobe: dict[str, dict] = {}
    bench_path = os.path.join(HERE, "BENCH_LOCAL.json")
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            detail = json.load(f)
        bench = detail.get("queries", {})
        reprobe = detail.get("reprobe", {})

    lines = [
        "# Battery inventory (generated - do not hand-edit)",
        "",
        "Regenerate with `python tools/gen_inventory.py`. One row per",
        "declared query. `witness` = freshest driver-green round in the",
        "committed CORRECTNESS_r*.json ledger (`-` = declared this round,",
        "not yet driver-witnessed). `bench_s` = the latest local battery",
        "line from BENCH_LOCAL.json at sf0.1 (`(reprobed: x)` = the",
        "battery-end auto re-measure of a >2x-median line, see",
        "BASELINE.md). `oracle` = `sql` (full DuckDB value-hash twin) or",
        "`rows-only` (registered invariant in tests/test_oracle_parity.py).",
        "",
        f"{len(queries)} declared queries.",
        "",
        "| query | implemented at | oracle | witness | bench_s |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(queries):
        fn = inspect.unwrap(queries[name])
        try:
            src = os.path.relpath(inspect.getsourcefile(fn), HERE)
            line = inspect.getsourcelines(fn)[1]
            impl = f"`{src}:{line}`"
        except (TypeError, OSError):
            impl = "`?`"
        okind = "sql" if name in oracle else "rows-only"
        wit = f"r{latest[name]}" if name in latest else "-"
        if name in bench:
            b = f"{bench[name]:.2f}"
            if name in reprobe and name != "_skipped":
                b += f" (reprobed: {reprobe[name]['reprobe_s']:.2f})"
        else:
            b = "-"
        lines.append(f"| {name} | {impl} | {okind} | {wit} | {b} |")
    lines += [
        "",
        f"<!-- inputs: {_artifact_fingerprint()} -->",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    out = generate()
    path = os.path.join(HERE, "INVENTORY.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path} ({out.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
