#!/usr/bin/env python
"""Per-dump dedup ablation at the 100x rung (VERDICT r17 #8 stretch).

pipe_dump_dedup measures FineWeb's per-snapshot-vs-global dedup question
(Penedo et al. 2024 §4.4) at bench scale, where the fixed-cost floor
dominates. This runs the SAME declared query over the 100x token-remapped
corpus (measure_linearity_100x.py's construction, reused on disk): 100
copies of sf0.1/documents, copy k token-suffixed `_k` and id-offset by
k*n, so within-copy near-dup structure is preserved exactly, cross-copy
shingles never collide, and the TRUE pair workload is exactly 100x - the
scale where the minhash-LSH pair term is measured above the floor
(LINEARITY_100X_r17.json: candidates and verified pairs both exactly
100x).

Dump assignment stays dump = doc_id % 5 (the query's own derivation).
Under the k*n id offset with n % 5 != 0 the 100 copies rotate through
the residues, so each dump holds a 1/5 corpus-slice whose near-dup
partners mostly live in OTHER dumps - the heavy-cross-dump-overlap
regime the ablation exists to expose (at bench scale most duplicate
partners are same-dump by construction density; at 100x the global and
per-dump verdicts separate much harder).

Records first/steady wall-clock at sf0.1 and 100x, plus the full 5-row
verdict tables (bounded driver values) and the aggregate retention gap.

Run from the repo root:  python tools/measure_dump_dedup_100x.py
Writes DUMP_DEDUP_100X_r18.json and prints a markdown table for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod
    import tools.measure_linearity_100x as rung

    spark = get_spark(app_name="hdbpp-dump-dedup-100x")
    rung.build_corpus(spark)
    queries = entry_mod.queries()
    q = queries["pipe_dump_dedup"]
    # JVM / codegen / Arrow warmup (the sibling scripts' discipline).
    # Corpus paths come FROM the rung module whose build_corpus writes
    # them, so builder and reader can never diverge (r18 review).
    queries["dedup_exact"](spark, rung.SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {}
    for sf_dir, label in ((rung.SRC, "sf0.1"), (rung.SCRATCH, "sf10x")):
        timings = {}
        rows = None
        # "first" includes the session pair-index build (the memo this
        # query shares with the whole dedup family); "steady" is the
        # ablation's own marginal cost
        for phase in ("first", "steady"):
            t0 = time.perf_counter()
            rows = [r.asDict() for r in q(spark, sf_dir).collect()]
            timings[phase] = round(time.perf_counter() - t0, 3)
            print(
                json.dumps({"corpus": label, "phase": phase,
                            "s": timings[phase]}),
                flush=True,
            )
        kept_g = sum(r["n_kept_global"] for r in rows)
        kept_d = sum(r["n_kept_dump"] for r in rows)
        n_docs = sum(r["n_docs"] for r in rows)
        out[label] = {
            "first_s": timings["first"],
            "steady_s": timings["steady"],
            "n_docs": n_docs,
            "kept_global": kept_g,
            "kept_dump": kept_d,
            "extra_docs_kept_by_dump_mode": kept_d - kept_g,
            "rows": rows,
        }

    with open(os.path.join(HERE, "DUMP_DEDUP_100X_r18.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    print("\n| corpus | docs | kept global | kept per-dump | extra kept |"
          " first | steady |")
    print("|---|---|---|---|---|---|---|")
    for label in ("sf0.1", "sf10x"):
        r = out[label]
        print(
            f"| {label} | {r['n_docs']} | {r['kept_global']} |"
            f" {r['kept_dump']} | {r['extra_docs_kept_by_dump_mode']} |"
            f" {r['first_s']} s | {r['steady_s']} s |"
        )


if __name__ == "__main__":
    main()
