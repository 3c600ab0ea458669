#!/usr/bin/env python
"""ANN-ladder linearity at the 100x rung (r18).

The sim-leg 100x study (measure_linearity_sim_100x.py) timed only the
brute-force baseline and adjudicated the LSH lines analytically; this
completes the ladder with the INDEX paths a 100 TB deployment actually
serves from, over the same 200k-vector +-1-isometry corpus (reused on
disk; true near-neighbor workload exactly 100x):

  sim_ann_ivf   - IVF-flat: untrained cells, probe join + exact cosine
                  over ~nprobe/cells of the corpus (expected linear);
  sim_ann_ivfpq - residual IVF-PQ, the production shape: trained coarse
                  quantizer + trained residual codebooks (both
                  corpus-linear k-means passes with bounded collects,
                  memoized per sf_dir - "first" carries the training,
                  "steady" is the serving path) + code-lookup ADC over
                  the probed cells (expected linear);
  sim_topk_pq   - plain PQ ADC over ALL candidates (the 64x-compression
                  full-scan serving path; expected linear like the
                  brute-force baseline).

Same ordering caveat as the sibling scripts: "first" includes session
artifact builds (index training); cross-corpus RATIOS compare like with
like, and steady-vs-steady is the serving-path number.

Run from the repo root:  python tools/measure_ann_100x.py
Writes ANN_100X_r18.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

QUERIES = ["sim_ann_ivf", "sim_ann_ivfpq", "sim_topk_pq"]


def main() -> None:
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod
    import tools.measure_linearity_sim_100x as rung

    spark = get_spark(app_name="hdbpp-ann-100x")
    rung.build_corpus(spark)
    queries = entry_mod.queries()
    # JVM / codegen / Arrow warmup; corpus paths from the rung module
    # that builds them (the builder/reader coupling discipline)
    queries["sim_topk_cosine"](spark, rung.SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((rung.SRC, "sf0.1"), (rung.SCRATCH, "sf10e")):
        for name in QUERIES:
            for phase in ("first", "steady"):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                results.setdefault(name, {})[f"{label}_{phase}"] = dt
                print(
                    json.dumps({"q": name, "corpus": label, "phase": phase,
                                "s": dt}),
                    flush=True,
                )

    with open(os.path.join(HERE, "ANN_100X_r18.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print("\n| query | sf0.1 first | sf0.1 steady | 100x first |"
          " 100x steady | ratio first | ratio steady |")
    print("|---|---|---|---|---|---|---|")
    for name in QUERIES:
        r = results[name]
        rf = round(r["sf10e_first"] / r["sf0.1_first"], 2)
        rs = round(r["sf10e_steady"] / r["sf0.1_steady"], 2)
        print(
            f"| {name} | {r['sf0.1_first']} | {r['sf0.1_steady']} |"
            f" {r['sf10e_first']} | {r['sf10e_steady']} | {rf}x | {rs}x |"
        )


if __name__ == "__main__":
    main()
