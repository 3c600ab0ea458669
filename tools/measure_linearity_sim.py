#!/usr/bin/env python
"""Corpus-linearity witness, similarity-family leg (extends the r16
dedup-family study in tools/measure_linearity.py).

Builds a 10x EMBEDDINGS corpus (50k vectors) and times the
embedding-heavy headline queries on sf0.1 vs 10x. The interesting risk
here is the banded sign-LSH candidate generation (sim_knn_graph,
dedup_embedding): if bucket populations grow 10x, within-bucket
candidate pairs can grow up to 100x - a super-linear line would be a
real finding, not noise.

The 10x corpus is 10 dimension-ROTATED copies of sf0.1/embeddings
(copy k rotates the 64 dims by 6*k positions and offsets vec_id by
k*5000): rotation preserves every within-copy norm and pairwise cosine
exactly (the true near-neighbor workload is exactly 10x), while
cross-copy cosines fall to the random background, so copies do not
plant artificial near-dups. label rides along unchanged.

Run from the repo root:  python tools/measure_linearity_sim.py
Writes LINEARITY_SIM_r16.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(HERE, "scratch", "sf1e")
COPIES = 10
QUERIES = [
    "sim_topk_cosine",   # brute force: fixed queries x 10x candidates
    "sim_ann_ivfpq",     # trained IVFPQ: probe join over 10x cells
    "dedup_embedding",   # banded sign-LSH pair generation (bucket risk)
    "sim_knn_graph",     # LSH-candidate kNN graph (bucket risk)
]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH, exist_ok=True)
    out = os.path.join(SCRATCH, "embeddings.parquet")
    if not os.path.exists(out):
        base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        n = base.count()
        dim = len(base.select("embedding").first()["embedding"])
        parts = []
        for k in range(COPIES):
            rot = (6 * k) % dim
            parts.append(
                base.select(
                    (F.col("vec_id") + k * n).alias("vec_id"),
                    F.concat(
                        F.slice("embedding", rot + 1, dim - rot),
                        F.slice("embedding", 1, rot),
                    ).alias("embedding"),
                    "label",
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(out)
    from web_maxiv_hdbppviewer_spark.sources.tables import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        if t == "embeddings":
            continue
        link = os.path.join(SCRATCH, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)


def main() -> None:
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="hdbpp-linearity-sim")
    build_corpus(spark)
    queries = entry_mod.queries()
    queries["sim_dim_stats"](spark, SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((SRC, "sf0.1"), (SCRATCH, "sf1x")):
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

    with open(os.path.join(HERE, "LINEARITY_SIM_r16.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print("\n| query | sf0.1 first | sf0.1 steady | 10x first | 10x steady |"
          " ratio first | ratio steady |")
    print("|---|---|---|---|---|---|---|")
    for name in QUERIES:
        r = results[name]
        rf = round(r["sf1x_first"] / r["sf0.1_first"], 2)
        rs = round(r["sf1x_steady"] / r["sf0.1_steady"], 2)
        print(
            f"| {name} | {r['sf0.1_first']} | {r['sf0.1_steady']} |"
            f" {r['sf1x_first']} | {r['sf1x_steady']} | {rf}x | {rs}x |"
        )


if __name__ == "__main__":
    main()
