#!/usr/bin/env python
"""Corpus-linearity witness, similarity-family 100x rung (extends the
r16 10x sim leg the way measure_linearity_100x.py extends the dedup
leg).

The load-bearing question was the banded sign-LSH candidate generation
(dedup_embedding, sim_knn_graph): within-bucket candidate pairs grow
~bands/2^band_bits * N^2 - QUADRATIC once N >> 2^band_bits. The first
r17 run of this script answered it the hard way: at 200k vectors the
8x8 default generates 776M candidate pairs whose verification join
spilled past the machine's free disk (SPILL_OUT_OF_MEMORY, no space
left on device) - the super-linear finding the three-leg study existed
to surface. The two bucket-risk lines are therefore adjudicated
ANALYTICALLY by tools/measure_lsh_buckets.py (exact per-bucket C(n,2)
census, no pair materialization; LSH_BUCKETS_r17.json measures the
x100-per-decade law and the 4x16 geometry that tames it), and this
script times only sim_topk_cosine - the provably-linear baseline
(fixed queries x 100x candidates).

Corpus construction: 100 copies of sf0.1/embeddings, copy k applying a
deterministic DIAGONAL +-1 isometry (element i multiplied by
sign((k * 1315423911 + i * 2654435761) mod 2)). A diagonal sign flip
preserves every within-copy norm and pairwise cosine EXACTLY (the true
near-neighbor workload is exactly 100x), while cross-copy cosines fall
to the random background. The r16 rotation family cannot go this deep:
rotations by 6k mod dim repeat after dim/gcd(6,dim) copies, and two
copies sharing a rotation would be exact vector duplicates - planted
artificial near-dups. The +-1 family has 2^dim members; the first 100
are all distinct.

Same ordering caveat as the sibling scripts: "first" includes session
artifact builds; cross-corpus RATIOS compare like with like.

Run from the repo root:  python tools/measure_linearity_sim_100x.py
Writes LINEARITY_SIM_100X_r17.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(HERE, "scratch", "sf10e")
COPIES = 100
QUERIES = [
    "sim_topk_cosine",   # brute force: fixed queries x 100x candidates
    # dedup_embedding / sim_knn_graph are NOT timed at 100x: their 8x8
    # sign-LSH candidate join is measured quadratic (LSH_BUCKETS_r17
    # census; the wall-clock attempt exhausted the disk) - the honest
    # 100x number for them is the census, not a timing.
]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH, exist_ok=True)
    out = os.path.join(SCRATCH, "embeddings.parquet")
    if not os.path.exists(out):
        base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        n = base.count()
        k = F.col("k")
        signed = F.transform(
            F.col("embedding"),
            lambda x, i: x
            * ((k * 1315423911 + i.cast("long") * 2654435761) % 2 * 2 - 1)
            .cast("float"),
        )
        spark.range(COPIES).select(
            F.col("id").cast("long").alias("k")
        ).crossJoin(base).select(
            (F.col("vec_id") + k * n).alias("vec_id"),
            signed.alias("embedding"),
            "label",
        ).repartition(64).write.mode("overwrite").parquet(out)
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

    spark = get_spark(app_name="hdbpp-linearity-sim-100x")
    build_corpus(spark)
    queries = entry_mod.queries()
    queries["sim_dim_stats"](spark, SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((SRC, "sf0.1"), (SCRATCH, "sf10e")):
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

    with open(os.path.join(HERE, "LINEARITY_SIM_100X_r17.json"), "w") as f:
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
