#!/usr/bin/env python
"""Exact sign-LSH candidate-volume census (the r17 100x finding).

The wall-clock 100x run of dedup_embedding DIED ON DISK: with the
default 8 bands x 8 bits, candidate pairs are ~bands/2^bits * N^2 -
QUADRATIC once N >> 2^band_bits, and at 500k vectors that is ~8e9
pairs (~hundreds of GB of shuffle). This script measures the exact
candidate volume WITHOUT materializing a single pair - per band, group
by bucket value and sum C(n_bucket, 2) - for each corpus and for two
band geometries over the same 64 hyperplane dots:

  8 x 8  (the dedup_embedding default - high recall, buckets ~N/256)
  4 x 16 (the log2(N)-scaled geometry - buckets ~N/65536)

The reading this produces is the 100 TB design rule: band BIT-WIDTH
must grow with log2(corpus) to keep within-bucket populations bounded
(every production LSH deployment sizes its hash length this way);
band COUNT then buys back recall. The engine exposes both knobs
(similarity.near_dup_pairs bands/band_bits).

Usage: python tools/measure_lsh_buckets.py
Writes LSH_BUCKETS_r17.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CORPORA = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("10x", os.path.join(HERE, "scratch", "sf1e")),
    ("100x", os.path.join(HERE, "scratch", "sf10e")),
]
GEOMETRIES = [(8, 8), (4, 16)]


def main() -> None:
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.session import get_spark
    from web_maxiv_hdbppviewer_spark.operators.similarity import (
        all_plane_dots,
        with_norms,
    )

    spark = get_spark(app_name="lsh-bucket-census")
    results: dict = {}
    for label, sf_dir in CORPORA:
        path = os.path.join(sf_dir, "embeddings.parquet")
        if not os.path.exists(path):
            continue
        emb = spark.read.parquet(path)
        base = with_norms(emb, "vec_id", "embedding")
        dotted = base.select(
            "id", all_plane_dots(F.col("vec")).alias("_dots")
        ).localCheckpoint(eager=False)
        n = dotted.count()
        for bands, bits in GEOMETRIES:
            total_pairs = 0
            max_bucket = 0
            for b in range(bands):
                bucket = None
                for j in range(bits):
                    bit = F.when(
                        F.round(
                            F.element_at(F.col("_dots"), b * bits + j + 1), 6
                        )
                        >= 0,
                        F.lit(1 << j),
                    ).otherwise(F.lit(0))
                    bucket = bit if bucket is None else bucket + bit
                stats = (
                    dotted.groupBy(bucket.alias("bv"))
                    .agg(F.count(F.lit(1)).alias("nb"))
                    .agg(
                        F.sum(
                            F.col("nb") * (F.col("nb") - 1) / 2
                        ).alias("pairs"),
                        F.max("nb").alias("mx"),
                    )
                    .collect()[0]
                )  # bounded: one row per band
                total_pairs += int(stats["pairs"])
                max_bucket = max(max_bucket, int(stats["mx"]))
            key = f"{label}_{bands}x{bits}"
            results[key] = {
                "n_vectors": n,
                "candidate_pairs": total_pairs,
                "max_bucket": max_bucket,
            }
            print(json.dumps({key: results[key]}), flush=True)

    with open(os.path.join(HERE, "LSH_BUCKETS_r17.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print("\n| corpus | geometry | vectors | candidate pairs | max bucket |")
    print("|---|---|---|---|---|")
    for key, r in sorted(results.items()):
        label, geo = key.rsplit("_", 1)
        print(
            f"| {label} | {geo} | {r['n_vectors']} |"
            f" {r['candidate_pairs']} | {r['max_bucket']} |"
        )


if __name__ == "__main__":
    main()
