#!/usr/bin/env python
"""Corpus-linearity witness, 100x rung (VERDICT r16 #7).

The r16 three-leg study's own reading was that at 10x most lines sit on
the fixed-cost scheduling floor; this third decade (500k docs) puts the
pair/candidate terms of the two INDEX-HEAVY dedup lines above the floor
so the corpus term itself is measured:

  dedup_minhash_lsh - banded-LSH candidate generation + exact verify
          (the term with the a-priori quadratic risk);
  dedup_chunk_near  - chunk-grain near-dup (the same machinery at the
          64/48-window chunk population, ~10x the doc count).

Corpus construction is measure_linearity.py's token-remap, two more
bits deep: 100 copies of sf0.1/documents, copy k appending `_k` to
every token and offsetting doc_id by k*n - within-copy near-dup
structure (planted pairs, shingle frequencies) preserved exactly,
cross-copy shingles can never collide, so the TRUE pair workload is
exactly 100x sf0.1. Built with one cross join against range(100)
(not 100 unioned branches).

Same ordering caveat as the sibling scripts: "first" includes the
session artifact builds and is only true first-touch for the first
query per corpus; the cross-corpus RATIOS compare like with like.

Run from the repo root:  python tools/measure_linearity_100x.py
Writes LINEARITY_100X_r17.json and prints a markdown table for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(HERE, "scratch", "sf10x")
COPIES = 100
QUERIES = ["dedup_minhash_lsh", "dedup_chunk_near"]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH, exist_ok=True)
    out = os.path.join(SCRATCH, "documents.parquet")
    if not os.path.exists(out):
        base = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        n = base.count()
        k = F.col("k")
        suf = F.concat(F.lit("_"), k.cast("string"))
        spark.range(COPIES).select(F.col("id").cast("long").alias("k")).crossJoin(
            base
        ).select(
            (F.col("doc_id") + k * n).alias("doc_id"),
            F.concat(
                F.regexp_replace(
                    F.col("text"), F.lit(" "), F.concat(suf, F.lit(" "))
                ),
                suf,
            ).alias("text"),
            "lang",
            "source",
        ).select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        ).repartition(64).write.mode("overwrite").parquet(out)
    from web_maxiv_hdbppviewer_spark.sources.tables import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        if t == "documents":
            continue
        link = os.path.join(SCRATCH, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)


def main() -> None:
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="hdbpp-linearity-100x")
    build_corpus(spark)
    queries = entry_mod.queries()
    # JVM / codegen / Arrow warmup
    queries["dedup_exact"](spark, SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    for sf_dir, label in ((SRC, "sf0.1"), (SCRATCH, "sf10x")):
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

    with open(os.path.join(HERE, "LINEARITY_100X_r17.json"), "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print("\n| query | sf0.1 first | sf0.1 steady | 100x first |"
          " 100x steady | ratio first | ratio steady |")
    print("|---|---|---|---|---|---|---|")
    for name in QUERIES:
        r = results[name]
        rf = round(r["sf10x_first"] / r["sf0.1_first"], 2)
        rs = round(r["sf10x_steady"] / r["sf0.1_steady"], 2)
        print(
            f"| {name} | {r['sf0.1_first']} | {r['sf0.1_steady']} |"
            f" {r['sf10x_first']} | {r['sf10x_steady']} | {rf}x | {rs}x |"
        )


if __name__ == "__main__":
    main()
