#!/usr/bin/env python
"""Corpus-linearity witness for the dedup family (VERDICT r15 #6).

The 100 TB story for the dedup/funnel operators rests on plan shapes and
boundedness arguments; this script converts the headline claims from
argument to measurement. It builds a one-off 10x documents corpus
(sf1-equivalent, 50k docs, seeded and deterministic) and times the
dedup-family headline queries on sf0.1 and on the 10x corpus in one
warm JVM, two passes per corpus:

  pass A ("first"): includes the session artifact builds (shingle/pair
          indexes, derived-corpus checkpoints) - the first-touch cost a
          fresh cluster pays once;
  pass B ("steady"): the memoized steady state every later query sees.

ORDERING DEPENDENCY (ADVICE r16): "first" is true first-touch only for
the first query per corpus - the warmup (dedup_exact on SRC) and
earlier queries in the loop build SHARED session artifacts (shingle/
pair caches, derived-corpus checkpoints) that later queries' "first"
readings reuse, understating their cold cost. The study's linearity
ratios compare like with like (each query's "first" reading has the
same predecessors on both corpora), so the RATIOS are sound; the
absolute "first" numbers are not per-query cold-start costs. Time each
query in a fresh session if true cold numbers are ever needed.

The 10x corpus is 10 token-remapped copies of sf0.1/documents (copy k
appends `_k` to every token and offsets doc_id by k*5000): each copy
keeps the exact within-copy near-dup structure (planted pairs, shingle
frequencies, token counts) while cross-copy shingles can never collide,
so the TRUE pair workload is exactly 10x the sf0.1 workload - the right
ground truth for a linearity test. Other tables are symlinked from
sf0.1 (the measured queries read only `documents`).

Run from the repo root:  python tools/measure_linearity.py
Writes LINEARITY_r16.json and prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(HERE, "scratch", "sf1x")
COPIES = 10
QUERIES = [
    "dedup_minhash_lsh",
    "dedup_chunk_near",
    "dedup_substr",
    "pipe_refinedweb",
]


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SCRATCH, exist_ok=True)
    out = os.path.join(SCRATCH, "documents.parquet")
    if not os.path.exists(out):
        base = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        n = base.count()
        parts = []
        for k in range(COPIES):
            suf = f"_{k}"
            parts.append(
                base.select(
                    (F.col("doc_id") + k * n).alias("doc_id"),
                    F.concat(
                        F.regexp_replace("text", " ", f"{suf} "), F.lit(suf)
                    ).alias("text"),
                    "lang",
                    "source",
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        ).repartition(32).write.mode("overwrite").parquet(out)
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

    spark = get_spark(app_name="hdbpp-linearity")
    build_corpus(spark)
    queries = entry_mod.queries()
    # JVM / codegen / Arrow warmup
    queries["dedup_exact"](spark, SRC).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    # ADVICE r17: the "first" phase readings depend on QUERIES order -
    # the session memos are shared (dedup_minhash_lsh's first run builds
    # the shingle/signature artifacts dedup_chunk_near and dedup_substr
    # then ride), so a reordering shifts the build cost to whichever
    # memo owner runs first. Keep the owner-first order above, or read
    # only the "steady" column when comparing across tool revisions.
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

    with open(os.path.join(HERE, "LINEARITY_r16.json"), "w") as f:
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
