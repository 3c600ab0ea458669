#!/usr/bin/env python
"""Corpus-linearity witness, chunk-ANN leg (completes the r16 study:
dedup family in measure_linearity.py, similarity family in
measure_linearity_sim.py).

Times the chunk-grain retrieval rung (sim_chunk_ann /
sim_chunk_ann_recall / dedup_chunk) on sf0.1 vs a combined 10x corpus:
documents from the token-remapped 10x corpus (scratch/sf1x) and
embeddings from the dimension-rotated 10x corpus (scratch/sf1e) - both
built by the sibling scripts with ALIGNED id offsets (copy k shifts
doc_id and vec_id by k*5000), so every 10x document finds its parent
vector and the chunk store is exactly 10x. The interesting terms:
the distributed global rank (driver-bounded offsets), the IVFPQ
training over 10x the store (first pass), and the ADC candidate side
(fixed 8 cells, so probed populations grow 10x - linear by design).

Run from the repo root (after the two sibling scripts):
  python tools/measure_linearity_chunk.py
Writes LINEARITY_CHUNK_r16.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SRC = "/root/testdata/sf0.1"
DOCS10 = os.path.join(HERE, "scratch", "sf1x", "documents.parquet")
EMB10 = os.path.join(HERE, "scratch", "sf1e", "embeddings.parquet")
SCRATCH = os.path.join(HERE, "scratch", "sf1c")
QUERIES = ["dedup_chunk", "sim_chunk_ann", "sim_chunk_ann_recall"]


def build_corpus(spark) -> None:
    import tools.measure_linearity as dedup_leg
    import tools.measure_linearity_sim as sim_leg

    dedup_leg.build_corpus(spark)
    sim_leg.build_corpus(spark)
    # ADVICE r16: the two sibling builders offset ids by k * |base table|
    # independently; the combined corpus is only aligned if the two base
    # tables have the SAME row count - otherwise the doc->embedding
    # inner join in _chunk_vec_store silently drops chunks and the "10x
    # store" claim is measured on the wrong workload.
    n_docs = spark.read.parquet(os.path.join(SRC, "documents.parquet")).count()
    n_emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")).count()
    assert n_docs == n_emb, (
        f"base tables misaligned: {n_docs} documents vs {n_emb} embeddings -"
        " the k*n id offsets of the two sibling builders would diverge"
    )
    os.makedirs(SCRATCH, exist_ok=True)
    from web_maxiv_hdbppviewer_spark.sources.tables import TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        link = os.path.join(SCRATCH, f"{t}.parquet")
        if os.path.exists(link):
            continue
        if t == "documents":
            os.symlink(DOCS10, link)
        elif t == "embeddings":
            os.symlink(EMB10, link)
        else:
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)


def main() -> None:
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="hdbpp-linearity-chunk")
    build_corpus(spark)
    queries = entry_mod.queries()
    queries["text_chunk"](spark, SRC).write.format("noop").mode(
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

    with open(os.path.join(HERE, "LINEARITY_CHUNK_r16.json"), "w") as f:
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
