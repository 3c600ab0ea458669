"""Distributed connected components: near-dup pairs -> duplicate clusters.

Pair generation (dedup.py) is only half of corpus deduplication - the
training-data pipeline needs each document assigned to a duplicate CLUSTER
so one representative per cluster survives. Components are computed by
iterative min-label propagation with pointer jumping (path halving), the
DataFrame form of the MapReduce CC algorithms (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

  - propagate: lbl(v) <- min(lbl(v), min over neighbors u of lbl(u))
    - one shuffle join edges x labels + one groupBy(dst) per round
  - jump: lbl(v) <- lbl(lbl(v)) - halves label-chain depth, so rounds are
    O(log diameter), not O(diameter)
  - labels are localCheckpoint-ed per round: the loop is driver-side but
    each round is a fully distributed plan over (edges, labels) - no
    collect of any corpus-sized data; convergence is a count() of changed
    labels (0 rows -> done).

Near-dup graphs are unions of small cliques (diameter ~= 2), so this
converges in 2-3 rounds; the pointer jumping bounds pathological chains.
This is genuinely iterative - not expressible as one SQL query in Spark -
but DuckDB's recursive CTE gives an exact independent oracle
(plans/extensions_oracle.py: transitive closure + min label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 25,
) -> DataFrame:
    """(id, cluster_id): every node labeled with the min node id reachable
    from it (isolated nodes label themselves).

    ``edges`` is undirected (each pair listed once in either direction).
    Raises if ``max_rounds`` is hit without convergence - at the default
    25, pointer jumping would need a component diameter > 2^25.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.localCheckpoint()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lbl")
    ).localCheckpoint()
    for _ in range(max_rounds):
        neigh_min = (
            e.join(labels, e["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("lbl").alias("nlbl"))
        )
        merged = (
            labels.join(neigh_min, labels["id"] == neigh_min["dst"], "left")
            .select(
                "id",
                F.col("lbl").alias("old"),
                F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
            )
        )
        # pointer jumping: follow the label's own label (path halving); the
        # old label rides along so convergence is a count over THIS
        # checkpoint, not an extra join against the previous round
        as_map = merged.select(
            F.col("id").alias("m_id"), F.col("lbl").alias("m_lbl")
        )
        jumped = (
            merged.join(as_map, merged["lbl"] == as_map["m_id"], "left")
            .select("id", "old", F.coalesce("m_lbl", "lbl").alias("lbl"))
            # EAGER on purpose (r14 measured): lazy showed no win here -
            # the eager materialization job IS the round's full plan and
            # the convergence count over its blocks is nearly free, while
            # lazy risks the parallel-branch duplicate-compute hazard for
            # next round's two label reads. (The kcenter superstep lazy
            # win came from per-job overhead at k tiny steps, not from
            # avoiding a heavy pass.)
            .localCheckpoint()
        )
        changed = jumped.where(F.col("lbl") != F.col("old")).count()
        labels = jumped.select("id", "lbl")
        if changed == 0:
            return labels.select("id", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: near-dup pairs become
    cluster edges; cluster_id = min doc_id of the component, so the
    canonical keep-one-per-cluster rule is ``doc_id == cluster_id``."""
    cc = connected_components(
        docs.select(id_col), pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
    )
    return cc.select(F.col("id").alias(id_col), "cluster_id")


PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    scale: int = PAGERANK_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Integer-arithmetic PageRank over an undirected pair graph - the
    second iterative graph operator next to connected_components, in the
    same Pregel superstep shape: one join (edges x state) + one
    groupBy(dst) per iteration, state localCheckpoint-ed between rounds,
    nothing corpus-sized ever collected (the only driver scalar is N).

    The recipe is ALL truncating integer arithmetic so any SQL engine
    replays it bit-for-bit (the portability discipline of the minhash /
    bootstrap / PCA families - float damping sums would drift at ulp
    scale across engines):

        pr_0(v)   = SCALE DIV N
        base      = (15 * (SCALE DIV N)) DIV 100          # (1-d), d=0.85
        pr_t+1(v) = base + (85 * sum_{u ~ v} (pr_t(u) DIV deg(u))) DIV 100

    Truncation leaks a few units of mass per step; the RECIPE is the
    contract (identical everywhere), and rankings are unaffected. Nodes
    are the edge endpoints (every node of an undirected pair graph has
    degree >= 1, so there are no dangling nodes). Returns (id, pr)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.localCheckpoint()
    # deg is STATIC across supersteps - checkpoint it once and rebuild
    # each round's state from (contrib JOIN deg) instead of re-reading
    # the evolving state frame (optimization r19): on the DOUBLED edge
    # list every node is both a src and a dst, so the contribution
    # aggregate provably covers the full node set (v in state <=> v in
    # src(e) <=> v in dst(e)) and the old left-join-back-to-state +
    # coalesce(s, 0) was reachable only by dead code. One state read
    # per superstep instead of two.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    n = deg.count()
    if n == 0:
        return deg.select(F.col("src").alias("id"), F.lit(0).cast("long").alias("pr"))
    pr0 = scale // n
    base = (15 * pr0) // 100
    state = deg.select(
        F.col("src").alias("id"), "deg", F.lit(pr0).cast("long").alias("pr")
    ).localCheckpoint()
    for i in range(iterations):
        contrib = (
            e.join(state, e["src"] == state["id"])
            .select(F.col("dst"), F.expr("pr DIV deg").alias("sh"))
            .groupBy("dst")
            .agg(F.sum("sh").alias("s"))
        )
        state = contrib.join(deg, contrib["dst"] == deg["src"]).select(
            F.col("dst").alias("id"),
            "deg",
            (F.lit(base).cast("long") + F.expr("85 * s DIV 100")).alias("pr"),
        )
        # interval checkpointing (GraphX-style), cadence 2: with the
        # single-read superstep the lazy intermediate iteration's
        # subplan executes exactly ONCE inside the next
        # materialization - the r14 duplicate-compute hazard that
        # forced cadence 1 existed only because the 2-read superstep
        # evaluated an unmaterialized predecessor twice. Halves the
        # materialization barriers; lineage depth stays bounded at 2.
        if i % 2 == 1 or i == iterations - 1:
            state = state.localCheckpoint()
    return state.select("id", "pr")
