"""Iterative graph operators: connected components for dedup-cluster
resolution.

Near-dup detection (minhash LSH t7, simhash t9, winnowing t11) emits
PAIRS; corpus curation needs CLUSTERS — every document mapped to one
canonical representative, so the keep/drop decision is transitive
(a~b, b~c => one survivor among {a,b,c}, not two). That closure is
connected components over the pair graph.

Algorithm: min-label propagation (the relational formulation of
breadth-first component labeling; cf. the "large-star/small-star"
map-reduce CC literature). labels start as each node's own id; each
round every node takes the min of its label and its neighbors'
labels; converged when no label changes. Rounds needed = graph
diameter — near-dup graphs are overwhelmingly tiny cliques plus
short chains, so 3-5 rounds typically suffice; ``max_iter`` bounds
pathological chains.

Scale design:
- each round is ONE join (edges x labels, shuffled on the node key)
  + ONE min-aggregate — both co-partitioned on the same key, so AQE
  reuses the exchange layout round to round;
- lineage is truncated every round with ``localCheckpoint`` —
  without it the plan doubles per iteration and the driver chokes on
  optimization long before the data is big;
- convergence needs one count per round (the changed-label count);
  at 100 TB amortize it by checking every k rounds instead.

Durability tradeoff (r16 advice): ``localCheckpoint`` stores blocks
executor-local with NO lineage fallback — an executor loss (or
dynamic-allocation decommission) fails the job instead of recomputing.
That is the right trade for these narrow (id, id) pair sets on a
static-executor batch cluster and on the local harness; on clusters
with preemption/decommissioning, set a checkpoint dir
(``sc.setCheckpointDir``) and swap the ``localCheckpoint`` calls for
reliable ``checkpoint()`` — same semantics, +one HDFS write per round
(docs/SCALE.md §checkpoint-durability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id =
    the minimum node id of the component (deterministic canonical
    representative).

    Convergence: each round's aggregate carries the node's PREVIOUS
    label alongside the new min (the self row contributes it; max()
    recovers it — one row per node), so the changed-label count is a
    column filter over the freshly checkpointed round output — no
    labels-to-labels self-join, no extra shuffle, cheap enough to run
    every round and stop at the exact fixpoint."""
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    # ^ the union below references the pair set TWICE; without the
    #   checkpoint an expensive upstream (minhash/LSH rescoring in
    #   t12/t13/t34, frame overlap in m6) re-evaluates per branch
    #   (r16 interleaved A/B on the t12 shape, min-of-3: 3.3s ->
    #   2.4s). Narrow (id, id) rows, same storage class as the edges
    #   checkpoint one line down.
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for it in range(1, max_iter + 1):
        label_type = labels.schema["label"].dataType
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "label")
            .withColumn("__old", F.lit(None).cast(label_type))
        )
        mine = labels.select(
            "node", "label", F.col("label").alias("__old")
        )
        new_labels = (
            mine.unionByName(neigh)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.max("__old").alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(
            F.col("label") != F.col("__old")
        ).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            break
        if it == max_iter:
            # partially-propagated labels would silently break the
            # transitive dedup contract (multiple "canonical" docs
            # per cluster on chains longer than max_iter) — refuse
            raise RuntimeError(
                f"connected_components did not converge after "
                f"{max_iter} rounds; {changed} labels still changing "
                f"(graph diameter exceeds max_iter — raise max_iter)"
            )
    return labels.select("node", F.col("label").alias("cluster_id"))


def resolve_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Canonical corpus after near-dup clustering: every document maps
    to its cluster representative (the min id of its component;
    unpaired documents represent themselves), and only representatives
    survive. Returns docs filtered to survivors — the end-to-end
    "pairs in, clean corpus out" dedup contract."""
    cc = connected_components(pairs, src_col, dst_col)
    mapped = docs.join(
        cc.withColumnRenamed("node", id_col), id_col, "left_outer"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    return mapped.where(F.col(id_col) == F.col("cluster_id")).drop("cluster_id")


def resolve_canonical_by(
    docs: DataFrame,
    pairs: DataFrame,
    order_cols: list,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster resolution: like :func:`resolve_canonical`
    but the survivor of each near-dup cluster is chosen by
    ``order_cols`` (e.g. ``[F.col("quality_score").desc(), F.col("doc_id")]``)
    instead of min id — the curation rule real pipelines use: among
    near-duplicates, KEEP THE BEST COPY, drop the rest. The trailing
    unique-id tiebreak is the caller's responsibility (pass the id
    column last) so the survivor is deterministic.

    Same scale shape as resolve_canonical: CC over the pair graph
    (narrow label rows), one membership join, one per-cluster window —
    clusters are near-dup groups, typically tiny, so the window sort
    is bounded per group."""
    from pyspark.sql import Window

    cc = connected_components(pairs, src_col, dst_col)
    member = docs.join(
        cc.withColumnRenamed("node", id_col), id_col, "left_outer"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    w = Window.partitionBy("cluster_id").orderBy(*order_cols)
    return (
        member.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def triangle_count(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-node triangle participation over an undirected pair graph
    (input edges canonical ``id_a < id_b``, the near-dup operators'
    output contract): (node, n_triangles) for every node in at least
    one triangle. Triangles are the transitivity census of a
    similarity graph — a near-dup CLUSTER whose pairs close into
    triangles is a genuine clique (one boilerplate family), while
    high-degree nodes with NO closure are hub false-positives (one
    template matching many unrelated docs), so the triangle count is
    the diagnostic that separates them before canonicalization
    deletes documents.

    Scale shape (Cohen's map-reduce triangle counting / Schank's
    oriented enumeration): edges are ORIENTED from the
    lower-(degree, id) endpoint to the higher, so every wedge is
    generated at its lowest-degree apex — candidate wedges are
    bounded by sum(min-degree per edge) = O(m^1.5) on any graph,
    immune to the hub that makes naive a<b enumeration blow up
    (a 1M-degree hub contributes ZERO wedges unless both endpoints
    out-rank it). One degree aggregate, one self-join on the apex,
    one semi-join against the canonical edge set for closure, one
    explode-to-3 count — all narrow (node, node) rows.
    """
    # the edge list fans out into THREE consumers (degree table, wedge
    # self-join, closure semi-join), so an expensive upstream (sim17's
    # LSH rescoring) would otherwise re-evaluate per consumer. Eager
    # localCheckpoint materializes the NARROW pair rows once and
    # truncates the lineage — measured r16 at sf0.1: 7.3s -> 3.1s for
    # sim17. (.cache() re-measured SLOWER, 8.3s: the InMemoryRelation
    # barrier blocks exchange reuse and whole-stage codegen, the same
    # result as the r13 measurement that left this uncached; the
    # checkpointed RDD has neither problem and gives the planner exact
    # sizes, so the wedge joins broadcast.) Pair rows are (long, long)
    # — executor-storage-bounded at any scale that can compute them.
    e = pairs.select(
        F.col(src_col).alias("u").cast("long"),
        F.col(dst_col).alias("v").cast("long"),
    ).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge toward the higher (degree, id) endpoint
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    # wedges at the lowest-ranked apex: two out-edges (apex->b, apex->c)
    o1 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("b"))
    o2 = oriented.select(F.col("lo").alias("apex"), F.col("hi").alias("c"))
    wedges = o1.join(o2, "apex").where(F.col("b") < F.col("c"))
    # closure check against the CANONICAL edge set (orientation-free;
    # e preserves the input's id_a < id_b canonical order)
    closing = e.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"], "left_semi")
    nodes = (
        tris.select(F.col("apex").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def ancestors_by_doubling(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 16,
) -> DataFrame:
    """(node, root, depth) for every CHILD node of a forest given
    (child, parent) edges — root resolution and distance-to-root via
    POINTER DOUBLING: after round r each node's pointer reaches its
    2^r-th ancestor (or its root, wherever that is closer), so a
    depth-D hierarchy resolves in ceil(log2(D)) rounds instead of
    the D rounds of naive parent-chasing. This is the classic
    parallel list-ranking/shortcutting technique (Wyllie '79;
    the same jump-pointer idea as large-star CC), and the reason
    hierarchy flattening — BOM explosion, org rollups, category
    trees — is affordable as a sequence of Spark joins: at depth
    1000 the naive plan runs 1000 shuffles, this runs 10.

    Each round is one self-join of the pointer table on the shared
    key layout plus a localCheckpoint to keep lineage flat (the
    graph.py CC discipline). A root (a node that is never a child)
    has no outgoing row, so composition left-joins and keeps
    already-resolved pointers unchanged — after convergence every
    row's pointer IS its root and ``depth`` the exact edge count.
    Forests only: a cycle never terminates at a root (callers
    validating untrusted edges should bound-check depth <=
    ``max_depth`` on the result)."""
    state = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("long").alias("d"),
    )
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        a = state.alias("a")
        b = state.select(
            F.col("node").alias("b_node"),
            F.col("anc").alias("b_anc"),
            F.col("d").alias("b_d"),
        ).alias("b")
        state = (
            a.join(b, F.col("a.anc") == F.col("b_node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.coalesce(F.col("b_anc"), F.col("a.anc")).alias("anc"),
                (
                    F.col("a.d") + F.coalesce(F.col("b_d"), F.lit(0))
                ).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node", F.col("anc").alias("root"), F.col("d").alias("depth")
    )
