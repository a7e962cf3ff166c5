"""Round-6 optimization guardrails: degree-oriented triangle
enumeration (output-invariant vs a naive reference, hub-safe) and the
entity_similarity hub-neighbor cap."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from snips_nlu_spark.spark.graph import entity_similarity, entity_triangles


def _triples_for_edges(spark, edges):
    """One synthetic turn per co-occurring value pair: the co-occurrence
    graph of the result is exactly ``edges`` (entity type 'v', values =
    node names)."""
    rows = []
    for i, (a, b) in enumerate(edges):
        conv, subj = f"c{i}", f"c{i}:0"
        rows.append((conv, 0, subj, "slot_a", a, "v", 0, 1, a, 0.9))
        rows.append((conv, 0, subj, "slot_b", b, "v", 2, 3, b, 0.9))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, subj string, pred string, "
              "obj string, entity string, span_start int, span_end int, "
              "raw_value string, proba double")


def _naive_triangles(edges):
    """Per-node triangle counts from the raw undirected edge set."""
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return adj, tri


@pytest.fixture(scope="module")
def hub_edges():
    """A degree-40 hub with spokes, a chain of triangles through the
    hub, and a hub-free clique — the skew shape the degree orientation
    must bound."""
    edges = [("hub", f"s{i:02d}") for i in range(40)]
    edges += [(f"s{i:02d}", f"s{i + 1:02d}") for i in range(0, 40, 2)]
    edges += [(a, b) for a, b in combinations(
        ["k1", "k2", "k3", "k4"], 2)]
    edges.append(("k1", "hub"))
    return edges


def test_degree_oriented_triangles_match_naive(spark, hub_edges):
    t = _triples_for_edges(spark, hub_edges)
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in entity_triangles(t).collect()}
    adj, tri = _naive_triangles(hub_edges)
    want = {f"v|{n}": (len(adj[n]), tri[n]) for n in adj}
    assert got == want


def test_degree_orientation_bounds_hub_out_degree(spark, hub_edges):
    """Every wedge center must be the triangle's LOWEST-(degree, id)
    corner — the hub (max degree) can never fan out wedges. Proxy
    check: the enumeration stays correct when the hub's degree
    dominates, and the hub's own triangle count matches naive."""
    t = _triples_for_edges(spark, hub_edges)
    row = (entity_triangles(t)
           .filter(F.col("node") == "v|hub").collect()[0])
    _, tri = _naive_triangles(hub_edges)
    assert row["degree"] == 41
    assert row["triangles"] == tri["hub"]


def test_similarity_cap_default_noop(spark, hub_edges):
    t = _triples_for_edges(spark, hub_edges)
    base = sorted(map(tuple, entity_similarity(t).collect()))
    capped = sorted(map(tuple, entity_similarity(
        t, max_neighbor_degree=10_000).collect()))
    assert base == capped


def test_similarity_cap_drops_hub_mediated_pairs(spark, hub_edges):
    t = _triples_for_edges(spark, hub_edges)
    capped = entity_similarity(t, max_neighbor_degree=10)
    # spokes share ONLY the hub as neighbor; with the hub capped away
    # no spoke-spoke similarity row may survive via the hub
    rows = capped.filter(F.col("node_a").startswith("v|s")
                         & F.col("node_b").startswith("v|s")).collect()
    for r in rows:
        # any surviving spoke pair must share a non-hub neighbor
        a, b = r["node_a"][2:], r["node_b"][2:]
        adj, _ = _naive_triangles(hub_edges)
        shared = (adj[a] & adj[b]) - {"hub"}
        assert shared, (a, b)
