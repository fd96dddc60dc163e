"""Pivot correlation clustering (operators.clustering.pivot_clusters):
both physical strategies (driver-side replica and distributed
round-synchronous loop) must agree with an independent pure-Python
re-implementation of the round rule, and the result must have the
pivot-structure invariants (pivots are an independent set, every member is
a DIRECT neighbor of its pivot) that distinguish it from transitive CC."""

from __future__ import annotations

import hashlib
import random

from liblevenshtein_spark.operators.clustering import pivot_clusters


def _pri(x: str) -> str:
    return hashlib.md5(f"pivot|{x}".encode()).hexdigest()


def pivot_reference(nodes, edges, max_rounds=12):
    """Independent round-synchronous pivot: local-minimum-priority nodes
    over the live subgraph become pivots, non-pivots attach to their
    min-priority pivot neighbor, assigned nodes leave the graph."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assign = {}
    live = set(adj)
    for _ in range(max_rounds):
        if not live:
            break
        pivots = {
            u for u in live
            if all(_pri(u) < _pri(v) for v in adj[u] if v in live)
        }
        step = {u: u for u in pivots}
        for u in live - pivots:
            cands = [v for v in adj[u] if v in pivots]
            if cands:
                step[u] = min(cands, key=_pri)
        assign.update(step)
        live -= set(step)
    for u in live:
        assign[u] = u
    return {n: assign.get(n, n) for n in nodes}


def _check(spark, nodes, edges, max_rounds=12):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    edges_df = spark.createDataFrame(
        edges or [("__none__", "__none__")], ["id_a", "id_b"]
    )
    if not edges:
        edges_df = edges_df.filter("id_a != id_a")
    want = pivot_reference(nodes, edges, max_rounds)
    for threshold in (1_000_000, 0):
        got = {
            r.conv_id: r.pivot_id
            for r in pivot_clusters(
                nodes_df, edges_df, max_rounds=max_rounds,
                small_graph_edges=threshold,
            ).collect()
        }
        assert got == want, f"small_graph_edges={threshold}"
    return want


def test_triangle_and_singleton(spark):
    _check(spark, ["a", "b", "c", "z"], [("a", "b"), ("b", "c"), ("a", "c")])


def test_chain_multiround(spark):
    nodes = [f"p{i:03d}" for i in range(40)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(39)]
    _check(spark, nodes, edges)


def test_random_graphs_match_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes = [f"r{trial}_{i}" for i in range(50)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, nodes, edges)


def test_pivot_structure_invariants(spark):
    """Pivots form an independent set in the match graph; every non-pivot
    member is a DIRECT neighbor of its pivot (cluster diameter <= 2) —
    the guarantee transitive CC does not give."""
    rng = random.Random(11)
    nodes = [f"s{i}" for i in range(60)]
    edges = list({
        tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
        for _ in range(90)
    })
    edges = [(a, b) for a, b in edges if a != b]
    assign = _check(spark, nodes, edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    pivots = {p for p in assign.values()}
    for a, b in edges:
        assert not (a in pivots and b in pivots and assign[a] == a and assign[b] == b) or True
    for p in pivots:
        assert assign[p] == p, "pivot must head its own cluster"
    for n, p in assign.items():
        if n != p:
            assert p in adj.get(n, set()), "member not adjacent to its pivot"
    # no two adjacent self-headed pivots
    for a, b in edges:
        if assign[a] == a and assign[b] == b:
            raise AssertionError(f"adjacent pivots {a}, {b}")


def test_chain_splits_unlike_cc(spark):
    """A 5-node path is one CC component but pivot splits it into
    diameter-<=2 pieces."""
    nodes = [f"q{i}" for i in range(5)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(4)]
    assign = _check(spark, nodes, edges)
    assert len(set(assign.values())) >= 2


def test_max_rounds_defensive_self_assign(spark):
    """With max_rounds=1 the unfinished tail self-assigns identically on
    both physical paths and in the reference."""
    nodes = [f"t{i:02d}" for i in range(20)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(19)]
    _check(spark, nodes, edges, max_rounds=1)


def test_input_order_invariance(spark):
    nodes = [f"u{i}" for i in range(30)]
    rng = random.Random(3)
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    base = _check(spark, nodes, edges)
    shuffled = list(edges)
    rng.shuffle(shuffled)
    shuffled = [(b, a) for a, b in shuffled]
    again = _check(spark, list(reversed(nodes)), shuffled)
    assert base == again
