"""Match-graph audit operators (operators/graph.py): edge_support vs a
brute-force common-neighbor count, cluster_cohesion arithmetic, and
robust_clusters vs a pure-Python prune-then-union-find reference —
including randomized graphs so the equivalence isn't fixture-shaped."""

from __future__ import annotations

import itertools
import random

from liblevenshtein_spark.operators.graph import (
    transitivity_stats,
    cluster_cohesion,
    edge_support,
    robust_clusters,
)


def _support_ref(edges):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in edges}


def _cc_ref(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in nodes}


def _robust_ref(nodes, wedges, min_support=1, size_threshold=3,
                weak_distance=None):
    edges = [(a, b) for a, b, _ in wedges]
    base = _cc_ref(nodes, edges)
    sizes: dict = {}
    for n, c in base.items():
        sizes[c] = sizes.get(c, 0) + 1
    support = _support_ref(edges)
    kept = []
    for a, b, w in wedges:
        suspect = sizes[base[a]] > size_threshold
        weak = weak_distance is None or w >= weak_distance
        if suspect and support[(a, b)] < min_support and weak:
            continue
        kept.append((a, b))
    return _cc_ref(nodes, kept)


def _edges_df(spark, wedges):
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in wedges], "id_a string, id_b string, distance int"
    )


def _random_wedges(rng, n_nodes, n_edges):
    nodes = [f"n{i:03d}" for i in range(n_nodes)]
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.sample(nodes, 2)
        pairs.add((min(a, b), max(a, b)))
    return nodes, [(a, b, rng.randint(1, 3)) for a, b in sorted(pairs)]


def test_edge_support_triangle_and_bridge(spark):
    wedges = [("a", "b", 1), ("a", "c", 1), ("b", "c", 2), ("c", "d", 2)]
    out = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in edge_support(_edges_df(spark, wedges)).collect()
    }
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1, ("c", "d"): 0}


def test_edge_support_matches_bruteforce_random(spark):
    rng = random.Random(7)
    for trial in range(3):
        nodes, wedges = _random_wedges(rng, 30, 60)
        ref = _support_ref([(a, b) for a, b, _ in wedges])
        out = {
            (r["id_a"], r["id_b"]): r["support"]
            for r in edge_support(_edges_df(spark, wedges)).collect()
        }
        assert out == ref, f"trial {trial}"


def test_edge_support_preserves_columns(spark):
    wedges = [("a", "b", 1), ("a", "c", 2)]
    out = edge_support(_edges_df(spark, wedges))
    assert set(out.columns) == {"id_a", "id_b", "distance", "support"}


def test_cluster_cohesion_density(spark):
    # clique {a,b,c} density 1.0; chain {d,e,f} density 2/3; singleton g excluded
    wedges = [("a", "b", 1), ("a", "c", 1), ("b", "c", 1),
              ("d", "e", 1), ("e", "f", 1)]
    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
         ("f", "d"), ("g", "g")],
        "conv_id string, cluster_id string",
    )
    out = {r["cluster_id"]: r for r in
           cluster_cohesion(assign, _edges_df(spark, wedges)).collect()}
    assert set(out) == {"a", "d"}
    assert out["a"]["size"] == 3 and out["a"]["n_edges"] == 3
    assert abs(out["a"]["density"] - 1.0) < 1e-6
    assert out["d"]["n_edges"] == 2 and abs(out["d"]["density"] - 0.6667) < 1e-3


def test_robust_clusters_drops_bridge_keeps_triangle(spark):
    # two triangles welded by one weak bridge -> bridge dropped, triangles kept
    wedges = [("a", "b", 1), ("a", "c", 1), ("b", "c", 1),
              ("x", "y", 1), ("x", "z", 1), ("y", "z", 1),
              ("c", "x", 2)]
    nodes = ["a", "b", "c", "x", "y", "z"]
    ents = spark.createDataFrame([(n,) for n in nodes], "conv_id string")
    out = {
        r["conv_id"]: r["cluster_id"]
        for r in robust_clusters(ents, _edges_df(spark, wedges)).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_robust_clusters_weak_distance_protects_strong_edges(spark):
    # chain of strong (distance-1) edges in an oversized cluster: with
    # weak_distance=2 nothing is dropped even though supports are 0
    wedges = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1)]
    nodes = ["a", "b", "c", "d", "e"]
    ents = spark.createDataFrame([(n,) for n in nodes], "conv_id string")
    out = {r["conv_id"]: r["cluster_id"] for r in
           robust_clusters(ents, _edges_df(spark, wedges),
                           weak_distance=2).collect()}
    assert set(out.values()) == {"a"}
    out2 = {r["conv_id"]: r["cluster_id"] for r in
            robust_clusters(ents, _edges_df(spark, wedges)).collect()}
    assert out2 == {n: n for n in nodes}  # all support-0 edges dropped


def test_robust_clusters_matches_reference_random(spark):
    rng = random.Random(13)
    for trial, weak in itertools.product(range(2), [None, 2]):
        n_nodes, n_edges = 40, 55
        nodes, wedges = _random_wedges(rng, n_nodes, n_edges)
        ref = _robust_ref(nodes, wedges, weak_distance=weak)
        ents = spark.createDataFrame([(n,) for n in nodes], "conv_id string")
        out = {r["conv_id"]: r["cluster_id"] for r in
               robust_clusters(ents, _edges_df(spark, wedges),
                               weak_distance=weak).collect()}
        assert out == ref, f"trial {trial} weak={weak}"


def test_robust_clusters_untouched_small_clusters(spark):
    # a support-0 weak edge in a SMALL (size <= threshold) cluster survives
    wedges = [("a", "b", 2)]
    ents = spark.createDataFrame([("a",), ("b",), ("c",)], "conv_id string")
    out = {r["conv_id"]: r["cluster_id"] for r in
           robust_clusters(ents, _edges_df(spark, wedges)).collect()}
    assert out == {"a": "a", "b": "a", "c": "c"}


def test_graph_ops_renamed_edge_columns(spark):
    wedges = [("a", "b", 1), ("a", "c", 1), ("b", "c", 2), ("c", "d", 2)]
    edges = spark.createDataFrame(
        [(a, b, w) for a, b, w in wedges], "src string, dst string, w int")
    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "a")],
        "conv_id string, cluster_id string")
    coh = cluster_cohesion(assign, edges, edge_a="src", edge_b="dst").collect()
    assert coh[0]["n_edges"] == 4
    ents = spark.createDataFrame([(n,) for n in "abcd"], "conv_id string")
    out = {r["conv_id"]: r["cluster_id"] for r in
           robust_clusters(ents, edges, weak_distance=2, weight_col="w",
                           edge_a="src", edge_b="dst").collect()}
    # c-d (w=2, support 0, cluster size 4 > 3) is pruned; triangle survives
    assert out == {"a": "a", "b": "a", "c": "a", "d": "d"}


def _transitivity_ref(pairs):
    """Brute-force wedge census over canonical (a < b) edge pairs."""
    import itertools as it

    edges = set(pairs)
    nodes = sorted({x for p in pairs for x in p})
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedges = closed = 0
    for v in nodes:
        for u1, u2 in it.combinations(sorted(adj[v]), 2):
            wedges += 1
            if (min(u1, u2), max(u1, u2)) in edges:
                closed += 1
    return wedges, closed


def test_transitivity_triangle_is_one(spark):
    wedges = [("a", "b", 1), ("a", "c", 1), ("b", "c", 2)]
    row = transitivity_stats(_edges_df(spark, wedges)).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_closed_wedges"],
            row["n_open_wedges"], row["transitivity"]) == (3, 3, 3, 0, 1.0)


def test_transitivity_path_is_zero(spark):
    wedges = [("a", "b", 1), ("b", "c", 1)]
    row = transitivity_stats(_edges_df(spark, wedges)).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_closed_wedges"],
            row["n_open_wedges"], row["transitivity"]) == (2, 1, 0, 1, 0.0)


def test_transitivity_no_wedges(spark):
    # disjoint edges: zero wedges must not divide by zero
    wedges = [("a", "b", 1), ("c", "d", 1)]
    row = transitivity_stats(_edges_df(spark, wedges)).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["transitivity"]) == (2, 0, 0.0)


def test_transitivity_matches_bruteforce_random(spark):
    rng = random.Random(13)
    for trial in range(3):
        _, wedges = _random_wedges(rng, 25, 70)
        ref_w, ref_c = _transitivity_ref([(a, b) for a, b, _ in wedges])
        row = transitivity_stats(_edges_df(spark, wedges)).collect()[0]
        assert (row["n_wedges"], row["n_closed_wedges"]) == (ref_w, ref_c), trial
        expect = 0.0 if ref_w == 0 else round(ref_c / ref_w + 1e-9, 4)
        assert row["transitivity"] == expect, trial


def _knn_reference(pairs, k, mutual):
    """Independent per-node top-k + mutual/union filter."""
    from collections import defaultdict

    nbrs = defaultdict(list)
    for a, b, d in pairs:
        nbrs[a].append((d, b))
        nbrs[b].append((d, a))
    rank = {}
    for u, lst in nbrs.items():
        for i, (d, v) in enumerate(sorted(lst), start=1):
            rank[(u, v)] = i
    out = {}
    for a, b, d in pairs:
        lo, hi = min(a, b), max(a, b)
        ra, rb = rank[(lo, hi)], rank[(hi, lo)]
        keep = (ra <= k and rb <= k) if mutual else (ra <= k or rb <= k)
        if keep:
            out[(lo, hi)] = (d, ra, rb)
    return out


def _knn_collect(df):
    return {
        (r.id_a, r.id_b): (r.distance, r.rank_a, r.rank_b) for r in df.collect()
    }


def test_knn_graph_matches_reference(spark):
    from liblevenshtein_spark.operators.graph import knn_graph

    rng = random.Random(23)
    nodes = [f"n{i:02d}" for i in range(25)]
    pairs = {}
    for _ in range(60):
        a, b = rng.sample(nodes, 2)
        pairs[(min(a, b), max(a, b))] = rng.randint(0, 3)
    rows = [(a, b, d) for (a, b), d in pairs.items()]
    df = spark.createDataFrame(rows, ["id_a", "id_b", "distance"])
    for k in (1, 2, 3):
        for mutual in (True, False):
            got = _knn_collect(knn_graph(df, k=k, mutual=mutual))
            want = _knn_reference(rows, k, mutual)
            assert got == want, f"k={k} mutual={mutual}"


def test_knn_graph_suppresses_hub(spark):
    """A hub matched to 6 spokes at distance 2 loses every spoke edge under
    mutual k=1 when the spokes pair up at distance 1 among themselves."""
    from liblevenshtein_spark.operators.graph import knn_graph

    rows = [("hub", f"s{i}", 2) for i in range(6)]
    rows += [(f"s{i}", f"s{i + 1}", 1) for i in range(0, 6, 2)]
    df = spark.createDataFrame(rows, ["id_a", "id_b", "distance"])
    kept = _knn_collect(knn_graph(df, k=1, mutual=True))
    assert all("hub" not in pair for pair in kept)
    assert len(kept) == 3  # the three spoke-spoke pairs survive
    # and the degree bound holds: no node appears in more than k kept edges
    from collections import Counter

    deg = Counter()
    for a, b in kept:
        deg[a] += 1
        deg[b] += 1
    assert max(deg.values()) <= 1
