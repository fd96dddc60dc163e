"""Connected-components parity (SURVEY.md §5.2 row 6): large-star/small-star
cluster assignments must equal union-find over the same match edges."""

from __future__ import annotations

import random

from liblevenshtein_spark.operators.clustering import (
    assign_clusters, connected_components, fold_clusters,
)


def union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min member id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, nodes, edges):
    """Assert BOTH physical CC strategies against the python oracle: the
    adaptive driver union-find (default threshold) and the distributed
    large-star/small-star loop (forced via small_graph_edges=0)."""
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    edges_df = spark.createDataFrame(edges or [("__none__", "__none__")], ["id_a", "id_b"])
    if not edges:
        edges_df = edges_df.filter("id_a != id_a")  # empty
    want = union_find(nodes, edges)
    for threshold in (1_000_000, 0):
        got = {
            r.conv_id: r.cluster_id
            for r in assign_clusters(
                nodes_df, edges_df, small_graph_edges=threshold
            ).collect()
        }
        assert got == want, f"small_graph_edges={threshold}"


def test_simple_components(spark):
    nodes = [f"n{i}" for i in range(8)]
    edges = [("n0", "n1"), ("n1", "n2"), ("n4", "n5")]
    _check(spark, nodes, edges)


def test_chain_and_singletons(spark):
    """Long chain exercises multi-iteration convergence."""
    nodes = [f"c{i:03d}" for i in range(60)]
    edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(0, 40)]
    _check(spark, nodes, edges)


def test_random_graph(spark):
    rng = random.Random(9)
    nodes = [f"r{i:03d}" for i in range(120)]
    edges = [
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(90)
    ]
    _check(spark, nodes, list(set(edges)))


def test_no_edges(spark):
    nodes = [f"s{i}" for i in range(5)]
    _check(spark, nodes, [])


def test_component_roots_are_minima(spark):
    nodes = [f"m{i}" for i in range(10)]
    edges = [("m9", "m3"), ("m3", "m7"), ("m1", "m2")]
    edges_df = spark.createDataFrame(edges, ["id_a", "id_b"])
    for threshold in (1_000_000, 0):
        stars = connected_components(edges_df, small_graph_edges=threshold)
        for r in stars.collect():  # canonical star edges are (root=min, child)
            assert r.src in ("m1", "m3")


def test_threshold_exceeded_falls_through_to_loop(spark):
    """0 < small_graph_edges < |edges|: the bounded limit-probe collects
    threshold+1 rows, concludes the graph is too big, and the distributed
    loop must still produce the correct assignment (the truncated probe
    rows must NOT leak into the result)."""
    nodes = [f"t{i:02d}" for i in range(20)]
    edges = [(f"t{i:02d}", f"t{i + 1:02d}") for i in range(12)] + [("t15", "t17")]
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    edges_df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.conv_id: r.cluster_id
           for r in assign_clusters(nodes_df, edges_df, small_graph_edges=3).collect()}
    assert got == union_find(nodes, edges)


def test_local_and_distributed_paths_agree(spark):
    """The adaptive driver union-find and the distributed loop must emit the
    SAME star forest (not just the same cluster assignment)."""
    rng = random.Random(31)
    nodes = [f"p{i:03d}" for i in range(150)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    edges_df = spark.createDataFrame(edges, ["id_a", "id_b"])
    local = {(r.src, r.dst) for r in
             connected_components(edges_df).collect()}
    dist = {(r.src, r.dst) for r in
            connected_components(edges_df, small_graph_edges=0).collect()}
    assert local == dist


# ---------------------------------------------------------------------------
# fold_clusters — incremental CC
# ---------------------------------------------------------------------------

def test_fold_clusters_equals_full_history(spark):
    """Cluster half the edges, fold in the rest via the assignment star
    forest: result must equal CC over the full edge set — including the
    case where the new batch MERGES two previously-distinct clusters."""
    rng = random.Random(17)
    nodes = [f"f{i:03d}" for i in range(80)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)})
    old, new = edges[::2], edges[1::2]
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    old_df = spark.createDataFrame(old, ["id_a", "id_b"])
    new_df = spark.createDataFrame(new, ["id_a", "id_b"])
    prior = assign_clusters(nodes_df, old_df)
    got = {r.conv_id: r.cluster_id for r in fold_clusters(nodes_df, prior, new_df).collect()}
    assert got == union_find(nodes, edges)


def test_fold_clusters_merges_two_clusters(spark):
    nodes = ["a", "b", "c", "d", "e"]
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    prior = assign_clusters(
        nodes_df, spark.createDataFrame([("a", "b"), ("c", "d")], ["id_a", "id_b"])
    )
    new_df = spark.createDataFrame([("b", "d")], ["id_a", "id_b"])
    got = {r.conv_id: r.cluster_id for r in fold_clusters(nodes_df, prior, new_df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e"}


def test_fold_clusters_empty_batch_is_identity(spark):
    nodes = ["x", "y", "z"]
    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["conv_id"])
    prior = assign_clusters(
        nodes_df, spark.createDataFrame([("x", "y")], ["id_a", "id_b"])
    )
    empty = spark.createDataFrame([], "id_a string, id_b string")
    got = {r.conv_id: r.cluster_id for r in fold_clusters(nodes_df, prior, empty).collect()}
    assert got == {r.conv_id: r.cluster_id for r in prior.collect()}


class TestStarClusters:
    """star_clusters: deterministic CENTER-by-id semantics — diameter <= 2,
    no two adjacent centers, unassigned chain tails self-center."""

    def _run(self, spark, ids, edges):
        from liblevenshtein_spark.operators.clustering import star_clusters

        entities = spark.createDataFrame([(i,) for i in ids], ["conv_id"])
        matches = spark.createDataFrame(edges, ["id_a", "id_b"])
        return {
            r["conv_id"]: r["star_id"]
            for r in star_clusters(entities, matches).collect()
        }

    def test_triangle_one_star(self, spark):
        got = self._run(spark, ["a", "b", "c"], [("a", "b"), ("a", "c"), ("b", "c")])
        assert got == {"a": "a", "b": "a", "c": "a"}

    def test_chain_splits_unlike_cc(self, spark):
        # a-b-c chain: a centers, b attaches to a, c has NO center neighbor
        # (b is not a center) so c self-centers — CC would weld all three
        got = self._run(spark, ["a", "b", "c"], [("a", "b"), ("b", "c")])
        assert got == {"a": "a", "b": "a", "c": "c"}

    def test_isolated_nodes_are_singleton_centers(self, spark):
        got = self._run(spark, ["a", "b", "z"], [("a", "b")])
        assert got["z"] == "z"

    def test_member_attaches_to_smallest_center(self, spark):
        # x neighbors two centers a and c (a < c): x must pick a
        got = self._run(spark, ["a", "c", "x"], [("a", "x"), ("c", "x")])
        assert got["x"] == "a"
        assert got["a"] == "a" and got["c"] == "c"

    def test_members_attach_to_direct_neighbors_only(self, spark):
        # the diameter <= 2 guarantee: every node's star_id is itself or a
        # DIRECT match neighbor (CC would let n7 reach n0 through the chain)
        ids = [f"n{i}" for i in range(8)]
        edges = [(ids[i], ids[i + 1]) for i in range(7)]
        got = self._run(spark, ids, edges)
        sym = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
        for node, star in got.items():
            assert star == node or (node, star) in sym
        # and TRUE centers (no smaller-id neighbor) are never adjacent:
        # n0 is the only true center in the chain
        true_centers = {n for n in ids
                        if not any(b < n for a, b in sym if a == n)}
        assert true_centers == {"n0"}


def test_star_clusters_order_invariant(spark):
    """star_clusters must be a pure function of the (entities, matches)
    SETS — invariant to input row order and partitioning (it composes only
    min-aggregations and joins, no order-sensitive ops)."""
    import random

    from liblevenshtein_spark.operators.clustering import star_clusters

    rng = random.Random(13)
    ids = [f"e{i:03d}" for i in range(60)]
    edges = set()
    while len(edges) < 80:
        a, b = rng.sample(ids, 2)
        edges.add((min(a, b), max(a, b)))
    edge_list = sorted(edges)

    def run(order, parts):
        e = spark.createDataFrame(order, ["id_a", "id_b"]).repartition(parts)
        n = spark.createDataFrame([(i,) for i in ids], ["conv_id"]).repartition(parts)
        return {
            r["conv_id"]: r["star_id"] for r in star_clusters(n, e).collect()
        }

    base = run(edge_list, 4)
    assert run(list(reversed(edge_list)), 7) == base
    shuffled = edge_list[:]
    rng.shuffle(shuffled)
    assert run(shuffled, 1) == base


def test_golden_records_survivorship(spark):
    """Field-level fusion rules: longest-value (tie -> min id), mode
    (tie -> lexicographically smallest), sums/maxs, null handling, and
    two longest fields sharing one window pass."""
    from liblevenshtein_spark.operators.clustering import golden_records

    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("z", "z")],
        "conv_id string, cluster_id string",
    )
    ents = spark.createDataFrame(
        [  # conv_id, name, alt, city, n
            ("a", "jon", "xx", "nyc", 2),
            ("b", "jonathan", "y", "sf", 3),   # longest name
            ("c", "jonathon", None, "nyc", 1), # same len as 'd' would tie; null alt
            ("z", "solo", "s", None, 7),
        ],
        "conv_id string, name string, alt string, city string, n int",
    )
    out = {r.cluster_id: r for r in golden_records(
        assign, ents, longest=("name", "alt"), mode=("city",),
        sums=("n",), maxs=("n",),
    ).collect()}

    g = out["a"]
    assert g.n_members == 3 and g.rep == "a"
    # 'jonathan' and 'jonathon' both len 8: min id 'b' wins
    assert g.name_survivor == "jonathan" and g.name_survivor_src == "b"
    assert g.alt_survivor == "xx" and g.alt_survivor_src == "a"  # nulls lose
    assert g.city_mode == "nyc"           # 2 vs 1
    assert g.n_sum == 6 and g.n_max == 3
    s = out["z"]
    assert s.n_members == 1 and s.city_mode is None and s.n_sum == 7

    # mode tie: equal counts -> lexicographically smallest value
    assign2 = spark.createDataFrame([("a", "a"), ("b", "a")],
                                    "conv_id string, cluster_id string")
    ents2 = spark.createDataFrame([("a", "q"), ("b", "p")],
                                  "conv_id string, city string")
    tie = golden_records(assign2, ents2, mode=("city",)).collect()[0]
    assert tie.city_mode == "p"

    # NULL is never the mode, even when it is the most frequent value
    # (the gate oracle replicates this with WHERE ... IS NOT NULL)
    assign3 = spark.createDataFrame([(i, "a") for i in "abcde"],
                                    "conv_id string, cluster_id string")
    ents3 = spark.createDataFrame(
        [("a", None), ("b", None), ("c", None), ("d", "abc"), ("e", "abc")],
        "conv_id string, city string")
    nullmaj = golden_records(assign3, ents3, mode=("city",)).collect()[0]
    assert nullmaj.city_mode == "abc"


def test_stable_entity_ids(spark):
    """ID-stitching semantics: carried ids under merge, mutual-best on
    split (majority fragment keeps the id, minority mints), pure-new
    clusters mint, and a moved record can't collide a minted id with a
    carried one (new:/ent: namespaces)."""
    from liblevenshtein_spark.operators.clustering import stable_entity_ids

    # prev run: {a,b}=ent:a  {c,d,e}=ent:c  {z}=ent:z
    prev = spark.createDataFrame(
        [("a", "ent:a"), ("b", "ent:a"), ("c", "ent:c"), ("d", "ent:c"),
         ("e", "ent:c"), ("z", "ent:z")],
        "conv_id string, entity_id string",
    )
    # curr run: {a,b,z} merged; {c} split off; {d,e} majority fragment;
    # {q} brand new
    curr = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("z", "a"),
         ("c", "c"), ("d", "d"), ("e", "d"), ("q", "q")],
        "conv_id string, cluster_id string",
    )
    out = {r.conv_id: r for r in stable_entity_ids(prev, curr).collect()}
    assert len(out) == 7
    # merged cluster: overlap(a-cluster, ent:a)=2 beats overlap(.., ent:z)=1
    assert out["a"].entity_id == "ent:a" and out["a"].carried == 1
    assert out["z"].entity_id == "ent:a"
    # split: {d,e} has overlap 2 with ent:c, {c} only 1 -> majority carries
    assert out["d"].entity_id == "ent:c" and out["e"].entity_id == "ent:c"
    assert out["c"].entity_id == "new:c" and out["c"].carried == 0
    # brand-new record mints
    assert out["q"].entity_id == "new:q" and out["q"].carried == 0
    # uniqueness: each entity id maps to exactly one current cluster
    pairs = {(r.cluster_id, r.entity_id) for r in out.values()}
    ids = [e for _, e in pairs]
    assert len(ids) == len(set(ids))


def test_stable_entity_ids_tie_break(spark):
    """Equal overlaps resolve deterministically: cluster side prefers the
    smallest entity id, entity side the smallest cluster id."""
    from liblevenshtein_spark.operators.clustering import stable_entity_ids

    prev = spark.createDataFrame(
        [("a", "ent:p"), ("b", "ent:q")], "conv_id string, entity_id string")
    curr = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "conv_id string, cluster_id string")
    out = {r.conv_id: r for r in stable_entity_ids(prev, curr).collect()}
    # both entities overlap the merged cluster once: ent:p wins (lex min)
    assert out["a"].entity_id == "ent:p" and out["b"].entity_id == "ent:p"


def test_stable_entity_ids_chained_runs(spark):
    """Chaining output as the next run's prev with per-run mint namespaces:
    the adversarial case is a cluster that minted 'new:b' (root b) whose
    members later split so that b roots a NEW cluster while the majority
    carries the old id — with a fresh namespace the minted id cannot
    collide with the carried one, so uniqueness holds across the chain."""
    from liblevenshtein_spark.operators.clustering import stable_entity_ids

    # run 1: {b,x,y} is brand new -> mints 'new:b'
    prev1 = spark.createDataFrame(
        [("z", "ent:z")], "conv_id string, entity_id string")
    curr1 = spark.createDataFrame(
        [("b", "b"), ("x", "b"), ("y", "b"), ("z", "z")],
        "conv_id string, cluster_id string")
    run1 = stable_entity_ids(prev1, curr1)
    assert {r.entity_id for r in run1.collect()} == {"new:b", "ent:z"}

    # run 2: the cluster splits — {x,y} (root x) keeps the majority, {b}
    # is alone again; chained with a fresh namespace 'run2'
    curr2 = spark.createDataFrame(
        [("b", "b"), ("x", "x"), ("y", "x"), ("z", "z")],
        "conv_id string, cluster_id string")
    out = {r.conv_id: r for r in stable_entity_ids(
        run1.select("conv_id", "entity_id"), curr2,
        mint_namespace="run2").collect()}
    assert out["x"].entity_id == "new:b" and out["y"].entity_id == "new:b"
    assert out["b"].entity_id == "run2:b"   # no collision with carried new:b
    assert out["z"].entity_id == "ent:z"
    ids = [(r.entity_id, r.cluster_id) for r in out.values()]
    per_entity = {}
    for e, c in ids:
        assert per_entity.setdefault(e, c) == c  # uniqueness across the chain


def test_stable_entity_ids_random_parity(spark):
    """Randomized parity vs an independent pure-Python mutual-best
    reference, plus the uniqueness invariant (an entity id never lands on
    two clusters) — the gate oracle shares the SQL formulation, so this
    reference is deliberately written differently (dict scans, no
    windows)."""
    from liblevenshtein_spark.operators.clustering import stable_entity_ids

    rng = random.Random(77)
    ids = [f"v{i:03d}" for i in range(120)]
    prev_rows = [(i, f"ent:e{rng.randrange(25):02d}") for i in ids]
    # current clustering is an independent random partition
    curr_rows = [(i, f"c{rng.randrange(30):02d}") for i in ids]

    # reference: mutual best by (count desc, name asc) on both sides
    from collections import Counter
    ov = Counter()
    pe = dict(prev_rows)
    for i, c in curr_rows:
        ov[(c, pe[i])] += 1
    best_c = {}
    for (c, e), n in ov.items():
        k = (-n, e)
        if c not in best_c or k < best_c[c][0]:
            best_c[c] = (k, e)
    best_e = {}
    for (c, e), n in ov.items():
        k = (-n, c)
        if e not in best_e or k < best_e[e][0]:
            best_e[e] = (k, c)
    carried = {c: e for c, (_, e) in best_c.items() if best_e[e][1] == c}
    want = {i: carried.get(c, f"new:{c}") for i, c in curr_rows}

    prev = spark.createDataFrame(prev_rows, "conv_id string, entity_id string")
    curr = spark.createDataFrame(curr_rows, "conv_id string, cluster_id string")
    got_rows = stable_entity_ids(prev, curr).collect()
    got = {r.conv_id: r.entity_id for r in got_rows}
    assert got == want
    # uniqueness: one entity id -> at most one cluster
    m = {}
    for r in got_rows:
        assert m.setdefault(r.entity_id, r.cluster_id) == r.cluster_id


def test_fold_and_stitch_production_loop(spark):
    """The full incremental production loop: per ingest batch, FOLD the new
    match edges into the running assignment (never replaying history) and
    STITCH persistent entity ids from the previous run — three batches
    including a cross-cluster merge. Verifies (a) folded assignment equals
    one-shot CC over all edges after every batch, (b) ids persist through
    growth, (c) a merge carries exactly the mutual-best side's id while
    the absorbed cluster's id retires, (d) entity_id -> cluster stays
    functional across the whole chain."""
    from liblevenshtein_spark.operators.clustering import stable_entity_ids

    nodes = list("abcdefgh")
    ents = spark.createDataFrame([(n,) for n in nodes], "conv_id string")

    def edges(pairs):
        return spark.createDataFrame(pairs, "id_a string, id_b string")

    batches = [
        [("a", "b"), ("d", "e"), ("g", "h")],
        [("b", "c"), ("e", "f")],
        [("a", "g")],  # merges {a,b,c} with {g,h}
    ]
    assign = None
    ids = None
    seen: list = []
    for rnd, batch in enumerate(batches, start=1):
        if assign is None:
            assign = assign_clusters(ents, edges(batch))
        else:
            assign = fold_clusters(ents, assign, edges(batch))
        assign = assign.localCheckpoint(eager=True)
        seen += batch
        oneshot = {r["conv_id"]: r["cluster_id"]
                   for r in assign_clusters(ents, edges(seen)).collect()}
        folded = {r["conv_id"]: r["cluster_id"] for r in assign.collect()}
        assert folded == oneshot, f"fold != one-shot at batch {rnd}"
        prev = ids.select("conv_id", "entity_id") if ids is not None else \
            spark.createDataFrame([], "conv_id string, entity_id string")
        ids = stable_entity_ids(prev, assign,
                                mint_namespace=f"run{rnd}").localCheckpoint(eager=True)
        rows = ids.collect()
        per_entity: dict = {}
        for r in rows:
            assert per_entity.setdefault(r["entity_id"], r["cluster_id"]) == r["cluster_id"]

    final = {r["conv_id"]: r["entity_id"] for r in ids.collect()}
    # run-1 ids persisted through both growth batches and the merge
    assert final["d"] == final["e"] == final["f"] == "run1:d"
    # merged cluster carries the LARGER (mutual-best) side's run-1 id
    assert final["a"] == final["b"] == final["c"] == "run1:a"
    assert final["g"] == final["h"] == "run1:a"  # absorbed side inherits it
