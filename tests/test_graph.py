"""PageRank vs a pure-python reference on hand-built graphs."""

import pytest

from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators.graph import pagerank


def _pr_py(edges, iterations=3, damping=0.85):
    """Reference implementation: same formula as operators/graph.py
    (uniform init, weighted contributions, dangling mass spread
    uniformly)."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    outw = {}
    for u, _, w in edges:
        outw[u] = outw.get(u, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in outw)
        mass = {v: 0.0 for v in nodes}
        for u, v, w in edges:
            mass[v] += r[u] * w / outw[u]
        r = {v: (1 - damping) / n
             + damping * (mass[v] + dangling / n) for v in nodes}
    return r


@pytest.mark.parametrize("edges", [
    # simple cycle — uniform stationary distribution
    [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)],
    # star: hub 1 points everywhere, spokes point back with weights
    [(1, 2, 1.0), (1, 3, 2.0), (1, 4, 3.0),
     (2, 1, 1.0), (3, 1, 1.0), (4, 1, 1.0)],
    # dangling node 4 (no out-edges) exercises redistribution
    [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (1, 4, 2.0)],
])
def test_pagerank_matches_reference(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, weight="weight").collect()}
    want = _pr_py(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


def test_pagerank_ranks_sum_to_one(spark):
    edges = [(i, (i * 7 + 3) % 20, float(i % 4 + 1)) for i in range(40)]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    ranks = [r["rank"] for r in pagerank(df, weight="weight").collect()]
    assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_default(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    want = _pr_py([(u, v, 1.0) for u, v in edges])
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v


# --------------------------------------------------------- triangles
def _tri_py(edges):
    """Brute-force per-node triangle counts."""
    import itertools

    adj = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce(spark):
    from fashion_knowledge_graph_spark.operators.graph import triangle_counts

    # deterministic pseudo-random graph incl. a hub (node 0) — the
    # skew case the degree orientation exists for
    edges = [(i % 17, (i * i + 5) % 17) for i in range(80)]
    edges += [(0, k) for k in range(1, 17)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == _tri_py(edges)


def test_triangle_counts_duplicate_and_reversed_edges(spark):
    from fashion_knowledge_graph_spark.operators.graph import triangle_counts

    # duplicates / reversed edges / self-loops must not inflate counts
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def _py_kcore(edges, k, rounds):
    """Reference peeling over an undirected edge set {(a, b), (b, a)}."""
    e = set(edges)
    for _ in range(rounds):
        deg = {}
        for a, _b in e:
            deg[a] = deg.get(a, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    deg = {}
    for a, _b in e:
        deg[a] = deg.get(a, 0) + 1
    return deg


def test_kcore_peel_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.graph import kcore_peel

    # triangle+tail: the tail peels in round 1, which drops a triangle
    # vertex's degree — needs MULTIPLE rounds to stabilize; plus a
    # 4-clique that must survive k=2 and k=3 intact
    und = [(1, 2), (2, 3), (1, 3), (3, 4),            # triangle + tail
           (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    sym = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(sym, "src long, dst long")
    for k, rounds in ((2, 3), (3, 3), (4, 2)):
        got = {r["node"]: r["deg"]
               for r in kcore_peel(df, k=k, rounds=rounds).collect()}
        assert got == _py_kcore(sym, k, rounds), (k, rounds)


def test_kcore_clique_survives_star_peels(spark):
    from fashion_knowledge_graph_spark.operators.graph import kcore_peel

    star = [(0, i) for i in range(1, 8)]
    sym = star + [(b, a) for a, b in star]
    df = spark.createDataFrame(sym, "src long, dst long")
    # leaves have degree 1 → peel at k=2; the hub then has degree 0
    assert kcore_peel(df, k=2, rounds=2).count() == 0


def test_bfs_distances_matches_python(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        bfs_distances,
    )

    # path 1-2-3-4-5 + branch 2-10; seeds {1}; depth 3 ⇒ node 5 absent
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10)]
    sym = und + [(b, a) for a, b in und]
    e = spark.createDataFrame(sym, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e, seeds, max_depth=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}

    # multi-source: min over seeds; disconnected node 99 absent
    e2 = spark.createDataFrame(sym + [(99, 98), (98, 99)],
                               "src long, dst long")
    seeds2 = spark.createDataFrame([(1,), (5,)], "node long")
    got2 = {r["node"]: r["dist"]
            for r in bfs_distances(e2, seeds2, max_depth=2).collect()}
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2, 10: 2}


def _lpa_py(edge_list, rounds=4):
    """Reference synchronous LPA: adopt the max-weight neighbour
    label, ties to the smallest label."""
    nodes = sorted({u for u, _, _ in edge_list}
                   | {v for _, v, _ in edge_list})
    lab = {v: v for v in nodes}
    for _ in range(rounds):
        tally = {}
        for u, v, w in edge_list:
            tally.setdefault(v, {})
            tally[v][lab[u]] = tally[v].get(lab[u], 0) + w
        lab = {v: min(d, key=lambda l: (-d[l], l))
               for v, d in tally.items()}
    return lab


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by a single bridge edge must resolve to
    two communities (the bridge is outweighed by clique-internal
    votes); result equals the python reference exactly."""
    from fashion_knowledge_graph_spark.operators.graph import (
        label_propagation,
    )

    def clique(members):
        return [(a, b, 1) for a in members for b in members if a != b]

    und = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) \
        + [(4, 10, 1), (10, 4, 1)]
    df = spark.createDataFrame(und, "src long, dst long, w long")
    got = {r["node"]: r["community"] for r in
           label_propagation(df, weight="w", rounds=4).collect()}
    assert got == _lpa_py(und, rounds=4)
    # communities are the two cliques (bridge endpoints stay home)
    assert len({got[v] for v in (1, 2, 3, 4)}) == 1
    assert len({got[v] for v in (10, 11, 12, 13)}) == 1
    assert got[1] != got[10]


def test_label_propagation_weight_dominates(spark):
    """A single heavy edge outvotes many unit edges — weighted LPA,
    not just degree counting."""
    from fashion_knowledge_graph_spark.operators.graph import (
        label_propagation,
    )
    # node 5: three unit edges from {1,2,3} (labels 1,2,3 — all
    # different, each weight 1) vs one weight-5 edge from 9
    und = [(1, 5, 1), (2, 5, 1), (3, 5, 1), (9, 5, 5),
           (5, 1, 1), (5, 2, 1), (5, 3, 1), (5, 9, 5)]
    df = spark.createDataFrame(und, "src long, dst long, w long")
    got = {r["node"]: r["community"] for r in
           label_propagation(df, weight="w", rounds=1).collect()}
    assert got[5] == 9
    assert got == _lpa_py(und, rounds=1)


def _ppr_py(edge_list, seed_set, iterations=3, damping=0.85):
    """Reference personalized PageRank: teleport uniform over seeds,
    init = teleport, dangling mass along the teleport vector."""
    nodes = sorted({u for u, _, _ in edge_list}
                   | {v for _, v, _ in edge_list})
    outw = {}
    for u, _, w in edge_list:
        outw[u] = outw.get(u, 0.0) + w
    tele = {v: (1.0 / len(seed_set) if v in seed_set else 0.0)
            for v in nodes}
    r = dict(tele)
    for _ in range(iterations):
        dangling = sum(r[v] for v in nodes if v not in outw)
        mass = {v: 0.0 for v in nodes}
        for u, v, w in edge_list:
            mass[v] += r[u] * w / outw[u]
        r = {v: (1 - damping) * tele[v]
             + damping * (mass[v] + dangling * tele[v]) for v in nodes}
    return r


def test_personalized_pagerank_matches_reference(spark):
    """PPR vs the python reference on a graph WITH a dangling node
    (4 has no out-edges), seeds {1, 2}."""
    edges = [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (3, 4, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    seeds = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", iterations=3, seeds=seeds).collect()}
    exp = _ppr_py(edges, {1, 2}, iterations=3)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # proximity property: the seed neighborhood outranks the far node
    assert got[2] > got[4]


def test_personalized_pagerank_uniform_seeds_equals_classic(spark):
    """Seeding EVERY node reduces PPR to classic PageRank exactly."""
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "node long")
    classic = {r["node"]: r["rank"] for r in
               pagerank(df, weight="w", iterations=3).collect()}
    ppr = {r["node"]: r["rank"] for r in
           pagerank(df, weight="w", iterations=3, seeds=seeds).collect()}
    for v in classic:
        assert ppr[v] == pytest.approx(classic[v], abs=1e-12)


def test_link_prediction_matches_python(spark):
    """Adamic-Adar vs a direct python replay on a small graph; pairs
    already connected must be absent."""
    import math

    from fashion_knowledge_graph_spark.operators.graph import (
        link_prediction,
    )
    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 1)]
    df = spark.createDataFrame(und, "src long, dst long")
    got = {(r["node_a"], r["node_b"]):
           (r["common_neighbors"], r["adamic_adar"])
           for r in link_prediction(df).collect()}

    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    exist = {tuple(sorted(e)) for e in und}
    exp = {}
    nodes = sorted(nbr)
    for i in nodes:
        for j in nodes:
            if i >= j or (i, j) in exist:
                continue
            common = nbr[i] & nbr[j]
            if common:
                exp[(i, j)] = (len(common), round(
                    sum(1.0 / math.log(len(nbr[z])) for z in common), 6))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=1e-6)
    assert exp, "fixture must predict at least one link"


def test_link_prediction_max_degree_drops_hub_pivots(spark):
    """With max_degree=2 the star hub stops contributing wedges —
    only chain pivots predict links."""
    from fashion_knowledge_graph_spark.operators.graph import (
        link_prediction,
    )
    # star: hub 0 connects 1..4 (deg 4); chain 1-2 gives pivot deg 2
    und = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    df = spark.createDataFrame(und, "src long, dst long")
    full = {(r["node_a"], r["node_b"])
            for r in link_prediction(df).collect()}
    capped = {(r["node_a"], r["node_b"])
              for r in link_prediction(df, max_degree=2).collect()}
    # hub-pivot pairs like (3,4) vanish; pairs via deg-2 pivots stay
    assert (3, 4) in full and (3, 4) not in capped
    assert capped.issubset(full)


def test_neighbor_jaccard_matches_python(spark):
    """Neighborhood Jaccard vs a direct python set replay; connected
    pairs are INCLUDED (similarity, not prediction), and the
    degree-derived union must equal the true set union."""
    from fashion_knowledge_graph_spark.operators.graph import (
        neighbor_jaccard,
    )
    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 1)]
    df = spark.createDataFrame(und, "src long, dst long")
    got = {(r["node_a"], r["node_b"]):
           (r["common_neighbors"], r["jaccard"])
           for r in neighbor_jaccard(df).collect()}

    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    exp = {}
    nodes = sorted(nbr)
    for i in nodes:
        for j in nodes:
            if i >= j:
                continue
            common = nbr[i] & nbr[j]
            if common:
                exp[(i, j)] = (len(common),
                               len(common) / len(nbr[i] | nbr[j]))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert abs(got[k][1] - exp[k][1]) < 1e-12


def test_neighbor_jaccard_capped_scores_are_lower_bounds(spark):
    """max_degree prunes wedge ENUMERATION through hubs while the
    denominator keeps TRUE degrees, so capped scores are a LOWER
    BOUND on the true Jaccard: exact when every common neighbor of a
    pair is below the cap, undercounted when the pair also shares a
    capped hub (the hub wedge leaves the numerator, not the union)."""
    from fashion_knowledge_graph_spark.operators.graph import (
        neighbor_jaccard,
    )
    # pure-hub fixture: hub 0 connects 1..4; chain 1-2 exists;
    # pivots 1 and 2 have deg 2 → surviving pairs share NO capped
    # neighbor, scores exact
    und = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    df = spark.createDataFrame(und, "src long, dst long")
    capped = {(r["node_a"], r["node_b"]):
              (r["common_neighbors"], r["jaccard"])
              for r in neighbor_jaccard(df, max_degree=2).collect()}
    # only wedges through deg≤2 pivots survive: pivot 1 → (0,2),
    # pivot 2 → (0,1); their jaccard uses TRUE degrees
    # deg(0)=4, deg(1)=deg(2)=2
    assert capped == {(0, 1): (1, 1 / (4 + 2 - 1)),
                      (0, 2): (1, 1 / (4 + 2 - 1))}

    # mixed fixture (the ADVICE counterexample): pair (1,2) shares
    # capped hub 0 (deg 4) AND below-cap neighbor 5 (deg 2). True
    # common=2, jaccard=2/(2+2-2)=1.0; capped drops the hub wedge →
    # common=1, jaccard=1/(2+2-1)=1/3 — a strict lower bound, never
    # reported as exact.
    und2 = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 5), (2, 5)]
    df2 = spark.createDataFrame(und2, "src long, dst long")
    full2 = {(r["node_a"], r["node_b"]):
             (r["common_neighbors"], r["jaccard"])
             for r in neighbor_jaccard(df2).collect()}
    cap2 = {(r["node_a"], r["node_b"]):
            (r["common_neighbors"], r["jaccard"])
            for r in neighbor_jaccard(df2, max_degree=2).collect()}
    assert full2[(1, 2)] == (2, pytest.approx(1.0))
    assert cap2[(1, 2)] == (1, pytest.approx(1 / 3))
    # lower-bound property holds for every surviving pair
    for k, (c, j) in cap2.items():
        assert c <= full2[k][0] and j <= full2[k][1] + 1e-12


def test_pagerank_seeds_outside_graph_do_not_leak_mass(spark):
    """Seeds absent from the graph are intersected away BEFORE the
    teleport vector is normalized — rank mass stays 1.0 instead of
    leaking every iteration; an all-foreign seed set raises."""
    from fashion_knowledge_graph_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    in_graph = spark.createDataFrame([(1,)], "node long")
    mixed = spark.createDataFrame([(1,), (99,), (100,)], "node long")
    r_in = {r["node"]: r["rank"]
            for r in pagerank(df, seeds=in_graph, iterations=3).collect()}
    r_mixed = {r["node"]: r["rank"]
               for r in pagerank(df, seeds=mixed, iterations=3).collect()}
    # foreign seeds 99/100 are dropped → identical result to seed {1}
    assert r_mixed == pytest.approx(r_in)
    assert sum(r_mixed.values()) == pytest.approx(1.0)
    foreign = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="present in the graph"):
        pagerank(df, seeds=foreign, iterations=1)


def test_deterministic_walks_match_python(spark):
    """Walk corpus vs a direct python replay of the md5 arg-min hop
    rule — byte-identical reproducibility is the operator's whole
    point, so the test IS the spec."""
    import hashlib

    from fashion_knowledge_graph_spark.operators.graph import (
        deterministic_walks,
    )
    und = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(und, "src long, dst long")
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in deterministic_walks(df, steps=3,
                                        walks_per_node=2).collect()}

    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    exp = {}
    for node in nbr:
        for r in range(2):
            w = node * 2 + r
            cur = node
            exp[(w, 0)] = cur
            for t in range(1, 4):
                cur = min(nbr[cur], key=lambda x: hashlib.md5(
                    f"{w}:{t}:{cur}:{x}".encode()).hexdigest())
                exp[(w, t)] = cur
    assert got == exp


def test_deterministic_walks_rerun_identical(spark):
    """Two independent builds of the same corpus are row-identical
    (the resumability property RNG-based walkers lose)."""
    from fashion_knowledge_graph_spark.operators.graph import (
        deterministic_walks,
    )
    und = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(und, "src long, dst long")
    r1 = sorted(map(tuple, deterministic_walks(df, 2, 1).collect()))
    r2 = sorted(map(tuple, deterministic_walks(df, 2, 1).collect()))
    assert r1 == r2 and len(r1) == 4 * 3


def test_clustering_coefficient_matches_python(spark):
    """Local clustering coefficient vs a direct python replay:
    coeff = 2·T(v)/(deg·(deg−1)); deg≥2 nodes with zero triangles
    are KEPT at coeff 0 (left join, not inner)."""
    from fashion_knowledge_graph_spark.operators.graph import (
        clustering_coefficient,
    )
    # triangle 1-2-3 + pendant path 3-4-5 (node 4 has deg 2, 0 tris)
    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(und, "src long, dst long")
    got = {r["node"]: (r["deg"], r["triangles"], r["coeff"])
           for r in clustering_coefficient(df).collect()}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    exp = {}
    for v, ns in nbr.items():
        d = len(ns)
        if d < 2:
            continue
        tri = sum(1 for a in ns for b in ns
                  if a < b and b in nbr[a])
        exp[v] = (d, tri, 2.0 * tri / (d * (d - 1)))
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0] and got[k][1] == exp[k][1]
        assert got[k][2] == pytest.approx(exp[k][2], abs=1e-12)
    assert got[4] == (2, 0, 0.0)   # zero-triangle node kept


def test_shortest_paths_matches_python(spark):
    """Fixed-round Bellman-Ford vs a python replay; integer weights,
    directed edges, multi-source min."""
    from fashion_knowledge_graph_spark.operators.graph import (
        shortest_paths,
    )
    edges = [(1, 2, 4), (2, 3, 1), (1, 3, 10), (3, 4, 2), (4, 1, 1),
             (5, 1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,), (5,)], "node long")
    for rounds in (1, 2, 3):
        got = {r["node"]: r["dist"]
               for r in shortest_paths(df, seeds, rounds,
                                       weight="w").collect()}
        exp = {1: 0, 5: 0}
        for _ in range(rounds):
            nxt = dict(exp)
            for u, v, w in edges:
                if u in exp:
                    nxt[v] = min(nxt.get(v, 1 << 60), exp[u] + w)
            exp = nxt
        assert got == exp
    # rounds=3 already sees the cheap 1→2→3 path beat direct 1→3
    got3 = {r["node"]: r["dist"]
            for r in shortest_paths(df, seeds, 3, weight="w").collect()}
    assert got3[3] == 5


def test_hits_matches_python(spark):
    """HITS hubs/authorities vs a python replay with L1
    normalization each half-step."""
    from fashion_knowledge_graph_spark.operators.graph import hits
    edges = [(1, 3), (2, 3), (1, 4), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["hub"], r["authority"])
           for r in hits(df, iterations=3).collect()}
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(3):
        a = {v: 0.0 for v in nodes}
        for u, v in edges:
            a[v] += h[u]
        tot = sum(a.values())
        a = {v: x / tot for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for u, v in edges:
            h[u] += a[v]
        tot = sum(h.values())
        h = {v: x / tot for v, x in h.items()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v][0] == pytest.approx(h[v], abs=1e-12)
        assert got[v][1] == pytest.approx(a[v], abs=1e-12)
    # L1 invariants: both columns sum to 1
    assert sum(x for x, _ in got.values()) == pytest.approx(1.0)
    assert sum(y for _, y in got.values()) == pytest.approx(1.0)


def test_modularity_matches_python(spark):
    """Per-community Q contributions vs a direct python replay of
    Newman's formula on a two-clique-plus-bridge graph; the known
    good assignment scores higher than the everything-in-one bucket."""
    from fashion_knowledge_graph_spark.operators.graph import modularity

    und = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    sym = [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und]
    e = spark.createDataFrame(sym, "src long, dst long, weight long")
    comm = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        "node long, community long")
    got = {r["community"]: (r["n_nodes"], r["internal_weight"],
                            r["degree_weight"], r["contribution"])
           for r in modularity(e, comm, weight="weight").collect()}

    w2 = 2 * len(und)                     # symmetrized total = 14*... 
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = {1: 10, 2: 10, 3: 10, 4: 20, 5: 20, 6: 20}
    for c in (10, 20):
        int2 = sum(2 for a, b in und if lab[a] == c and lab[b] == c)
        degw = sum(deg[v] for v in lab if lab[v] == c)
        contrib = round(int2 / w2 - (degw / w2) ** 2, 9)
        assert got[c][0] == 3
        assert got[c][1] == int2 and got[c][2] == degw
        assert got[c][3] == pytest.approx(contrib, abs=1e-12)
    q_good = sum(v[3] for v in got.values())

    one = spark.createDataFrame([(v, 1) for v in lab],
                                "node long, community long")
    q_one = sum(r["contribution"]
                for r in modularity(e, one, weight="weight").collect())
    assert q_good > q_one
    assert q_one == pytest.approx(0.0, abs=1e-9)   # all-in-one ⇒ Q = 0


def test_hits_and_modularity_reject_empty_graphs(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        hits, modularity,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="non-empty"):
        hits(empty)
    comm = spark.createDataFrame([(1, 1)], "node long, community long")
    with pytest.raises(ValueError, match="non-empty"):
        modularity(empty.withColumn("weight", F.lit(1)), comm,
                   weight="weight")


def test_pagerank_checkpointed_resume_equals_oneshot(spark, tmp_path):
    """Interrupt-and-resume converges to the EXACT one-shot ranks:
    2 iterations committed, process 'dies', a fresh call finishes the
    remaining 2 from the stored snapshot — bit-equal to 4 straight
    iterations; the intermediate commit stays time-travelable."""
    from fashion_knowledge_graph_spark.operators.graph import (
        pagerank, pagerank_checkpointed,
    )
    from fashion_knowledge_graph_spark.sources.tables import SnapshotTable

    edges = [(1, 2, 2.0), (2, 3, 1.0), (3, 1, 1.0), (1, 4, 1.0),
             (4, 2, 3.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    oneshot = {r["node"]: r["rank"]
               for r in pagerank(df, weight="weight",
                                 iterations=4).collect()}

    t = SnapshotTable(str(tmp_path / "pr"))
    # run only 2 of 4 iterations, then 'crash'
    pagerank_checkpointed(df, t, iterations=2, chunk=1, weight="weight")
    mid_snapshot = t.current_snapshot()
    assert t._manifest(mid_snapshot)["stage"] == "pr_iter_2"
    # fresh invocation resumes at iteration 2 and finishes
    got = {r["node"]: r["rank"]
           for r in pagerank_checkpointed(df, t, iterations=4,
                                          chunk=1,
                                          weight="weight").collect()}
    assert got == oneshot                      # EXACT, not approx
    assert t._manifest(t.current_snapshot())["stage"] == "pr_iter_4"
    # chunked commits double as rank history (time travel)
    mid = {r["node"]: r["rank"]
           for r in t.read(spark, snapshot_id=mid_snapshot).collect()}
    two = {r["node"]: r["rank"]
           for r in pagerank(df, weight="weight",
                             iterations=2).collect()}
    assert mid == two

    # idempotent re-run: already complete → no extra commits
    before = t.current_snapshot()
    pagerank_checkpointed(df, t, iterations=4, chunk=1, weight="weight")
    assert t.current_snapshot() == before


def test_degree_stats_matches_python(spark):
    import math

    from fashion_knowledge_graph_spark.operators.graph import degree_stats

    # star (hub deg 4) + triangle, one shared node
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = degree_stats(df, dmin=2).first()

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(edges)
    assert row.max_degree == max(deg.values())
    assert abs(row.mean_degree - sum(deg.values()) / len(deg)) < 1e-12
    tail = [d for d in deg.values() if d >= 2]
    alpha = 1 + len(tail) / sum(math.log(d / 1.5) for d in tail)
    assert abs(row.alpha_hill - alpha) < 1e-9


def test_degree_assortativity_matches_python(spark):
    import math

    from fashion_knowledge_graph_spark.operators.graph import (
        degree_assortativity,
    )
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = degree_assortativity(df).first()

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ends = [(deg[a], deg[b]) for a, b in edges] + \
           [(deg[b], deg[a]) for a, b in edges]
    m = len(ends)
    s1 = sum(x for x, _ in ends)
    s2 = sum(y for _, y in ends)
    s12 = sum(x * y for x, y in ends)
    s11 = sum(x * x for x, _ in ends)
    s22 = sum(y * y for _, y in ends)
    r = (m * s12 - s1 * s2) / math.sqrt(
        (m * s11 - s1 * s1) * (m * s22 - s2 * s2))
    assert row.n_edge_ends == m
    assert abs(row.r - r) < 1e-12
    assert row.r < 0  # star+triangle: hubs wire to leaves


def test_degree_assortativity_regular_graph_degenerate(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        degree_assortativity,
    )
    # 4-cycle: every degree equal ⇒ zero variance ⇒ r undefined/null
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0)],
                               "src bigint, dst bigint")
    row = degree_assortativity(df).first()
    assert row.r is None


def test_harmonic_centrality_python_parity(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        harmonic_centrality,
    )
    # path a-b-c-d-e plus branch c-f, symmetrized
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("c", "f")]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("f",)], "node string")
    got = {r.node: (r.n_reached, r.harmonic) for r in
           harmonic_centrality(df, seeds, max_depth=3).collect()}
    # python BFS replay
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
    import collections
    want = {}
    for s in ("a", "f"):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            if dist[u] == 3:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if d > 0:
                n, h = want.get(v, (0, 0.0))
                want[v] = (n + 1, h + 1.0 / d)
    want = {v: (n, round(h, 6)) for v, (n, h) in want.items()}
    assert got == want
    # depth cutoff: e is 4 hops from a -> only reached from f side? no:
    # f-c-d-e is 3 hops, so e IS reached from f but not from a
    assert got["e"] == (1, round(1.0 / 3, 6))
    # seeds see each other: a-b-c-f = 3 hops
    assert got["f"][0] >= 1 and got["a"][0] >= 1


def _brandes_py(edges, seeds, max_depth):
    """Textbook Brandes restricted to paths of <= max_depth hops."""
    import collections
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    bc = collections.defaultdict(float)
    for s in seeds:
        dist = {s: 0}
        sigma = collections.defaultdict(int)
        sigma[s] = 1
        preds = collections.defaultdict(list)
        order = [s]
        q = collections.deque([s])
        while q:
            u = q.popleft()
            if dist[u] == max_depth:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: round(x, 6) for v, x in bc.items() if round(x, 6) > 0}


def test_betweenness_sampled_python_parity(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        betweenness_sampled,
    )
    # diamond + tail: two equal shortest paths a-b-d / a-c-d split
    # sigma; e hangs off d
    und = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    got = {r.node: r.betweenness for r in
           betweenness_sampled(df, seeds, max_depth=3).collect()}
    assert got == _brandes_py(und, ["a", "e"], 3)
    # the path-count split is visible: from a, b and c each carry
    # sigma 1 of d's sigma 2 -> each gets 0.5·(1+delta(d))
    assert got["b"] == got["c"]


def test_betweenness_all_seeds_star(spark):
    from fashion_knowledge_graph_spark.operators.graph import (
        betweenness_sampled,
    )
    # star: hub h between every leaf pair; with ALL nodes as seeds
    # betweenness(h) = 2·C(3,2) = 6 (undirected double count)
    und = [("h", "x"), ("h", "y"), ("h", "z")]
    edges = und + [(y, x) for x, y in und]
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame(
        [("h",), ("x",), ("y",), ("z",)], "node string")
    got = {r.node: r.betweenness for r in
           betweenness_sampled(df, seeds, max_depth=3).collect()}
    assert got == {"h": 6.0}
    assert got == _brandes_py(und, ["h", "x", "y", "z"], 3)


def test_ktruss_peel_python_parity_and_cascade(spark):
    from fashion_knowledge_graph_spark.operators.graph import ktruss_peel
    # two triangles sharing edge (b,c), plus a pendant edge and a
    # "weak" triangle hanging off d that dies once (d,e) peels
    und = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
           ("d", "e"), ("e", "f"), ("d", "f"), ("x", "y")]
    df = spark.createDataFrame(und, "src string, dst string")

    def truss_py(edges, k, rounds):
        cur = {tuple(sorted(e)) for e in edges}
        for _ in range(rounds):
            es = cur
            sup = {e: 0 for e in es}
            nodes = sorted({v for e in es for v in e})
            for i, a in enumerate(nodes):
                for b in nodes[i + 1:]:
                    if (a, b) not in es:
                        continue
                    for c in nodes:
                        if c <= b:
                            continue
                        if (tuple(sorted((a, c))) in es
                                and tuple(sorted((b, c))) in es
                                and (a, b) < (a, c)):
                            for e in ((a, b), tuple(sorted((a, c))),
                                      tuple(sorted((b, c)))):
                                sup[e] += 1
            cur = {e for e in es if sup[e] >= k - 2}
            final = {e: sup[e] for e in cur}
        return final

    for k, rounds in ((3, 1), (3, 3), (4, 2)):
        got = {(r.a, r.b): r.support for r in
               ktruss_peel(df, k=k, rounds=rounds).collect()}
        want = truss_py(und, k, rounds)
        assert got == want, (k, rounds, got, want)
    # k=3, enough rounds: the 4-clique-ish core {a,b,c,d} triangles
    # survive; pendant and (x,y) gone; the d-e-f triangle SURVIVES
    # (it is its own 3-truss)
    got3 = {(r.a, r.b) for r in ktruss_peel(df, k=3, rounds=3).collect()}
    assert ("x", "y") not in got3 and ("a", "b") in got3
    assert ("d", "e") in got3  # triangle d-e-f is 3-truss
    # k=4: only edges in >=2 triangles survive round 1, then cascade
    # kills everything (no 4-truss here)
    got4 = {(r.a, r.b) for r in ktruss_peel(df, k=4, rounds=3).collect()}
    assert got4 == set()


def test_luby_mis_python_parity_and_invariants(spark):
    import hashlib

    from fashion_knowledge_graph_spark.operators.graph import luby_mis

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),  # 4-cycle
           ("c", "e"), ("f", "g"), ("h", "h2")]             # tail + 2 comps
    df = spark.createDataFrame(und, "src string, dst string")
    got = {r.node: r.mis_round for r in
           luby_mis(df, rounds=4).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # python replay of the derandomized rounds
    adj = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    active = set(adj)
    want = {}
    for r in range(1, 5):
        pri = {v: (h60(f"{r}:{v}"), v) for v in active}
        winners = {v for v in active
                   if all(pri[v] < pri[u] for u in adj[v] if u in active)}
        for v in winners:
            want[v] = r
        dead = set(winners)
        for v in winners:
            dead |= adj[v] & active
        active -= dead
    assert got == want
    # independence: no two MIS members adjacent
    mis = set(got)
    assert not any(y in mis and x in mis for x, y in und)
    # maximality after enough rounds: every non-MIS node has a MIS
    # neighbor
    for v in adj:
        assert v in mis or adj[v] & mis, v
