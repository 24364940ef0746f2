"""Forward-chaining rule engine: CONSTRUCT rewriting, fixpoint
convergence, and the rules-subsume-dedicated-operators property."""

import pytest

from fashion_knowledge_graph_spark.operators import bgp, ontology as onto
from fashion_knowledge_graph_spark.operators.rules import (
    construct,
    forward_chain,
)


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_construct_rewrites_bindings(spark):
    t = _t(spark, [("a", "complements", "b")])
    b = bgp.bgp_query(t, [("?x", "complements", "?y")])
    out = construct(b, [("?y", "complements", "?x"),
                        ("?x", "pairedWith", "?y")])
    assert _rows(out) == {("b", "complements", "a"),
                          ("a", "pairedWith", "b")}


def test_construct_unbound_head_var_raises(spark):
    t = _t(spark, [("a", "complements", "b")])
    b = bgp.bgp_query(t, [("?x", "complements", "?y")])
    with pytest.raises(ValueError, match="not bound"):
        construct(b, [("?x", "rel", "?zzz")])


def test_symmetric_rule_fixpoint(spark):
    t = _t(spark, [("a", "complements", "b"), ("b", "complements", "c")])
    out = forward_chain(
        t, [([("?x", "complements", "?y")],
             [("?y", "complements", "?x")])])
    assert _rows(out) == {
        ("a", "complements", "b"), ("b", "complements", "a"),
        ("b", "complements", "c"), ("c", "complements", "b")}


def test_transitive_rule_converges(spark):
    # depth-4 chain closes in ceil(log2) + verification rounds, well
    # under max_iters; fixpoint is the full ancestor set
    t = _t(spark, [("a", "sub", "b"), ("b", "sub", "c"),
                   ("c", "sub", "d"), ("d", "sub", "e")])
    out = forward_chain(
        t, [([("?x", "sub", "?y"), ("?y", "sub", "?z")],
             [("?x", "sub", "?z")])])
    assert out.count() == 10  # all ordered reachable pairs


def test_rules_reproduce_rdfs_entailment(spark):
    """The generic engine with subClassOf-transitivity + typing rules
    must equal the dedicated broadcast entailment operator."""
    hier = [(c, "subClassOf", p)
            for c, p in __import__(
                "fashion_knowledge_graph_spark.taxonomy",
                fromlist=["taxonomy"]).hierarchy_edges()]
    data = [("p1", "hasColor", "red"), ("p2", "hasColor", "black"),
            ("p3", "hasMaterial", "silk")]
    t = _t(spark, data + hier)
    out = forward_chain(t, [
        ([("?a", "subClassOf", "?b"), ("?b", "subClassOf", "?c")],
         [("?a", "subClassOf", "?c")]),
        ([("?x", "hasColor", "?c"), ("?c", "subClassOf", "?g")],
         [("?x", "hasColorClass", "?g")]),
        ([("?x", "hasMaterial", "?m"), ("?m", "subClassOf", "?g")],
         [("?x", "hasMaterialClass", "?g")]),
    ])
    got = {r for r in _rows(out)
           if r[1] in ("hasColorClass", "hasMaterialClass")}
    closure = onto.transitive_closure(onto.hierarchy_df(spark))
    want = {(r.subj, r.pred, r.obj)
            for r in onto.entail_ancestors(_t(spark, data),
                                           closure).collect()}
    assert got == want


def test_rule_with_constant_in_head(spark):
    t = _t(spark, [("p1", "hasColor", "red"),
                   ("p1", "hasMaterial", "silk"),
                   ("p2", "hasColor", "red")])
    out = forward_chain(t, [
        ([("?x", "hasColor", "red"), ("?x", "hasMaterial", "silk")],
         [("?x", "type", "statement-piece")])])
    derived = {r for r in _rows(out) if r[1] == "type"}
    assert derived == {("p1", "type", "statement-piece")}


def test_max_iters_bounds_runaway(spark):
    # a rule that generates fresh subjects forever... cannot (heads
    # only rearrange bound terms) — but max_iters still caps rounds:
    # the depth-7 chain needs 3 doubling rounds; give it 1 and the
    # closure must be incomplete
    rows = [(f"n{i}", "sub", f"n{i+1}") for i in range(7)]
    out = forward_chain(
        _t(spark, rows),
        [([("?x", "sub", "?y"), ("?y", "sub", "?z")],
          [("?x", "sub", "?z")])],
        max_iters=1)
    assert out.count() < 28  # full closure of a 7-edge chain


def test_semi_naive_equals_naive(spark):
    """Semi-naive rounds must reach the same fixpoint as full
    re-evaluation on a rule set that needs several rounds."""
    rows = [(f"n{i}", "sub", f"n{i+1}") for i in range(6)] + \
           [("n0", "complements", "n3")]
    rules = [
        ([("?x", "sub", "?y"), ("?y", "sub", "?z")],
         [("?x", "sub", "?z")]),
        ([("?a", "complements", "?b")],
         [("?b", "complements", "?a")]),
        # derived pred feeding another rule across rounds
        ([("?x", "sub", "?y"), ("?y", "complements", "?z")],
         [("?x", "nearTo", "?z")]),
    ]
    t = _t(spark, rows)
    out = _rows(forward_chain(t, rules))
    # independent naive reference: re-derive everything each round
    from fashion_knowledge_graph_spark.operators.rules import construct
    known = {tuple(r) for r in rows}
    for _ in range(10):
        new = set()
        sub = {(s, o) for s, p, o in known if p == "sub"}
        comp = {(s, o) for s, p, o in known if p == "complements"}
        new |= {(a, "sub", c) for a, b in sub for b2, c in sub
                if b == b2}
        new |= {(b, "complements", a) for a, b in comp}
        new |= {(x, "nearTo", z) for x, y in sub for y2, z in comp
                if y == y2}
        if new <= known:
            break
        known |= new
    assert out == known
