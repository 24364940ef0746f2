"""SPARQL-style BGP compiler: variable binding, constant pushdown,
join planning, OPTIONAL semantics — pinned on a hand-computable
triple fixture."""

import pytest

from fashion_knowledge_graph_spark.operators import bgp


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("p1", "type", "dress"), ("p1", "hasColor", "black"),
        ("p1", "hasStyle", "party"), ("p1", "gender", "women"),
        ("p2", "type", "shoes"), ("p2", "hasColor", "black"),
        ("p2", "hasStyle", "party"),
        ("p3", "type", "shoes"), ("p3", "hasColor", "red"),
        ("p3", "hasStyle", "casual"),
        ("p4", "type", "dress"), ("p4", "hasColor", "red"),
        ("p4", "hasStyle", "casual"), ("p4", "gender", "unisex"),
        ("p1", "complements", "p2"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_star_pattern(triples):
    out = bgp.bgp_query(triples, [("?x", "type", "dress"),
                                  ("?x", "hasColor", "black")])
    assert _rows(out) == {("p1",)}


def test_shared_variable_join(triples):
    # items of different kinds sharing a style
    out = bgp.bgp_query(triples, [("?x", "type", "dress"),
                                  ("?y", "type", "shoes"),
                                  ("?x", "hasStyle", "?s"),
                                  ("?y", "hasStyle", "?s")])
    got = _rows(out.select("x", "y", "s"))
    assert got == {("p1", "p2", "party"), ("p4", "p3", "casual")}


def test_optional_left_join(triples):
    out = bgp.bgp_query(triples, [("?x", "type", "dress")],
                        optionals=[("?x", "gender", "?g")])
    assert _rows(out.select("x", "g")) == {("p1", "women"),
                                           ("p4", "unisex")}
    out2 = bgp.bgp_query(triples, [("?x", "type", "shoes")],
                         optionals=[("?x", "gender", "?g")])
    assert _rows(out2.select("x", "g")) == {("p2", None), ("p3", None)}


def test_variable_predicate(triples):
    out = bgp.bgp_query(triples, [("p1", "?p", "?o")])
    assert ("hasColor", "black") in _rows(out.select("p", "o"))
    assert out.count() == 5


def test_path_pattern(triples):
    # ?a complements ?b, both with their colors bound
    out = bgp.bgp_query(triples, [("?a", "complements", "?b"),
                                  ("?a", "hasColor", "?ca"),
                                  ("?b", "hasColor", "?cb")])
    assert _rows(out.select("a", "b", "ca", "cb")) == {
        ("p1", "p2", "black", "black")}


def test_repeated_variable_in_pattern(spark):
    t = spark.createDataFrame([("a", "sameAs", "a"), ("a", "sameAs", "b")],
                              "subj string, pred string, obj string")
    out = bgp.bgp_query(t, [("?x", "sameAs", "?x")])
    assert _rows(out) == {("a",)}


def test_disconnected_raises(triples):
    with pytest.raises(ValueError, match="disconnected"):
        bgp.bgp_query(triples, [("?x", "type", "dress"),
                                ("?y", "hasColor", "red")])


def test_optional_must_share_raises(triples):
    with pytest.raises(ValueError, match="OPTIONAL"):
        bgp.bgp_query(triples, [("?x", "type", "dress")],
                      optionals=[("?z", "hasColor", "?c")])


def test_no_variable_pattern_raises(triples):
    with pytest.raises(ValueError, match="binds no variable"):
        bgp.bgp_query(triples, [("p1", "type", "dress")])


def test_bag_vs_set_semantics(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "x")],  # duplicate triple
        "subj string, pred string, obj string")
    assert bgp.bgp_query(t, [("?s", "p", "x")]).count() == 1
    assert bgp.bgp_query(t, [("?s", "p", "x")],
                         distinct=False).count() == 2


def test_constants_pushed_before_joins(spark, tmp_path):
    """Every arm's constant filters must reach its scan as
    PushedFilters — no post-join filtering of pattern constants."""
    import contextlib
    import io
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("p1", "type", "dress"), ("p1", "hasColor", "black")],
        "subj string, pred string, obj string") \
        .write.mode("overwrite").parquet(p)
    t = spark.read.parquet(p)
    out = bgp.bgp_query(t, [("?x", "type", "dress"),
                            ("?x", "hasColor", "black")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "EqualTo(pred,type)" in plan.replace(" ", ""), plan
    assert "EqualTo(pred,hasColor)" in plan.replace(" ", ""), plan

@pytest.fixture(scope="module")
def chain(spark):
    return spark.createDataFrame(
        [("a", "next", "b"), ("b", "next", "c"), ("c", "next", "d"),
         ("a", "hasColor", "red"), ("d", "hasColor", "blue")],
        "subj string, pred string, obj string")


def test_property_path_all_pairs(chain):
    out = bgp.property_path(chain, "next", max_hops=3)
    assert _rows(out) == {("a", "b"), ("b", "c"), ("c", "d"),
                          ("a", "c"), ("b", "d"), ("a", "d")}


def test_property_path_hop_bound(chain):
    out = bgp.property_path(chain, "next", max_hops=2)
    assert ("a", "d") not in _rows(out)
    assert ("a", "c") in _rows(out)


def test_property_path_seeded_start(chain):
    out = bgp.property_path(chain, "next", max_hops=3, start="b")
    assert _rows(out) == {("b", "c"), ("b", "d")}


def test_path_pattern_in_bgp(chain):
    # everything transitively after ?x=a, with its color OPTIONAL
    out = bgp.bgp_query(chain, [("a", "next+", "?y")],
                        optionals=[("?y", "hasColor", "?c")])
    assert _rows(out.select("y", "c")) == {("b", None), ("c", None),
                                           ("d", "blue")}


def test_path_pattern_joins_with_plain_pattern(chain):
    # reachable pairs whose endpoints both have a color
    out = bgp.bgp_query(chain, [("?x", "next+", "?y"),
                                ("?x", "hasColor", "?cx"),
                                ("?y", "hasColor", "?cy")])
    assert _rows(out.select("x", "y", "cx", "cy")) == {
        ("a", "d", "red", "blue")}


def test_path_hops_parameter(chain):
    out = bgp.bgp_query(chain, [("?x", "next+", "?y")], path_hops=1)
    assert _rows(out.select("x", "y")) == {("a", "b"), ("b", "c"),
                                           ("c", "d")}


def test_path_cycle_terminates(spark):
    t = spark.createDataFrame([("a", "next", "b"), ("b", "next", "a")],
                              "subj string, pred string, obj string")
    out = bgp.property_path(t, "next", max_hops=10)
    assert _rows(out) == {("a", "b"), ("b", "a"),
                          ("a", "a"), ("b", "b")}


def test_negation_not_exists(triples):
    # dresses with NO gender triple: p1/p4 both have gender -> empty;
    # shoes with no gender: p2, p3
    from pyspark.sql import functions as F
    out = bgp.bgp_query(triples, [("?x", "type", "dress")],
                        negations=[("?x", "gender", "?g")])
    assert _rows(out) == set()
    out2 = bgp.bgp_query(triples, [("?x", "type", "shoes")],
                         negations=[("?x", "gender", "?g")])
    assert _rows(out2) == {("p2",), ("p3",)}
    # negation with a constant object
    out3 = bgp.bgp_query(triples, [("?x", "type", "dress")],
                         negations=[("?x", "gender", "women")])
    assert _rows(out3) == {("p4",)}


def test_negation_must_share_raises(triples):
    with pytest.raises(ValueError, match="negated"):
        bgp.bgp_query(triples, [("?x", "type", "dress")],
                      negations=[("?z", "gender", "?g")])


def test_filters_over_bindings(triples):
    from pyspark.sql import functions as F
    out = bgp.bgp_query(triples, [("?x", "hasColor", "?c")],
                        filters=[F.col("c") != "black"])
    assert _rows(out.select("x", "c")) == {("p3", "red"), ("p4", "red")}


def test_aggregate_group_count(triples):
    from pyspark.sql import functions as F
    # per style: how many items carry it, and how many distinct colors
    out = bgp.bgp_aggregate(
        triples,
        [("?x", "hasStyle", "?s"), ("?x", "hasColor", "?c")],
        group_by=["?s"],
        aggs={"n_items": F.countDistinct("x"),
              "n_colors": F.countDistinct("c")})
    assert _rows(out) == {("party", 2, 1), ("casual", 2, 1)}


def test_aggregate_having(triples):
    from pyspark.sql import functions as F
    out = bgp.bgp_aggregate(
        triples, [("?x", "hasColor", "?c")], group_by=["?c"],
        aggs={"n": F.countDistinct("x")},
        having=F.col("n") >= 2)
    assert _rows(out) == {("black", 2), ("red", 2)}


def test_aggregate_bag_semantics(spark):
    from pyspark.sql import functions as F
    dup = spark.createDataFrame(
        [("a", "p", "v"), ("a", "p", "v")],
        "subj string, pred string, obj string")
    s = bgp.bgp_aggregate(dup, [("?x", "p", "v")], ["?x"],
                          {"n": F.count(F.lit(1))})
    b = bgp.bgp_aggregate(dup, [("?x", "p", "v")], ["?x"],
                          {"n": F.count(F.lit(1))}, distinct=False)
    assert _rows(s) == {("a", 1)}
    assert _rows(b) == {("a", 2)}


def test_aggregate_unbound_group_raises(triples):
    from pyspark.sql import functions as F
    with pytest.raises(ValueError, match="not bound"):
        bgp.bgp_aggregate(triples, [("?x", "type", "dress")],
                          ["?missing"], {"n": F.count(F.lit(1))})
    with pytest.raises(ValueError, match="at least one aggregate"):
        bgp.bgp_aggregate(triples, [("?x", "type", "dress")],
                          ["?x"], {})


def test_topk_orders_and_limits(triples):
    from pyspark.sql import functions as F
    out = bgp.bgp_topk(
        triples, [("?x", "hasColor", "?c")],
        group_by=["?c"], aggs={"n": F.countDistinct("x")},
        order_by=[F.desc("n"), "?c"], k=1)
    assert [tuple(r) for r in out.collect()] == [("black", 2)]


def test_topk_plan_is_take_ordered(triples):
    from pyspark.sql import functions as F
    out = bgp.bgp_topk(triples, [("?x", "hasColor", "?c")],
                       order_by=["?c", "?x"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert [tuple(r) for r in out.collect()] == [
        ("p1", "black"), ("p2", "black"), ("p3", "red")]


def test_topk_contract_raises(triples):
    with pytest.raises(ValueError, match="k must be"):
        bgp.bgp_topk(triples, [("?x", "hasColor", "?c")],
                     order_by=["?c"], k=0)
    with pytest.raises(ValueError, match="ORDER BY"):
        bgp.bgp_topk(triples, [("?x", "hasColor", "?c")],
                     order_by=[], k=3)


def test_values_single_var_isin(triples):
    out = bgp.bgp_query(triples, [("?x", "hasColor", "?c")],
                        values=(["?c"], [("black",)]))
    assert _rows(out.select("x")) == {("p1",), ("p2",)}


def test_values_single_var_pushed_to_scan(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("p1", "hasColor", "black"), ("p2", "hasColor", "red")],
        "subj string, pred string, obj string").write.parquet(path)
    t = spark.read.parquet(path)
    out = bgp.bgp_query(t, [("?x", "hasColor", "?c")],
                        values=(["?c"], [("black",), ("navy",)]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(obj" in plan
    assert _rows(out) == {("p1", "black")}


def test_values_multi_var_broadcast_join(triples):
    out = bgp.bgp_query(
        triples, [("?x", "hasColor", "?c"), ("?x", "hasStyle", "?s")],
        values=(["?c", "?s"], [("black", "party"), ("red", "formal")]))
    assert _rows(out.select("x", "c", "s")) == {
        ("p1", "black", "party"), ("p2", "black", "party")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_values_contract_raises(triples):
    with pytest.raises(ValueError, match="not bound"):
        bgp.bgp_query(triples, [("?x", "hasColor", "?c")],
                      values=(["?zzz"], [("a",)]))
    with pytest.raises(ValueError, match="VALUES needs"):
        bgp.bgp_query(triples, [("?x", "hasColor", "?c")],
                      values=(["?c"], []))


def test_values_composes_with_aggregate(triples):
    from pyspark.sql import functions as F
    out = bgp.bgp_aggregate(
        triples, [("?x", "hasColor", "?c")], group_by=["?c"],
        aggs={"n": F.countDistinct("x")},
        values=(["?c"], [("black",), ("red",)]))
    assert _rows(out) == {("black", 2), ("red", 2)}


# --- SPARQL 1.1 path expressions: sequence / alternation / inverse ---

@pytest.fixture(scope="module")
def pathy(spark):
    rows = [
        ("p1", "hasColor", "red"), ("p2", "hasColor", "red"),
        ("p3", "hasColor", "blue"), ("p1", "hasMaterial", "wool"),
        ("p1", "complements", "p2"), ("p2", "complements", "p3"),
        ("a", "next", "b"), ("b", "hop", "c"), ("c", "next", "d"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def test_path_inverse(pathy):
    out = bgp.path_pairs(pathy, "^hasColor", 8)
    assert _rows(out) == {("red", "p1"), ("red", "p2"), ("blue", "p3")}


def test_path_sequence(pathy):
    # colors of the item each item complements
    out = bgp.path_pairs(pathy, "complements/hasColor", 8)
    assert _rows(out) == {("p1", "red"), ("p2", "blue")}


def test_path_alternation(pathy):
    out = bgp.path_pairs(pathy, "hasColor|hasMaterial", 8)
    assert _rows(out) == {("p1", "red"), ("p1", "wool"),
                          ("p2", "red"), ("p3", "blue")}


def test_path_closure_over_alternation(pathy):
    # a -next-> b -hop-> c -next-> d: (next|hop)+ closes the mixed chain
    out = bgp.path_pairs(pathy, "(next|hop)+", 8)
    assert _rows(out) == {("a", "b"), ("a", "c"), ("a", "d"),
                          ("b", "c"), ("b", "d"), ("c", "d")}


def test_path_group_inverse_distributes(pathy):
    # ^(a|b) == ^a|^b
    out = bgp.path_pairs(pathy, "^(hasColor|hasMaterial)", 8)
    alt = bgp.path_pairs(pathy, "^hasColor|^hasMaterial", 8)
    assert _rows(out) == _rows(alt) == {("red", "p1"), ("red", "p2"),
                                        ("blue", "p3"), ("wool", "p1")}


def test_path_inverse_seq_composition(pathy):
    # value -> items with that value -> what those items complement
    out = bgp.path_pairs(pathy, "^(hasColor|hasMaterial)/complements", 8)
    assert _rows(out) == {("red", "p2"), ("red", "p3"), ("wool", "p2")}


def test_path_constant_start_pushdown(pathy):
    out = bgp.path_pairs(pathy, "complements/hasColor", 8, start="p1")
    assert _rows(out) == {("p1", "red")}


def test_path_expr_in_bgp_query(pathy):
    out = bgp.bgp_query(
        pathy, [("?v", "^(hasColor|hasMaterial)/complements", "?y")])
    assert _rows(out.select("v", "y")) == {("red", "p2"), ("red", "p3"),
                                           ("wool", "p2")}


def test_path_expr_joins_with_plain_pattern(pathy):
    out = bgp.bgp_query(pathy, [("?x", "(next|hop)+", "?y"),
                                ("?x", "next", "?z")])
    assert _rows(out.select("x", "y", "z")) == {
        ("a", "b", "b"), ("a", "c", "b"), ("a", "d", "b"),
        ("c", "d", "d")}


def test_path_closure_hop_bound_on_expr(pathy):
    out = bgp.path_pairs(pathy, "(next|hop)+", 2)
    assert ("a", "d") not in _rows(out)
    assert ("a", "c") in _rows(out)


def test_path_parse_rejects():
    for bad in ("a//b", "a|(b/c)", "a++", "?x+", "a b", "(a|b", "^^a"):
        with pytest.raises(ValueError):
            bgp._parse_path(bad)


def test_plain_pred_plus_still_parses(pathy):
    # the pre-existing `pred+` syntax routes through the same parser
    out = bgp.bgp_query(pathy, [("?x", "complements+", "?y")],
                        path_hops=3)
    assert _rows(out.select("x", "y")) == {("p1", "p2"), ("p1", "p3"),
                                           ("p2", "p3")}


def test_path_negated_set(pathy):
    # one hop via any predicate NOT listed
    out = bgp.path_pairs(pathy, "!(hasColor|hasMaterial)", 8)
    assert _rows(out) == {("p1", "p2"), ("p2", "p3"), ("a", "b"),
                          ("b", "c"), ("c", "d")}


def test_path_negated_single(pathy):
    out = bgp.path_pairs(
        pathy, "!hasColor", 8)
    assert ("p1", "wool") in _rows(out) and ("p1", "red") not in _rows(out)


def test_path_negated_composes_in_sequence(pathy):
    # non-attribute hop, then the color of the target
    out = bgp.path_pairs(pathy, "!(hasColor|hasMaterial)/hasColor", 8)
    assert _rows(out) == {("p1", "red"), ("p2", "blue")}


def test_path_negated_closure(pathy):
    out = bgp.path_pairs(pathy, "!(hasColor|hasMaterial)+", 8)
    assert ("p1", "p3") in _rows(out) and ("a", "d") in _rows(out)


def test_path_negated_rejects_inverse_atoms():
    for bad in ("!(^a|b)", "!^a"):
        with pytest.raises(ValueError):
            bgp._parse_path(bad)
