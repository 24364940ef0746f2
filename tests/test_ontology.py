"""Ontology operators: transitive closure, entailment, SHACL-lite
report, symmetric closure — pinned against tiny hand-computable
fixtures plus the taxonomy hierarchy itself."""

import pytest

from fashion_knowledge_graph_spark import taxonomy as tax
from fashion_knowledge_graph_spark.operators import ontology as onto


def _closure_pdf(spark, edges):
    df = spark.createDataFrame(edges, "child string, parent string")
    return (onto.transitive_closure(df).toPandas()
            .sort_values(["child", "parent"]).reset_index(drop=True))


def test_transitive_closure_chain(spark):
    # a->b->c->d->e: closure has all 10 pairs with shortest depths
    out = _closure_pdf(spark, [("a", "b"), ("b", "c"),
                               ("c", "d"), ("d", "e")])
    got = {(r.child, r.parent): r.depth for r in out.itertuples()}
    assert len(got) == 10
    assert got[("a", "e")] == 4 and got[("a", "b")] == 1
    assert got[("b", "d")] == 2


def test_transitive_closure_dag_min_depth(spark):
    # diamond with a shortcut: a->b->d, a->c->d, a->d directly
    out = _closure_pdf(spark, [("a", "b"), ("b", "d"),
                               ("a", "c"), ("c", "d"), ("a", "d")])
    got = {(r.child, r.parent): r.depth for r in out.itertuples()}
    assert got[("a", "d")] == 1  # shortest path wins


def test_transitive_closure_cycle_terminates(spark):
    out = _closure_pdf(spark, [("a", "b"), ("b", "a")])
    got = {(r.child, r.parent): r.depth for r in out.itertuples()}
    # cycle: every ordered pair incl. self-reach at depth 2
    assert got[("a", "b")] == 1 and got[("a", "a")] == 2
    assert len(got) == 4


def test_taxonomy_closure_depths(spark):
    out = onto.transitive_closure(onto.hierarchy_df(spark)).toPandas()
    got = {(r.child, r.parent): r.depth for r in out.itertuples()}
    # direct edge + transitively entailed root
    assert got[("red", "warm")] == 1
    assert got[("red", "color")] == 2
    assert got[("warm", "color")] == 1
    assert got[("silk", "animal")] == 1
    assert got[("silk", "material")] == 2
    n_vals = len(tax.COLOR_GROUPS) + len(tax.MATERIAL_GROUPS)
    n_groups = len(set(tax.COLOR_GROUPS.values())) \
        + len(set(tax.MATERIAL_GROUPS.values()))
    assert len(got) == 2 * n_vals + n_groups  # each value: group+root


def test_entail_ancestors(spark):
    closure = onto.transitive_closure(onto.hierarchy_df(spark))
    t = spark.createDataFrame(
        [("p1", "hasColor", "red"), ("p1", "hasMaterial", "silk"),
         ("p1", "hasStyle", "casual"),      # not in pred_map: dropped
         ("p2", "hasColor", "black"), ("p2", "hasColor", "black")],
        "subj string, pred string, obj string")
    out = {(r.subj, r.pred, r.obj) for r in
           onto.entail_ancestors(t, closure).collect()}
    assert out == {
        ("p1", "hasColorClass", "warm"), ("p1", "hasColorClass", "color"),
        ("p1", "hasMaterialClass", "animal"),
        ("p1", "hasMaterialClass", "material"),
        ("p2", "hasColorClass", "neutral"),
        ("p2", "hasColorClass", "color"),
    }


def test_shacl_report(spark):
    t = spark.createDataFrame(
        [("p1", "hasColor", "red"),
         ("p1", "hasColor", "blue"),        # functional violation
         ("p2", "hasColor", "neon"),        # range violation
         ("p1", "hasStyle", "casual"),
         ("p1", "hasStyle", "sporty"),      # multi ok
         ("p1", "unshaped", "x")],          # no shape: excluded
        "subj string, pred string, obj string")
    shapes = [
        {"pred": "hasColor", "functional": True,
         "range": ["red", "blue"]},
        {"pred": "hasStyle", "functional": False,
         "range": ["casual", "sporty"]},
    ]
    out = {r["pred"]: r.asDict()
           for r in onto.shacl_report(t, shapes).collect()}
    assert set(out) == {"hasColor", "hasStyle"}
    c = out["hasColor"]
    assert c["n_triples"] == 3 and c["n_subjects"] == 2
    assert c["n_functional_violations"] == 1
    assert c["n_range_violations"] == 1
    s = out["hasStyle"]
    assert s["n_functional_violations"] == 0
    assert s["n_range_violations"] == 0


def test_shacl_report_open_range(spark):
    t = spark.createDataFrame([("a", "complements", "b")],
                              "subj string, pred string, obj string")
    out = onto.shacl_report(
        t, [{"pred": "complements", "functional": False,
             "range": None}]).collect()
    assert out[0]["n_range_violations"] == 0


def test_symmetric_closure(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")],  # (a,b) already closed
        "subj string, obj string")
    out = {(r.subj, r.obj)
           for r in onto.symmetric_closure(pairs).collect()}
    assert out == {("c", "a")}


def test_kg_shapes_cover_all_predicates(spark):
    preds = {s["pred"] for s in onto.kg_shapes()}
    assert preds == set(tax.PREDICATES.values()) | {"complements"}


@pytest.mark.parametrize("attr,vocab", [("color", tax.COLOR_GROUPS),
                                        ("material", tax.MATERIAL_GROUPS)])
def test_hierarchy_covers_vocabulary(attr, vocab):
    # every closed-vocabulary value is classified by the hierarchy
    values = dict(tax.SCALAR_ATTRS, **tax.MULTI_ATTRS)[attr]
    assert set(vocab) == set(values)


def _plan(df) -> str:
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _triples_parquet(spark, tmp_path):
    p = str(tmp_path / "triples.parquet")
    spark.createDataFrame(
        [(f"p{i}", "hasColor", ["red", "blue", "black"][i % 3])
         for i in range(50)],
        "subj string, pred string, obj string") \
        .write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_entailment_plan_broadcasts_closure(spark, tmp_path):
    """The triple stream must never shuffle on its own: both the
    pred-map and the closure ride BroadcastExchange; the only shuffle
    is the final distinct's single hash exchange (over the already
    vocabulary-bounded entailed rows)."""
    import re
    t = _triples_parquet(spark, tmp_path)
    closure = onto.transitive_closure(onto.hierarchy_df(spark))
    plan = _plan(onto.entail_ancestors(t, closure))
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_shacl_plan_joins_are_broadcast_only(spark, tmp_path):
    """Shapes and ranges are vocabulary dims: every join in the report
    plan must be broadcast — a shuffled join here would drag the full
    triple stream through an exchange keyed on predicate (massive
    skew: a handful of predicates carry 10^12 rows)."""
    import re
    t = _triples_parquet(spark, tmp_path)
    plan = _plan(onto.shacl_report(t, onto.kg_shapes()))
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2, plan
