"""Span-level open-IE triples: instance gating, attribute binding,
content-addressed collapse — pinned on hand-built interleaved docs."""

from fashion_knowledge_graph_spark.operators.attributes import (
    open_ie_triples,
)


def _docs(spark, texts_per_doc):
    rows = []
    for doc_id, texts in texts_per_doc.items():
        spans, off = [], 0
        for t in texts:
            spans.append({"kind": "text", "text": t,
                          "media_ref": None, "offset": off})
            off += len(t) + 1
        spans.append({"kind": "image_ref", "text": None,
                      "media_ref": "img://x", "offset": off})
        rows.append({"doc_id": doc_id, "spans": spans})
    return spark.createDataFrame(
        rows, "doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")


def test_single_type_span_binds_attrs(spark):
    docs = _docs(spark, {"d1": ["red cotton casual dress for summer"]})
    got = {(r.pred, r.obj) for r in open_ie_triples(docs).collect()}
    assert got == {("type", "dress"), ("hasColor", "red"),
                   ("hasMaterial", "cotton"), ("hasStyle", "casual")}


def test_instances_are_per_span_not_per_doc(spark):
    docs = _docs(spark, {"d1": ["red dress", "blue shoes"]})
    out = open_ie_triples(docs).collect()
    by_inst = {}
    for r in out:
        by_inst.setdefault(r.subj, set()).add((r.pred, r.obj))
    assert len(by_inst) == 2
    assert {("type", "dress"), ("hasColor", "red")} in by_inst.values()
    assert {("type", "shoes"), ("hasColor", "blue")} in by_inst.values()
    assert all(r.subj.startswith("d1:") for r in out)


def test_zero_or_multi_type_spans_rejected(spark):
    docs = _docs(spark, {
        "d1": ["red cotton things"],           # no type word
        "d2": ["dress or skirt with a belt"],  # >1 type (dress, belt)
    })
    assert open_ie_triples(docs).count() == 0


def test_identical_spans_collapse(spark):
    docs = _docs(spark, {"d1": ["red dress", "red dress"],
                         "d2": ["red dress"]})
    out = open_ie_triples(docs).collect()
    insts = {r.subj for r in out}
    assert len(insts) == 2          # one per (doc, content)
    d1 = [i for i in insts if i.startswith("d1:")]
    d2 = [i for i in insts if i.startswith("d2:")]
    # content-addressed: same text -> same hash suffix across docs
    assert d1[0].split(":", 1)[1] == d2[0].split(":", 1)[1]


def test_hyphen_alias_surfaces(spark):
    docs = _docs(spark, {"d1": ["multi color scarf"]})
    got = {(r.pred, r.obj) for r in open_ie_triples(docs).collect()}
    assert ("hasColor", "multi-color") in got
    assert ("type", "scarf") in got


def test_link_open_ie(spark):
    from fashion_knowledge_graph_spark.operators.attributes import (
        link_open_ie,
    )
    inst = spark.createDataFrame(
        [("i1", "type", "dress", "d1"),
         ("i1", "hasColor", "red", "d1"),
         ("i1", "hasMaterial", "silk", "d1"),
         ("i1", "hasStyle", "party", "d1"),
         ("i2", "type", "shoes", "d1"),
         ("i2", "hasColor", "green", "d1")],
        "subj string, pred string, obj string, doc_id string")
    catalog = spark.createDataFrame(
        [("p1", "dress", "red", ["silk", "lace"], ["party"]),
         ("p2", "dress", "red", ["cotton"], ["casual"]),
         ("p3", "dress", "blue", ["silk"], ["party"]),
         ("p4", "shoes", "black", ["leather"], ["formal"])],
        "product_id string, type string, color string, "
        "material array<string>, style array<string>")
    out = {(r.subj, r.product_id, r.score)
           for r in link_open_ie(inst, catalog).collect()}
    # i1: p1 and p2 are (type,color) candidates; p1 wins on overlap 2
    # (silk + party); p3 fails the color gate. i2: no candidate.
    assert out == {("i1", "p1", 2)}


def test_link_open_ie_tiebreak(spark):
    from fashion_knowledge_graph_spark.operators.attributes import (
        link_open_ie,
    )
    inst = spark.createDataFrame(
        [("i1", "type", "hat", "d1"), ("i1", "hasColor", "red", "d1")],
        "subj string, pred string, obj string, doc_id string")
    catalog = spark.createDataFrame(
        [("p9", "hat", "red", [], []), ("p2", "hat", "red", [], [])],
        "product_id string, type string, color string, "
        "material array<string>, style array<string>")
    out = link_open_ie(inst, catalog).collect()
    assert len(out) == 1 and out[0].product_id == "p2"  # id-asc tie
