from pyspark.sql import functions as F

from fashion_knowledge_graph_spark.operators import mentions as mn
from tests.conftest import rows_set


def test_explode_reassemble_roundtrip(spark, docs_df):
    """Per-row invariant (input_hint): span-sequence equality
    (kind, text, media_ref, order) after explode → reassemble."""
    spans = mn.explode_spans(docs_df)
    back = mn.reassemble_spans(spans)
    orig = docs_df.select("doc_id", F.to_json("spans").alias("j"))
    rt = back.select("doc_id", F.to_json("spans").alias("j"))
    assert rows_set(orig, ["doc_id", "j"]) == rows_set(rt, ["doc_id", "j"])


def test_image_mentions_match_oracle(spark, docs_df, oracle_out):
    got = mn.image_mentions(docs_df)
    exp = oracle_out["mentions"]
    cols = ["doc_id", "span_idx", "media_ref", "label", "area"]
    assert rows_set(got, cols) == rows_set(exp, cols)
    # attribute stand-ins agree too
    got_attrs = rows_set(
        got.select("doc_id", "span_idx",
                   F.col("attrs.type").alias("type"),
                   F.col("attrs.color").alias("color"),
                   F.col("attrs.gender").alias("gender")),
        ["doc_id", "span_idx", "type", "color", "gender"])
    exp_attrs = rows_set(exp, ["doc_id", "span_idx", "type", "color", "gender"])
    assert got_attrs == exp_attrs


def test_filters_do_real_work(spark, docs_df):
    all_img = mn.explode_spans(docs_df).filter(F.col("kind") == "image_ref")
    kept = mn.image_mentions(docs_df)
    assert 0 < kept.count() < all_img.count()


def test_pregate_plus_gates_equals_kernel_filter_set(spark, docs_df):
    """The declarative gate filters over the PRE-gate rows must keep
    exactly the rows the fused kernel keeps (P3/P5/P6/P8 — the kernel
    applies them internally), tying the driver-verifiable relational
    form to the production path."""
    from fashion_knowledge_graph_spark import taxonomy as tx

    pre = mn.image_mentions_pregate(docs_df)
    gated = pre.filter(
        (F.col("label") != "Background")
        & (F.col("area") >= tx.MIN_AREA)
        & F.col("type").isNotNull())
    cols = ["doc_id", "span_idx", "label", "area", "type"]
    got = rows_set(gated.select(*cols), cols)
    kern = rows_set(
        mn.image_mentions(docs_df).select(
            "doc_id", "span_idx", "label", "area",
            F.col("attrs.type").alias("type")), cols)
    assert got == kern and got
    # and pregate really is PRE-gate: it keeps rows the kernel drops
    assert pre.count() > gated.count()


def test_mention_gates_top1_by_area(spark, docs_df):
    """W1: after the gates, exactly one mention per doc survives — the
    max-area one (ties to min span_idx)."""
    out = mn.mention_gates(mn.image_mentions_pregate(docs_df))
    rows = out.collect()
    assert rows
    per_doc = {}
    for r in rows:
        assert r["doc_id"] not in per_doc
        per_doc[r["doc_id"]] = r
    pre = mn.image_mentions_pregate(docs_df).collect()
    from fashion_knowledge_graph_spark import taxonomy as tx
    best = {}
    for r in pre:
        if (r["label"] == "Background" or r["area"] < tx.MIN_AREA
                or r["type"] is None):
            continue
        cur = best.get(r["doc_id"])
        if cur is None or (-r["area"], r["span_idx"]) < \
                (-cur["area"], cur["span_idx"]):
            best[r["doc_id"]] = r
    assert set(per_doc) == set(best)
    for d, r in per_doc.items():
        assert (r["span_idx"], r["area"]) == \
            (best[d]["span_idx"], best[d]["area"])


def test_fused_kernel_equals_udf_chain(spark, docs_df):
    """The fused mapInArrow detector must match the 3-UDF chain."""
    from fashion_knowledge_graph_spark.operators import mentions as mn

    cols = ["doc_id", "span_idx", "media_ref", "label", "area"]
    a = {tuple(r) for r in mn.image_mentions(docs_df).select(*cols).collect()}
    b = {tuple(r) for r in
         mn.image_mentions_udf_chain(docs_df).select(*cols).collect()}
    assert a == b and a
    # attrs + embeddings identical too
    ra = {(r["doc_id"], r["span_idx"]): (r["attrs"], tuple(r["embedding"]))
          for r in mn.image_mentions(docs_df).collect()}
    rb = {(r["doc_id"], r["span_idx"]): (r["attrs"], tuple(r["embedding"]))
          for r in mn.image_mentions_udf_chain(docs_df).collect()}
    assert ra == rb
