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
