from fashion_knowledge_graph_spark.operators import edges as ed
from fashion_knowledge_graph_spark.operators import linking as lk
from fashion_knowledge_graph_spark.operators import mentions as mn
from tests.conftest import rows_set


def _linked(docs_df, catalog_df):
    return lk.link_exact(mn.image_mentions(docs_df), catalog_df)


def test_pairs_match_oracle(spark, docs_df, catalog_df, oracle_out):
    pairs = ed.cooccurrence_pairs(_linked(docs_df, catalog_df))
    cols = ["src", "dst", "rel_type", "image"]
    assert rows_set(pairs, cols) == rows_set(oracle_out["pairs"], cols)


def test_edges_match_oracle(spark, docs_df, catalog_df, oracle_out):
    got = ed.aggregate_edges(ed.cooccurrence_pairs(_linked(docs_df, catalog_df)))
    cols = ["src", "dst", "rel_type", "weight", "images", "source"]
    assert rows_set(got, cols) == rows_set(oracle_out["edges"], cols)
    # co-occurrence weights really exceed 1 somewhere (fixture sanity)
    assert got.filter("weight > 1").count() > 0


def test_rel_type_rule(spark, docs_df, catalog_df):
    """same category ⇒ COMPLEMENTED_BY else WORN_WITH
    (process_social_media_images.py:124-131)."""
    pairs = ed.cooccurrence_pairs(_linked(docs_df, catalog_df))
    bad = pairs.filter(
        "(cat1 = cat2 AND rel_type != 'COMPLEMENTED_BY') OR "
        "(cat1 != cat2 AND rel_type != 'WORN_WITH')")
    assert bad.count() == 0


def test_merge_edge_delta_equals_full_aggregation(spark, docs_df,
                                                  catalog_df):
    """Committed edges (from ~70% of docs) MERGE a new-docs delta must
    equal aggregating all observations at once — weight sums, sorted
    evidence merge, and the last-write source all mergeable."""
    from pyspark.sql import functions as F

    linked = _linked(docs_df, catalog_df)
    old = linked.filter(F.crc32(F.col("doc_id").cast("string")) % 10 < 7)
    new = linked.filter(F.crc32(F.col("doc_id").cast("string")) % 10 >= 7)
    assert 0 < new.count() < linked.count()
    got = ed.merge_edge_delta(
        ed.aggregate_edges(ed.cooccurrence_pairs(old)),
        ed.aggregate_edges(ed.cooccurrence_pairs(new)))
    exp = ed.aggregate_edges(ed.cooccurrence_pairs(linked))
    cols = ["src", "dst", "rel_type", "weight", "images", "source"]
    assert rows_set(got, cols) == rows_set(exp, cols)
    # both merge branches exercised: some keys exist on both sides,
    # some only on one
    k_old = {(r["src"], r["dst"], r["rel_type"]) for r in
             ed.aggregate_edges(ed.cooccurrence_pairs(old)).collect()}
    k_new = {(r["src"], r["dst"], r["rel_type"]) for r in
             ed.aggregate_edges(ed.cooccurrence_pairs(new)).collect()}
    assert k_old & k_new and (k_old - k_new or k_new - k_old)
