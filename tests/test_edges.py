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
