from fashion_knowledge_graph_spark.operators import components as cc
from tests.conftest import rows_set


def test_canonical_mapping_matches_oracle(spark, catalog_df, oracle_out):
    got = cc.canonical_mapping(catalog_df)
    exp = [(k, v) for k, v in oracle_out["canon"].items()]
    import pandas as pd

    exp_df = pd.DataFrame(exp, columns=["product_id", "canonical_id"])
    assert rows_set(got, ["product_id", "canonical_id"]) == \
        rows_set(exp_df, ["product_id", "canonical_id"])


def test_components_collapse_duplicates(spark, catalog_df, catalog_pdf):
    got = cc.canonical_mapping(catalog_df).toPandas()
    merged = got.merge(catalog_pdf[["product_id", "entity_key"]], on="product_id")
    # every ground-truth duplicate group maps to exactly one canonical id
    per_entity = merged.groupby("entity_key")["canonical_id"].nunique()
    assert (per_entity == 1).all()
    # and the canonical id is the minimum product_id of the group
    mins = merged.groupby("entity_key")["product_id"].min()
    canons = merged.groupby("entity_key")["canonical_id"].first()
    assert (mins == canons).all()


def test_distributed_cc_equals_driver_cc(spark, catalog_df):
    """Both physical strategies must produce identical components."""
    pairs = cc.near_duplicate_pairs(catalog_df, cc.DUP_COSINE)
    drv = cc.connected_components(pairs, catalog_df, id_col="product_id")
    dist = cc._cc_label_propagation(pairs, catalog_df, id_col="product_id")
    assert sorted(map(tuple, drv.collect())) == \
        sorted(map(tuple, dist.collect()))


def test_driver_canonical_equals_lsh_canonical(spark, catalog_df):
    fast = cc.canonical_mapping(catalog_df)
    dist = cc.canonical_mapping(catalog_df, driver_threshold=0)
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, dist.collect()))
