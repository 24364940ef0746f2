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


def test_cc_dense_edges_fall_back_to_distributed(spark):
    """Edge-count gate: few vertices but O(n²) edges must not be
    collected to the driver — and the distributed path must still
    produce the right components."""
    n = 12
    verts = spark.createDataFrame([(f"v{i:02d}",) for i in range(n)],
                                  "product_id string")
    # complete graph: 66 edges > 4 * driver_threshold with threshold 10
    pairs = [(f"v{i:02d}", f"v{j:02d}")
             for i in range(n) for j in range(i + 1, n)]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    labels = cc.connected_components(edges, verts, id_col="product_id",
                                     driver_threshold=10)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {f"v{i:02d}": "v00" for i in range(n)}
