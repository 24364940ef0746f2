"""k-means vs a pure-python Lloyd reference."""

import numpy as np
import pytest

from fashion_knowledge_graph_spark.operators.clustering import kmeans_assign


def _kmeans_py(X, ids, k, iterations):
    order = np.argsort(ids)
    c = X[order[:k]].astype(np.float64).copy()
    for _ in range(iterations):
        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cl = d.argmin(axis=1)
        for j in range(k):
            m = cl == j
            if m.any():
                c[j] = X[m].mean(axis=0)
    d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    cl = d.argmin(axis=1)
    dist = np.sqrt(d[np.arange(len(cl)), cl])
    return cl, dist


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    # 4 well-separated blobs + noise, 16-d
    centers = rng.normal(size=(4, 16)) * 8
    X = np.vstack([centers[i % 4] + rng.normal(size=16)
                   for i in range(200)]).astype(np.float32)
    rows = [(int(i), X[i].tolist()) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .repartition(4)
    return df, X.astype(np.float64)


def test_kmeans_matches_reference(spark, vec_df):
    df, X = vec_df
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_assign(df, k=4, iterations=3).collect()}
    cl, dist = _kmeans_py(X, np.arange(len(X)), 4, 3)
    assert len(got) == len(X)
    for i in range(len(X)):
        assert got[i][0] == cl[i], i
        assert got[i][1] == pytest.approx(round(float(dist[i]), 6),
                                          abs=1e-6), i


def test_kmeans_blobs_recovered(spark, vec_df):
    """Points generated from the same blob must co-cluster."""
    df, X = vec_df
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, k=4, iterations=3).collect()}
    for blob in range(4):
        members = {got[i] for i in range(len(X)) if i % 4 == blob}
        assert len(members) == 1, (blob, members)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """k larger than the number of distinct points leaves some
    clusters empty — they keep their init centroid, never NaN."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=4, iterations=2).collect()
    assert len(out) == 10
    assert all(np.isfinite(r["dist"]) for r in out)
    assert {r["cluster"] for r in out} == {0, 1}
