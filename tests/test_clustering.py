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


def test_pca_project_matches_numpy(spark):
    """PCA projection vs a straight numpy replay of the same
    covariance + 3 power-iteration steps."""
    import numpy as np

    from fashion_knowledge_graph_spark.operators.clustering import (
        pca_project,
    )

    rng = np.random.RandomState(7)
    d = 8
    base = rng.randn(60, d) * np.array([5.0, 2.0] + [0.3] * (d - 2))
    rows = [(i, base[i].tolist()) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["pc1"]
           for r in pca_project(df, iterations=3).collect()}

    mu = base.mean(axis=0)
    cov = (base.T @ base) / len(base) - np.outer(mu, mu)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(3):
        w = cov @ v
        v = w / np.linalg.norm(w)
    exp = (base - mu) @ v
    for i in range(len(base)):
        assert got[i] == pytest.approx(round(float(exp[i]), 6), abs=1e-6)
    # the dominant synthetic axis carries most variance: the spread of
    # pc1 must dwarf the per-dim noise scale
    assert np.std(list(got.values())) > 3.0


def test_pca_project_partition_invariance(spark):
    """Same projections regardless of partitioning — the moment
    partials must merge associatively."""
    import numpy as np

    from fashion_knowledge_graph_spark.operators.clustering import (
        pca_project,
    )

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(6).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {r["vec_id"]: r["pc1"] for r in pca_project(df).collect()}
    b = {r["vec_id"]: r["pc1"]
         for r in pca_project(df.repartition(11)).collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=2e-6)
