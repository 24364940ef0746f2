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


def test_dbscan_from_pairs_semantics(spark):
    from fashion_knowledge_graph_spark.operators.clustering import (
        dbscan_from_pairs,
    )
    # two dense blobs bridged by a border point, plus noise:
    #   blob1 cores: 1,2,3 (mutual neighbors); 4 borders on 1
    #   blob2 cores: 10,11,12; noise: 99 (one weak link to 4)
    pairs = [(1, 2), (1, 3), (2, 3), (1, 4),
             (10, 11), (10, 12), (11, 12),
             (4, 99)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r.id: (r.cluster, r.role) for r in
           dbscan_from_pairs(df, min_pts=2).collect()}
    # cores: degree>=2 -> 1,2,3,10,11,12 and 4 (neighbors 1,99)
    assert got[1] == (1, "core") and got[2] == (1, "core")
    assert got[3] == (1, "core") and got[4] == (1, "core")
    assert got[10] == (10, "core") and got[12] == (10, "core")
    # 99 has one neighbor (4, a core) -> border of cluster 1
    assert got[99] == (1, "border")
    assert len(got) == 8


def test_dbscan_noise_absent_and_border_min_rule(spark):
    from fashion_knowledge_graph_spark.operators.clustering import (
        dbscan_from_pairs,
    )
    # chain: 1-2, 2-3 => only 2 is core (min_pts=2); 1,3 border on 2;
    # isolated pair 8-9: degree 1 each -> ALL noise (absent)
    pairs = [(1, 2), (2, 3), (8, 9)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r.id: (r.cluster, r.role) for r in
           dbscan_from_pairs(df, min_pts=2).collect()}
    assert got == {2: (2, "core"), 1: (2, "border"), 3: (2, "border")}
    # border ties pick the MIN core neighbor: two 4-cliques (cores at
    # min_pts=3), node 5 touches one core in EACH -> degree 2 < 3 so
    # it stays border, and joins min(2,20)=2's cluster (canonical
    # DBSCAN leaves this arbitrary; the min rule pins it)
    cl1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    cl2 = [(a, b) for a in (20, 21, 22, 23)
           for b in (20, 21, 22, 23) if a < b]
    pairs2 = cl1 + cl2 + [(2, 5), (20, 5)]
    df2 = spark.createDataFrame(pairs2, "a long, b long")
    got2 = {r.id: (r.cluster, r.role) for r in
            dbscan_from_pairs(df2, min_pts=3).collect()}
    assert got2[2] == (1, "core") and got2[20] == (20, "core")
    assert got2[5] == (1, "border")  # min core neighbor is 2 -> cluster 1
