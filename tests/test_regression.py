"""Closed-form OLS vs numpy lstsq, plus degeneracy + invariance."""
import numpy as np
import pandas as pd
import pytest

from fashion_knowledge_graph_spark.operators.regression import ols_fit


def _data(n=500, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.randint(1, 50, n).astype(float)
    x2 = np.round(rng.uniform(0, 0.1, n), 2)
    y = np.round(3.5 + 2.25 * x1 - 40.0 * x2 + rng.normal(0, 2, n), 2)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_ols_two_features_matches_numpy(spark):
    pdf = _data()
    row = ols_fit(spark.createDataFrame(pdf), "y", "x1", "x2").first()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta, *_ = np.linalg.lstsq(X, pdf.y.values, rcond=None)
    assert row.n == len(pdf)
    assert row.intercept == pytest.approx(beta[0], abs=1e-6)
    assert row.beta1 == pytest.approx(beta[1], abs=1e-8)
    assert row.beta2 == pytest.approx(beta[2], abs=1e-6)
    pred = X @ beta
    r2 = 1 - ((pdf.y - pred) ** 2).sum() / \
        ((pdf.y - pdf.y.mean()) ** 2).sum()
    assert row.r2 == pytest.approx(r2, abs=1e-9)


def test_ols_single_feature_matches_numpy(spark):
    pdf = _data()
    row = ols_fit(spark.createDataFrame(pdf), "y", "x1").first()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1])
    beta, *_ = np.linalg.lstsq(X, pdf.y.values, rcond=None)
    assert row.intercept == pytest.approx(beta[0], abs=1e-6)
    assert row.beta1 == pytest.approx(beta[1], abs=1e-8)


def test_ols_partition_invariant(spark):
    # decimal moment sums are order-free: 1 partition ≡ 16 partitions
    pdf = _data()
    df = spark.createDataFrame(pdf)
    a = ols_fit(df.coalesce(1), "y", "x1", "x2").first()
    b = ols_fit(df.repartition(16), "y", "x1", "x2").first()
    assert (a.intercept, a.beta1, a.beta2, a.r2) \
        == (b.intercept, b.beta1, b.beta2, b.r2)


def test_ols_degenerate_constant_feature_yields_nulls(spark):
    pdf = _data().assign(x1=5.0)  # collinear with the intercept
    row = ols_fit(spark.createDataFrame(pdf), "y", "x1", "x2").first()
    assert row.intercept is None and row.beta1 is None


def test_logreg_irls_matches_numpy_newton(spark):
    import numpy as np
    from fashion_knowledge_graph_spark.operators.regression import (
        logreg_irls,
    )
    rng = np.random.RandomState(7)
    n = 400
    x1 = rng.uniform(-2, 2, n)
    x2 = rng.uniform(-2, 2, n)
    logit = 0.5 + 1.5 * x1 - 2.0 * x2
    y = (rng.uniform(0, 1, n) < 1 / (1 + np.exp(-logit))).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)],
        "y double, x1 double, x2 double")
    got = {r["step"]: (r["b0"], r["b1"], r["b2"])
           for r in logreg_irls(df, "y", "x1", "x2", n_iter=3).collect()}

    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.zeros(3)
    for step in range(1, 4):
        p = 1 / (1 + np.exp(-X @ beta))
        W = p * (1 - p)
        H = X.T @ (X * W[:, None])
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(H, g)
        assert np.allclose(got[step], beta, rtol=1e-9, atol=1e-9), step
    # after 3 Newton steps the fit approaches the generating process
    assert abs(got[3][1] - 1.5) < 0.6 and got[3][2] < -1.0
