"""Closed-form distributed OLS via normal equations.

The classic "aggregate moments, solve tiny system" shape (what Spark
MLlib's ``WeightedLeastSquares`` does): one map-side partial-aggregated
pass collects the O(p²) moment sums — for p ≤ 2 features that is nine
numbers — and the solve is scalar arithmetic on the single merged row.
No gradient iterations, no vector shuffles; at 100 TB the whole fit is
one scan + a 9-number tree-merge.

Determinism contract (what makes this oracle-checkable): every moment
is summed in DECIMAL after casting each INPUT column to
``DECIMAL(12,2)`` — lossless for 2-dp business values and small enough
that int64-backed engines multiply without overflow; products and sums are exact and
order-free, so the merged moments are bit-identical across engines and
partitionings; the 3×3 Cramer solve then runs the same IEEE-double
expression graph on identical inputs. Solving with Cramer (not LAPACK)
is deliberate: the formula replays textually in ANSI SQL.

Reference parity: the reference has no regression; this is a
training-data-pipeline extension (quality-weight fitting, calibration
curves) per the survey's §2 extension mandate.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(12,2)"


def _det3(a, b, c, d, e, f, g, h, i):
    """Determinant of [[a,b,c],[d,e,f],[g,h,i]] in double arithmetic."""
    return (a * (e * i - f * h)
            - b * (d * i - f * g)
            + c * (d * h - e * g))


def ols_fit(df: DataFrame, y_col: str, x1_col: str,
            x2_col: str | None = None) -> DataFrame:
    """Ordinary least squares with intercept for 1 or 2 features.

    Returns a single-row DataFrame
    ``(n, intercept, beta1[, beta2], r2)`` (unrounded doubles —
    callers round for display). Degenerate designs (constant feature,
    n ≤ p) yield a zero determinant and null coefficients rather than
    a wrong answer.
    """
    y = F.col(y_col).cast(_DEC)
    x1 = F.col(x1_col).cast(_DEC)
    if x2_col is None:
        # 2×2 normal equations in the same style
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x1).alias("sx1"), F.sum(y).alias("sy"),
            F.sum(x1 * x1).alias("sx11"),
            F.sum(x1 * y).alias("sx1y"),
            F.sum(y * y).alias("syy"))
        r = agg.select(*[F.col(c).cast("double").alias(c)
                         for c in agg.columns])
        det = F.col("n") * F.col("sx11") - F.col("sx1") * F.col("sx1")
        # singular ⇔ det is zero in exact arithmetic; in doubles it
        # only survives as roundoff, so test RELATIVE to the term
        # magnitude rather than against literal zero
        ok = F.abs(det) > (F.abs(F.col("n") * F.col("sx11"))
                           + F.lit(1.0)) * 1e-9
        b1 = (F.col("n") * F.col("sx1y")
              - F.col("sx1") * F.col("sy")) / det
        b0 = (F.col("sy") - b1 * F.col("sx1")) / F.col("n")
        sse = (F.col("syy") - b0 * F.col("sy") - b1 * F.col("sx1y"))
        sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
        return r.select(
            F.col("n").cast("bigint").alias("n"),
            F.when(ok, b0).alias("intercept"),
            F.when(ok, b1).alias("beta1"),
            F.when(ok, 1 - sse / sst).alias("r2"))

    x2 = F.col(x2_col).cast(_DEC)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("sx1"), F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx11"), F.sum(x1 * x2).alias("sx12"),
        F.sum(x2 * x2).alias("sx22"),
        F.sum(x1 * y).alias("sx1y"), F.sum(x2 * y).alias("sx2y"),
        F.sum(y * y).alias("syy"))
    r = agg.select(*[F.col(c).cast("double").alias(c)
                     for c in agg.columns])
    n, sx1, sx2 = F.col("n"), F.col("sx1"), F.col("sx2")
    sy, sx11, sx12 = F.col("sy"), F.col("sx11"), F.col("sx12")
    sx22, sx1y, sx2y = F.col("sx22"), F.col("sx1y"), F.col("sx2y")
    det = _det3(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
    ok = F.abs(det) > (F.abs(n * sx11 * sx22) + F.lit(1.0)) * 1e-9
    b0 = _det3(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22) / det
    b1 = _det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22) / det
    b2 = _det3(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y) / det
    sse = (F.col("syy") - b0 * sy - b1 * sx1y - b2 * sx2y)
    sst = F.col("syy") - sy * sy / n
    return r.select(
        n.cast("bigint").alias("n"),
        F.when(ok, b0).alias("intercept"),
        F.when(ok, b1).alias("beta1"),
        F.when(ok, b2).alias("beta2"),
        F.when(ok, 1 - sse / sst).alias("r2"))


def _det3_f(a, b, c, d, e, f, g, h, i):
    """Python-float twin of _det3 — SAME association order, so the
    driver-side Newton solve diverges from the SQL oracle's only at
    ulp level (absorbed by the 6-digit output rounding)."""
    return (a * (e * i - f * h)
            - b * (d * i - f * g)
            + c * (d * h - e * g))


def logreg_irls(df: DataFrame, y_col: str, x1_col: str, x2_col: str,
                n_iter: int = 2) -> DataFrame:
    """Distributed logistic regression via IRLS / Newton-Raphson — the
    quality-classifier trainer of LLM data pipelines (GPT-3-style LR
    quality filters), done Spark-first.

    Each iteration is ONE partial-agg'd moment pass over the corpus:
    with p = sigmoid(b0 + b1·x1 + b2·x2) and w = p(1-p), it collects
    the 6 Hessian moments (X'WX) and 3 gradient sums (X'(y-p)) — nine
    doubles, map-side combined, nothing else shuffles. The driver
    holds the 3 coefficients and applies the Newton step
    β += H⁻¹g via the explicit 3×3 Cramer solve (same shape as
    ``ols_fit``). O(n_iter) jobs; per-row work is a codegen'd scalar
    expression, no UDF.

    Returns one row per iteration: (step, b0, b1, b2) — the whole
    optimization trace, so convergence is inspectable and the driver
    oracle replays every step as unrolled SQL.
    """
    y = F.col(y_col).cast("double")
    x1 = F.col(x1_col).cast("double")
    x2 = F.col(x2_col).cast("double")
    beta = (0.0, 0.0, 0.0)
    out = []
    for step in range(1, n_iter + 1):
        z = F.lit(beta[0]) + F.lit(beta[1]) * x1 + F.lit(beta[2]) * x2
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = p * (F.lit(1.0) - p)
        m = df.agg(
            F.sum(w).alias("sw"),
            F.sum(w * x1).alias("swx1"), F.sum(w * x2).alias("swx2"),
            F.sum(w * x1 * x1).alias("swx11"),
            F.sum(w * x1 * x2).alias("swx12"),
            F.sum(w * x2 * x2).alias("swx22"),
            F.sum(y - p).alias("g0"),
            F.sum((y - p) * x1).alias("g1"),
            F.sum((y - p) * x2).alias("g2")).first()
        det = _det3_f(m["sw"], m["swx1"], m["swx2"],
                      m["swx1"], m["swx11"], m["swx12"],
                      m["swx2"], m["swx12"], m["swx22"])
        d0 = _det3_f(m["g0"], m["swx1"], m["swx2"],
                     m["g1"], m["swx11"], m["swx12"],
                     m["g2"], m["swx12"], m["swx22"])
        d1 = _det3_f(m["sw"], m["g0"], m["swx2"],
                     m["swx1"], m["g1"], m["swx12"],
                     m["swx2"], m["g2"], m["swx22"])
        d2 = _det3_f(m["sw"], m["swx1"], m["g0"],
                     m["swx1"], m["swx11"], m["g1"],
                     m["swx2"], m["swx12"], m["g2"])
        beta = (beta[0] + d0 / det, beta[1] + d1 / det,
                beta[2] + d2 / det)
        out.append((step, beta[0], beta[1], beta[2]))
    # full precision out; callers round with F.round (HALF_UP — python
    # round() is banker's and would diverge from the SQL oracle)
    return df.sparkSession.createDataFrame(
        out, "step int, b0 double, b1 double, b2 double")
