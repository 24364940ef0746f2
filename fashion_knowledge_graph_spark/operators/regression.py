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
