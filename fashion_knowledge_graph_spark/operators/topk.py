"""Grouped top-k (W1-W3 in SURVEY §2.E).

Spark's window + row_number compiles to a partial top-k per map task
under AQE, so no custom operator is needed; this helper just pins the
deterministic tie-break convention used across the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_top_k(df: DataFrame, keys: list[str], order: list,
                  k: int, tie_breaks: list | None = None) -> DataFrame:
    """Keep the top-k rows per group. ``order`` are Column sort
    expressions (e.g. [F.desc('weight')]); deterministic tie-breaks
    appended so re-runs are byte-identical."""
    w = Window.partitionBy(*keys).orderBy(*order, *(tie_breaks or []))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
