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


def grouped_dense_rank(df: DataFrame, group_col: str, order_col: str,
                       out_col: str = "rnk",
                       num_partitions: int | None = None) -> DataFrame:
    """Distributed 1-based contiguous rank of ``order_col`` within
    each group over an already-distinct (group, order) relation — the
    scale path for ranking an ENTITY-SIZED vocabulary, where
    ``row_number().over(Window.partitionBy(group))`` would funnel a
    whole group through one task (a 10^8-product ``complements``
    vocabulary in one window partition is the textbook straggler).

    Two passes, both skew-free: range-shuffle on (group, order) so
    each group spans contiguous partitions; per-(partition, group)
    counts collect to the driver (bounded by #partitions + #groups
    rows — partition metadata, not data); each row's global rank is
    its partition-local row_number plus the exclusive prefix sum of
    its group's counts in earlier partitions. Range boundaries are
    sampling-dependent, but the OUTPUT is not: offsets correct the
    global rank whatever the boundary placement.

    Returns (group_col, order_col, out_col) with out_col dense in
    [1, group size] ordered by ``order_col`` ascending.
    """
    d = df.select(group_col, order_col).distinct()
    d = (d.repartitionByRange(num_partitions, group_col, order_col)
         if num_partitions else
         d.repartitionByRange(group_col, order_col))
    d = d.withColumn("__pid", F.spark_partition_id()) \
        .localCheckpoint(eager=True)   # pin partitioning: counts and
    # ranks must see the SAME placement (a recompute may resample
    # range boundaries)
    counts = (d.groupBy("__pid", group_col)
              .agg(F.count(F.lit(1)).alias("__n"))
              .collect())
    by_group: dict = {}
    for r in sorted(counts, key=lambda r: (r[group_col], r["__pid"])):
        by_group.setdefault(r[group_col], []).append((r["__pid"], r["__n"]))
    offs = []
    for g, lst in by_group.items():
        acc = 0
        for pid, n in lst:
            offs.append((pid, g, acc))
            acc += n
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offs, f"__pid int, {group_col} string, __off bigint")
    w = Window.partitionBy("__pid", group_col).orderBy(order_col)
    return (d.withColumn("__r", F.row_number().over(w))
            .join(F.broadcast(off_df), ["__pid", group_col])
            .select(group_col, order_col,
                    (F.col("__r") + F.col("__off")).alias(out_col)))
