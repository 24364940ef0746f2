"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated equi-join (facts ⋈ facts on
``doc_id``, edges ⋈ nodes on ``product_id``) is the exchange. Writing
both sides bucketed on the join key with the same bucket count lets
Spark's scan planner assign matching buckets to the same task:
`.explain` shows a SortMergeJoin with ZERO Exchange operators —
the join runs entirely map-side, every time, for every downstream
consumer of the table (amortized across all future queries, unlike a
per-query ``repartition``).

Bucketing rides the session catalog (``saveAsTable``) because bucket
metadata lives in the table definition, not the parquet files —
``parquet(path)`` writes cannot carry it. Pair with
``spark.sql.sources.bucketing.enabled`` (default true) and disable
auto-broadcast in tests to see the effect on small fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   buckets: int, sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table. Sorting within buckets additionally removes the per-task
    Sort under SortMergeJoin."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.
    With matching bucket specs the physical plan contains no Exchange
    (asserted in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
