"""Incrementally-maintained materialized views over SnapshotTables.

A grouped aggregate over a 100 TB fact table cannot be recomputed
because one hour of data arrived; the standard fix (Delta Live
Tables / Materialize / Flink dynamic tables) is to keep the view as
MERGEABLE partial aggregates — per-group COUNT and SUMs — and fold
each CDC delta in: ``new_partial = re-agg(old_partial ∪
partial(delta))``. Refresh cost is O(delta) + one narrow shuffle of
(keys, count, sums) rows, never a fact-table scan. Non-mergeable
finals (AVG, rates) are derived at READ time from the mergeable
state — the textbook partial-aggregate decomposition, the same trick
Spark's own partial/final HashAggregate pair uses inside one query,
lifted across commits.

Built on the repo's snapshot/CDC machinery: the view remembers the
source snapshot it reflects (in its own manifest-adjacent state
file), reads ONLY the appended files via
``SnapshotTable.incremental_read`` (a manifest file-set diff — no
data comparison), and commits the refreshed state as one overwrite
snapshot, so the view itself time-travels like any table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import SnapshotTable


class IncrementalMV:
    """A grouped SUM/COUNT view of ``source``, refreshed in O(delta).

    ``sum_cols``: fact columns whose per-group sums the view keeps
    (named ``sum_<col>``), plus an implicit row count ``n_rows``.
    """

    def __init__(self, source: SnapshotTable, root: str,
                 keys: list[str], sum_cols: list[str],
                 distinct_cols: list[str] | None = None,
                 kmv_k: int = 64):
        self.source = source
        self.table = SnapshotTable(root)
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)
        # per-group APPROX-DISTINCT state: the k smallest 60-bit value
        # hashes as an array column ``kmv_<col>`` — the mergeable KMV
        # form promised by operators/sketches.kmv_distinct's docstring
        # (slice(array_sort(array_distinct(old ∪ delta)), 1, k)); the
        # STORED state is ≤ k int64s per group no matter the
        # cardinality, and refresh math stays O(delta)
        self.distinct_cols = list(distinct_cols or [])
        self.kmv_k = int(kmv_k)
        self._state_path = os.path.join(root, "_mv_state.json")

    # ---- internals ----------------------------------------------------
    def _partial(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        from ..operators.sketches import _h60

        aggs = [F.count(F.lit(1)).alias("n_rows")]
        aggs += [F.sum(c).alias(f"sum_{c}") for c in self.sum_cols]
        out = df.groupBy(*self.keys).agg(*aggs)
        for dc in self.distinct_cols:
            hashed = (df.select(*self.keys, F.col(dc).alias("__v"))
                      .filter(F.col("__v").isNotNull())
                      .distinct()
                      .select(*self.keys, _h60(F.col("__v")).alias("__h")))
            w = Window.partitionBy(*self.keys).orderBy("__h")
            arr = (hashed
                   .withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") <= self.kmv_k)
                   .groupBy(*self.keys)
                   .agg(F.array_sort(F.collect_list("__h"))
                        .alias(f"kmv_{dc}")))
            # a group whose column is all-null still exists in the
            # main partial — carry an empty sketch, not a null
            out = out.join(arr, self.keys, "left").withColumn(
                f"kmv_{dc}",
                F.coalesce(F.col(f"kmv_{dc}"),
                           F.array().cast("array<long>")))
        return out

    def _merge_aggs(self):
        aggs = [F.sum("n_rows").alias("n_rows")]
        aggs += [F.sum(f"sum_{c}").alias(f"sum_{c}")
                 for c in self.sum_cols]
        aggs += [F.slice(F.array_sort(F.array_distinct(
            F.flatten(F.collect_list(f"kmv_{dc}")))), 1, self.kmv_k)
            .alias(f"kmv_{dc}") for dc in self.distinct_cols]
        return aggs

    def _last_sid(self) -> int | None:
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as f:
            return json.load(f)["source_snapshot"]

    def _commit(self, partial: DataFrame, sid: int) -> None:
        self.table.write(partial, mode="overwrite", stage="mv_refresh")
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"source_snapshot": sid}, f)
        os.replace(tmp, self._state_path)

    # ---- API ----------------------------------------------------------
    def refresh(self, spark: SparkSession) -> int:
        """Fold source commits since the last refresh into the view;
        returns the source snapshot the view now reflects. First call
        is the full build; later calls read ONLY the appended files.
        Idempotent when the source hasn't moved (no-op, no commit)."""
        cur = self.source.current_snapshot()
        if cur is None:
            raise FileNotFoundError("source table has no snapshot")
        last = self._last_sid()
        if last == cur:
            return cur
        if last is None:
            self._commit(self._partial(self.source.read(spark)), cur)
            return cur
        try:
            delta = self.source.incremental_read(
                spark, from_snapshot=last, to_snapshot=cur)
        except (ValueError, FileNotFoundError):
            # the range is not an append-only chain — the source was
            # rewritten (delete/merge/compact) or the last-refresh
            # snapshot was expired. Incremental math is undefined
            # across a rewrite; fall back to a full rebuild (correct,
            # O(source)) rather than guessing. Operationally: compact
            # sources right AFTER an MV refresh, not before.
            self._commit(self._partial(self.source.read(spark)), cur)
            return cur
        merged = (self.table.read(spark)
                  .unionByName(self._partial(delta))
                  .groupBy(*self.keys)
                  .agg(*self._merge_aggs()))
        self._commit(merged, cur)
        return cur

    def read(self, spark: SparkSession) -> DataFrame:
        """The view's mergeable state plus derived finals:
        ``avg_<col>`` per sum column, and ``distinct_est_<col>`` per
        distinct column — exact below k (the sketch is lossless
        there), else the KMV estimator (k−1)·2^60/h_(k), the same
        arithmetic as ``operators/sketches.kmv_distinct``."""
        from ..operators.sketches import HASH_SPACE

        df = self.table.read(spark)
        for c in self.sum_cols:
            df = df.withColumn(
                f"avg_{c}", F.col(f"sum_{c}") / F.col("n_rows"))
        for dc in self.distinct_cols:
            arr = F.col(f"kmv_{dc}")
            df = df.withColumn(
                f"distinct_est_{dc}",
                F.when(F.size(arr) < self.kmv_k,
                       F.size(arr).cast("double"))
                .otherwise(F.lit(float(self.kmv_k - 1))
                           * F.lit(HASH_SPACE)
                           / F.element_at(arr, self.kmv_k)
                           .cast("double")))
        return df
