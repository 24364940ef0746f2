"""Explicit skew handling (north_rule requirement).

Head attribute values ("black", "cotton") make the linking and
aggregation keys Zipf-skewed. Three tools, composable:

- ``salted_broadcast_join`` — replicate the small side N× with a salt
  column and salt the big side with ``pmod(xxhash64(...), N)``; the
  join key becomes (key, salt) so one hot key spreads over N tasks.
  Used when the small side fits in memory but a plain broadcast would
  still funnel the hot key's *post-join* work into few partitions.
- ``repartition_by_range`` — range-partition on doc_id before per-doc
  work, so documents are evenly spread regardless of upstream
  key skew (north_rule: "explicit repartition-by-range on doc_id").
- AQE skew-join splitting is enabled globally (session.py) as the
  runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_by_range(df: DataFrame, col: str = "doc_id",
                         n: int | None = None) -> DataFrame:
    return df.repartitionByRange(n, col) if n else df.repartitionByRange(col)


def salted_broadcast_join(big: DataFrame, small: DataFrame,
                          keys: list[str], n_salt: int = 8,
                          how: str = "inner") -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with salting.

    small is exploded n_salt× (fine — it is dim-sized) and broadcast;
    big rows get a deterministic salt from their full row hash so hot
    key groups split n_salt ways. Result is identical to the unsalted
    join (salt matches exactly one replica)."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int"))
    out = salted_big.join(F.broadcast(salted_small),
                          [*keys, "__salt"], how)
    return out.drop("__salt")


def skew_profile(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Per-key skew diagnostics → the ``top`` heaviest keys as
    ``(key, n_rows, share, cum_share, rank)``.

    The planning input for every knob in this module: a key whose
    ``share`` approaches 1/shuffle-partitions is the one that will
    straggle a shuffle, and ``cum_share`` of the head tells you
    whether salting the top-N (``salted_broadcast_join``) or range
    repartition is the right lever. One partial-agg'd groupBy over
    the data, then window arithmetic on the key-count table only —
    at 100 TB the second stage touches |keys| rows, never the data.

    Integer-derived ratios (count / total) — bit-replayable.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")).localCheckpoint(eager=True)
    # top-N FIRST via orderBy+limit (TakeOrderedAndProject — per-
    # partition heaps, no global sort), THEN the rank/cumulative
    # window over ≤ top rows. A global window over the full key table
    # would move EVERY key count to one partition — exactly the skew
    # this operator exists to diagnose. The scalar total comes from
    # one agg over the checkpointed counts (no second data pass).
    tot = counts.agg(F.sum("n_rows").alias("__tot"))
    head = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top)
    worder = Window.partitionBy().orderBy(
        F.desc("n_rows"), F.asc("key"))
    return (head.crossJoin(F.broadcast(tot))
            .withColumn("rank", F.row_number().over(worder))
            .select("key", "n_rows",
                    F.round(F.col("n_rows") / F.col("__tot"), 9)
                    .alias("share"),
                    F.round((F.sum("n_rows").over(
                        worder.rowsBetween(Window.unboundedPreceding, 0)))
                        / F.col("__tot"), 9).alias("cum_share"),
                    "rank"))


def rendezvous_assign(df: DataFrame, key_col: str,
                      shards: list[str]) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to ``argmax_shard h60(shard ':' key)`` → input columns plus
    ``shard``.

    The property that matters at fleet scale: adding or removing a
    shard remaps ONLY the keys whose argmax was that shard (≈1/n of
    them) — consistent-hashing semantics without a ring, no stored
    state, no coordination; assignment is a pure function of
    (shard list, key), so re-runs and the SQL replay are
    byte-identical. The argmax is a ``greatest``-free exact struct-max
    over |shards| codegen hash expressions per row — pure map work,
    zero shuffles; |shards| is a config constant, not data.
    """
    from ..operators.sketches import _h60

    if not shards:
        raise ValueError("need at least one shard")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard names")
    key = F.col(key_col).cast("string")
    pairs = [F.struct(
        _h60(F.concat(F.lit(s + ":"), key)).alias("h"),
        F.lit(s).alias("s")) for s in shards]
    return df.withColumn(
        "shard", F.greatest(*pairs)["s"] if len(pairs) > 1
        else pairs[0]["s"])
