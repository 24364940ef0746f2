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
