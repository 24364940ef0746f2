"""Greedy maximum-coverage subset selection (budgeted corpus picking).

The training-data shape: "choose k documents that together cover the
most vocabulary" — the classic (1−1/e)-approximate greedy for the
submodular max-coverage objective (Nemhauser et al. 1978), the same
family as facility-location corpus selection.

Execution shape: k rounds; each round is one distributed
count-uncovered-per-doc aggregation (anti-join vs the covered set,
partial-agg'd groupBy, TakeOrderedAndProject top-1) and the ONLY
driver-side state is the k picked ids and the covered-token set kept
as a DataFrame (checkpointed each round so lineage stays flat). k is
small by construction — the loop is O(k) Spark jobs, never per-row
driver work. At 100 TB the per-round aggregate is the exact same plan
as a word-count; covered tokens live distributed, never collected.

Determinism: ties on coverage break on ascending doc id, so re-runs
are byte-identical and the whole greedy trace replays as k unrolled
SQL stages (the driver oracle does exactly that).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def greedy_max_coverage(doc_tokens: DataFrame, k: int,
                        id_col: str = "doc_id",
                        token_col: str = "tok") -> DataFrame:
    """``(id, token)`` pairs → the greedy k-pick trace:
    ``(rank, doc_id, new_tokens, total_covered)``.

    ``new_tokens`` is the marginal gain of the pick; ``total_covered``
    the running union size. Input need not be distinct — it is
    deduplicated once up front.
    """
    t = (doc_tokens.select(F.col(id_col).alias("id"),
                           F.col(token_col).alias("tok"))
         .distinct().localCheckpoint())
    covered = None  # DataFrame of (tok)
    out = []
    total = 0
    for rank in range(1, k + 1):
        u = t if covered is None else \
            t.join(covered, "tok", "left_anti")
        pick = (u.groupBy("id").agg(F.count(F.lit(1)).alias("gain"))
                .orderBy(F.desc("gain"), F.asc("id")).limit(1)
                .first())
        if pick is None:
            break  # everything covered
        gain = pick["gain"]
        total += gain
        out.append((rank, pick["id"], gain, total))
        new_toks = (u.filter(F.col("id") == pick["id"])
                    .select("tok"))
        covered = new_toks if covered is None else \
            covered.unionAll(new_toks)
        covered = covered.localCheckpoint()
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )
    schema = StructType([
        StructField("rank", IntegerType()),
        StructField("doc_id", t.schema["id"].dataType),
        StructField("new_tokens", LongType()),
        StructField("total_covered", LongType())])
    return doc_tokens.sparkSession.createDataFrame(out, schema)
