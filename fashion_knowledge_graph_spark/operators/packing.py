"""Sequence packing for LLM training-data pipelines.

Pretraining dataloaders want documents packed into fixed-token-budget
bins (sequences) with minimal padding. The packing decision is
inherently sequential (whether doc i opens a new bin depends on the
running fill), so Spark has no built-in for it; this implements the
standard deterministic formulation:

- shard the corpus by a FIXED key range (``doc_id div shard_width``) —
  explicit boundaries, not sampled ones, so the result is independent
  of parallelism and replayable by an oracle;
- within each shard, walk docs in ``id`` order and greedily close the
  current bin when the next doc would overflow ``capacity``
  (first-fit in arrival order; oversize docs get a bin of their own).

Scale: one hash shuffle on the shard key, then a per-shard
``applyInPandas`` whose state is two scalars (fill, bin) — O(rows)
compute, O(1) memory per shard, no global sort and no driver state.
Shard width trades packing quality at shard edges for parallelism,
exactly the knob a 100 TB corpus needs (each shard packs
independently, so 10^12 docs = 10^?? independent tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(df: DataFrame, id_col: str = "doc_id",
                token_col: str = "n_tokens", capacity: int = 2048,
                shard_width: int = 1000) -> DataFrame:
    """→ (id, shard, bin, fill_after) — ``bin`` is the 0-based bin
    index within the shard; ``fill_after`` the bin's running token
    fill after placing this doc. Deterministic for any partitioning.
    """
    import pandas as pd

    cap = int(capacity)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        bins, fills = [], []
        fill, b = 0, 0
        first = True
        for t in pdf["tok"]:
            t = int(t)
            if first:
                fill, first = t, False
            elif fill + t > cap:
                b += 1
                fill = t
            else:
                fill += t
            bins.append(b)
            fills.append(fill)
        out = pdf[["id", "shard"]].copy()
        out["bin"] = pd.array(bins, dtype="int64")
        out["fill_after"] = pd.array(fills, dtype="int64")
        return out

    # integer `div`, not float division: doc ids can exceed 2^53 at
    # 10^12-doc scale, where double round-trips corrupt the shard key
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"cast({id_col} as bigint) div {int(shard_width)}")
        .alias("shard"),
        F.col(token_col).cast("long").alias("tok"))
    out_schema = ("id {}, shard long, bin long, fill_after long"
                  .format(df.schema[id_col].dataType.simpleString()))
    return keyed.groupBy("shard").applyInPandas(_pack, out_schema)
