"""Link-prediction training data over the triple table: deterministic
corrupted-tail negative sampling.

KG-embedding training (TransE/DistMult-style) consumes each positive
(subj, pred, obj) with k corrupted negatives whose object is drawn
from the predicate's candidate vocabulary. The reference has no
training loop (it queries GPT-4o); this operator supplies the
batch-side data prep a production KG would train from.

Determinism contract: the draw is a pure function of
(salt, i, subj, pred, obj) through the repo's portable 60-bit md5
hash (operators/sampling.py::sample_hash), so negatives are
reproducible across reruns, partitionings, and cluster sizes, and the
DuckDB oracle replays them bit-for-bit. Scale shape: the vocabulary
is the closed attribute taxonomy (dimension-sized), shipped as a
literal map column — no join, no shuffle; the only exchange is the
final anti-join against the distinct positive set (which guarantees
sampled corruptions are true negatives, the standard filtered
negative sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import sample_hash


def negative_samples(triples: DataFrame,
                     vocab: dict[str, list[str]],
                     k: int = 1,
                     salt: str = "neg",
                     subj_col: str = "subj",
                     pred_col: str = "pred",
                     obj_col: str = "obj") -> DataFrame:
    """k corrupted-tail negatives per distinct positive triple.

    ``vocab`` maps predicate -> ordered candidate objects (the closed
    vocabulary; order is part of the determinism contract). Positives
    whose predicate is absent from ``vocab`` are skipped. For draw i,
    the candidate index is ``H60(salt, i:subj:pred:obj) mod n``; a
    draw landing on the positive object linearly re-probes one slot
    (deterministic), and any corruption that equals SOME true triple
    is dropped by the anti-join (filtered negative sampling), as is a
    re-probe that still equals the positive (n == 1 vocabularies).

    Returns (subj, pred, obj_neg, neg_ix).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not vocab:
        raise ValueError("vocab must name at least one predicate")
    for p, vs in vocab.items():
        if not vs:
            raise ValueError(f"empty vocabulary for predicate {p!r}")
        if len(set(vs)) != len(vs):
            raise ValueError(f"duplicate candidates for {p!r}")

    pos = (triples
           .select(F.col(subj_col).alias("subj"),
                   F.col(pred_col).alias("pred"),
                   F.col(obj_col).alias("obj"))
           .filter(F.col("pred").isin(list(vocab)))
           .distinct())
    arr_map = F.create_map(*[x for p in sorted(vocab)
                             for x in (F.lit(p),
                                       F.array(*[F.lit(v)
                                                 for v in vocab[p]]))])
    e = (pos
         .withColumn("neg_ix", F.explode(F.array(
             *[F.lit(i) for i in range(k)])))
         .withColumn("__arr", arr_map[F.col("pred")]))
    n = F.size("__arr")
    h = sample_hash(F.concat_ws(":", F.col("neg_ix"), F.col("subj"),
                                F.col("pred"), F.col("obj")), salt)
    idx = F.pmod(h, n).cast("int")
    first = F.element_at("__arr", idx + 1)
    reprobe = F.element_at("__arr", (F.pmod(idx + 1, n) + 1).cast("int"))
    neg = F.when(first == F.col("obj"), reprobe).otherwise(first)
    out = (e.withColumn("obj_neg", neg)
           .filter(F.col("obj_neg") != F.col("obj"))
           .select("subj", "pred", "obj_neg", "neg_ix"))
    return out.join(
        pos.select("subj", "pred", F.col("obj").alias("obj_neg")),
        on=["subj", "pred", "obj_neg"], how="left_anti")
