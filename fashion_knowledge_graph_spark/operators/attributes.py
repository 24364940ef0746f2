"""Attribute → (subj, pred, obj) triple extraction.

Two channels:

1. ``attr_triples`` — unpivot the closed-vocabulary attribute struct
   of a linked garment mention into explicit triples. This is the
   Spark-native form of the reference storing GPT-4o attributes as
   node properties (src/engine/process_catalog.py:45-50; vocabulary
   src/utils/prompts.py:4-13).

2. ``lexicon_triples`` — scan free text for canonical-vocabulary
   surface forms (token + optional bigram equi-join against the
   broadcast taxonomy). Deterministic stand-in for LLM extraction
   over text spans; all JVM-side (split/explode/broadcast-join), no
   Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import taxonomy as tx

# attributes unpivoted into triples; multi-valued attrs explode
_SCALAR_PREDS = [(a, tx.PREDICATES[a]) for a in tx.SCALAR_ATTRS]
_MULTI_PREDS = [(a, tx.PREDICATES[a]) for a in tx.MULTI_ATTRS]


def attr_triples(linked: DataFrame,
                 subj_col: str = "product_id",
                 attrs_col: str = "attrs",
                 score_col: str = "score") -> DataFrame:
    """linked mentions (subj, attrs struct, doc_id, span_idx, score)
    → triples (subj, pred, obj, doc_id, span_idx, score).

    One JVM-side stack: build array<struct<pred,obj>> per row with
    scalar preds + exploded multi-valued preds, then a single explode.
    """
    def _to_struct(pred):
        # NB: must be a 1-arg lambda — F.transform passes the element
        # index to 2-arg callables (default args count toward arity)
        return lambda v: F.struct(F.lit(pred).alias("pred"), v.alias("obj"))

    pairs = []
    for attr, pred in _SCALAR_PREDS:
        pairs.append(F.struct(
            F.lit(pred).alias("pred"),
            F.col(f"{attrs_col}.{attr}").alias("obj")))
    arr = F.array(*pairs)
    for attr, pred in _MULTI_PREDS:
        arr = F.concat(arr, F.transform(
            F.coalesce(F.col(f"{attrs_col}.{attr}"), F.array()),
            _to_struct(pred)))
    out = linked.select(
        F.col(subj_col).alias("subj"), "doc_id", "span_idx",
        F.col(score_col).alias("score"),
        F.explode(arr).alias("po"),
    )
    return out.select(
        "subj", F.col("po.pred").alias("pred"), F.col("po.obj").alias("obj"),
        "doc_id", "span_idx", "score",
    ).filter(F.col("obj").isNotNull())


def lexicon_map_df(spark, preds: dict[str, list[str]] | None = None,
                   with_aliases: bool = True) -> DataFrame:
    """(token, pred, obj) broadcast dim from the closed vocabulary."""
    rows = []
    preds = preds if preds is not None else tx.LEXICON_PREDS
    for attr, values in preds.items():
        pred = tx.PREDICATES[attr]
        for v in values:
            surfaces = {v}
            if with_aliases and "-" in v:
                surfaces.add(v.replace("-", " "))
            for s in surfaces:
                rows.append((s, pred, v))
    return spark.createDataFrame(rows, "token string, pred string, obj string")


def tokens_col(text_col, bigrams: bool = True):
    """Lowercased tokens (hyphens kept) + optional space-joined bigrams,
    as one array column — pure Catalyst expressions."""
    toks = F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9\-]+"), lambda t: t != "")
    if not bigrams:
        return toks
    bg = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 2),
                    lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                          F.element_at(toks, i + 2))),
    ).otherwise(F.array())
    return F.concat(toks, bg)


def lexicon_triples(text_df: DataFrame, subj_col: str,
                    text_col: str = "text",
                    bigrams: bool = True,
                    preds: dict[str, list[str]] | None = None,
                    keep: list[str] | None = None) -> DataFrame:
    """Free text → (subj, pred, obj) via broadcast equi-join of tokens
    against the taxonomy lexicon. Distinct per (subj, pred, obj[,keep]).

    The lexicon is ≤~100 rows → always broadcast; the token explode is
    linear in text size; the join is map-side. Scales to 100 TB with
    zero shuffles besides the final distinct.
    """
    spark = text_df.sparkSession
    lex = F.broadcast(lexicon_map_df(spark, preds))
    keep = keep or []
    toks = text_df.select(
        F.col(subj_col).alias("subj"), *keep,
        F.explode(tokens_col(F.col(text_col), bigrams)).alias("token"))
    out = toks.join(lex, "token").select("subj", "pred", "obj", *keep)
    return out.distinct()
