"""Declarative document-quality gate — the Dolma/DataTrove "mixer".

Real pretraining pipelines don't run quality signals ad hoc; they run
a fixed RULE SET over every document and keep an auditable verdict
(which rule rejected what) so corpus composition is reproducible and
debuggable. This operator composes the repo's existing signals into
that shape:

- token count, language ID, PII counts — folded into ONE
  whole-stage-codegen projection over the scan (``lang_best`` is an
  expression, not a join; at 100 TB these rules cost a scan, period)
- bigram repetition (Gopher) — the one aggregate signal, joined in
  from the shared Arrow posting kernel (``ngram_repetition_stats``)

The verdict is the FIRST failing rule in a fixed order
(too_short → too_long → repetitive → lang → pii → pass), so a doc has
exactly one reject reason and downstream counts are additive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from .dedup import ngram_repetition_stats


def quality_gate(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_tokens: int = 20, max_tokens: int = 100_000,
                 max_rep_frac: float = 0.2,
                 allowed_langs: tuple[str, ...] = ("en",),
                 max_pii: int = 0) -> DataFrame:
    """→ (id, n_tokens, rep_frac, lang_pred, pii_total, verdict).
    NULL text gates as too_short (0 tokens), matching the filter-first
    convention elsewhere."""
    best = tx.lang_best(F.col(text_col))
    pii = tx.pii_counts(F.col(text_col))
    pii_total = sum(list(pii.values())[1:], list(pii.values())[0])
    base = df.select(
        F.col(id_col).alias("id"),
        # NULL text ⇒ 0 tokens / 0 PII, not NULL (a NULL comparison
        # would skip every WHEN branch and mislabel the doc 'pass')
        F.coalesce(tx.token_count(F.col(text_col)),
                   F.lit(0)).alias("n_tokens"),
        F.when(best["h"] > 0, best["lang"]).otherwise("und")
        .alias("lang_pred"),
        F.coalesce(pii_total.cast("long"), F.lit(0)).alias("pii_total"))
    rep = ngram_repetition_stats(df, id_col, text_col, n=2) \
        .select("id", "rep_frac")
    out = base.join(rep, "id", "left") \
        .withColumn("rep_frac", F.coalesce(F.col("rep_frac"), F.lit(0.0)))
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("n_tokens") > max_tokens, "too_long")
        .when(F.col("rep_frac") > max_rep_frac, "repetitive")
        .when(~F.col("lang_pred").isin(*allowed_langs), "lang")
        .when(F.col("pii_total") > max_pii, "pii")
        .otherwise("pass"))
    return out.withColumn("verdict", verdict)
