"""Mention detection over interleaved documents.

Replaces the reference's per-image SegFormer loop
(src/engine/process_social_media_images.py:57-64 →
src/engine/image_processor.py:89-148) with one declarative lineage:
scan → posexplode(spans) → Arrow-batched segment/attr/embed UDFs →
filters. No shuffle — this whole stage is map-side and scales
linearly with input splits.

Per-row invariant (input_hint): span order is carried as ``span_idx``
from ``posexplode`` and kept on every downstream row, so the original
span sequence (kind, text, media_ref, order) is reconstructible
exactly (verified in tests/test_mentions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import taxonomy as tx
from ..functions.embeddings import attrs_udf, image_embed_udf, segment_udf


def explode_spans(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → one row per span, order-preserving.

    posexplode keeps the array position → ``span_idx``; reassembly =
    groupBy(doc_id) + sort_array(collect_list(struct(span_idx, ...))).
    """
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("span_idx", "span"),
    ).select(
        "doc_id", "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def image_mentions(docs: DataFrame) -> DataFrame:
    """Detected garment mentions from media spans, with attributes and
    embeddings — the left side of the entity-linking join.

    Filters reproduce the reference gates:
    - Background class skipped (image_processor.py:114-115, P6)
    - area >= 1028      (image_processor.py:117-119, P5)
    - missing ``type`` skipped
      (process_social_media_images.py:74-76, P8)
    """
    spans = explode_spans(docs).filter(
        F.col("kind") == "image_ref").filter(F.col("media_ref").isNotNull())
    seg = spans.withColumn("segment", segment_udf("media_ref"))
    seg = seg.select("*", "segment.label", "segment.area").drop("segment")
    seg = seg.filter(
        (F.col("label") != "Background") & (F.col("area") >= tx.MIN_AREA))
    att = seg.withColumn("attrs", attrs_udf("media_ref"))
    att = att.filter(F.col("attrs.type").isNotNull())
    return att.withColumn("embedding", image_embed_udf("media_ref"))


def text_mentions(docs: DataFrame) -> DataFrame:
    """Text spans, order-preserved — feed of the lexicon/linking
    triple extractors (operators/attributes.py)."""
    return explode_spans(docs).filter(
        (F.col("kind") == "text") & F.col("text").isNotNull())


def reassemble_spans(spans: DataFrame) -> DataFrame:
    """Inverse of explode_spans — used by the round-trip invariant test."""
    return spans.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                "span_idx", "kind", "text", "media_ref", "offset"))),
            lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), s["offset"].alias("offset")),
        ).alias("spans")
    )
