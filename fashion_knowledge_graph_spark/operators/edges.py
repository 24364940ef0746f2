"""Co-occurrence pair generation and edge aggregation.

Reference semantics (src/engine/process_social_media_images.py:112-146
and src/database/graph_database.py:98-204):

- per document, the linked product ids in *item order*; every ordered
  position pair i<j becomes one observation
- rel type from the catalog ``category`` map: equal categories ⇒
  ``COMPLEMENTED_BY`` else ``WORN_WITH``; missing ⇒ ``WORN_WITH``
  (process_social_media_images.py:121-131; the map is built from the
  catalog CSV at :164-166)
- Neo4j MERGE: weight starts at 1, +1 per re-observation
  (graph_database.py:194-196); the evidence image is appended to
  ``r.image`` (:173-175); scalar props overwritten (:176-179)
- the reference writes the edge in BOTH directions (:135-146) and
  reads it undirected (graph_database.py:308). We store one canonical
  direction ``src <= dst`` and symmetrize at read
  (plans/queries.py) — same observable results, half the state.

Batch-aggregation replaces incremental MERGE: weight = count(*) per
(src, dst, rel_type) group, images = evidence list in deterministic
doc order. Skew note: the per-doc self-join groups are tiny (≤ a few
mentions per doc) so the doc_id shuffle is skew-free by construction;
the (src,dst) agg can skew on celebrity products — partial
aggregation (map-side combine) absorbs it, and AQE handles the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(linked: DataFrame,
                       evidence_col: str = "doc_id") -> DataFrame:
    """linked mentions (doc_id, span_idx, product_id, category) →
    one row per ordered position pair i<j within each doc.

    Self-join on doc_id with position inequality — the DataFrame form
    of the reference's nested loop (:117-119). Duplicate ids within a
    doc are kept (the reference would write a self-edge too).
    """
    a = linked.select(
        F.col("doc_id"), F.col("span_idx").alias("pos1"),
        F.col("product_id").alias("pid1"), F.col("category").alias("cat1"))
    b = linked.select(
        F.col("doc_id").alias("doc_id_b"), F.col("span_idx").alias("pos2"),
        F.col("product_id").alias("pid2"), F.col("category").alias("cat2"))
    pairs = a.join(
        b, (F.col("doc_id") == F.col("doc_id_b")) & (F.col("pos1") < F.col("pos2")),
        "inner").drop("doc_id_b")
    rel = F.when(
        F.col("cat1").isNotNull() & F.col("cat2").isNotNull()
        & (F.col("cat1") == F.col("cat2")), F.lit("COMPLEMENTED_BY")
    ).otherwise(F.lit("WORN_WITH"))
    # per-observation ingestion channel: the reference's edge `source`
    # is set by whichever batch entry point observed the pair
    # (process_social_media_images vs other feeds) and OVERWRITTEN on
    # re-observation (graph_database.py:176-179). The fixture stand-in
    # derives the channel deterministically from the doc (md5 split),
    # portable to the DuckDB oracle — constant `source` would make the
    # A3 last-write check vacuous.
    channel = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8",
        F.lit("social_media")).otherwise(F.lit("web_crawl"))
    # canonical undirected direction: src <= dst
    return pairs.select(
        F.least("pid1", "pid2").alias("src"),
        F.greatest("pid1", "pid2").alias("dst"),
        rel.alias("rel_type"),
        F.col("doc_id").alias("image"),   # evidence key (reference stores
                                          # basename(image_path), :115)
        channel.alias("source"),
    )


def aggregate_edges(pairs: DataFrame) -> DataFrame:
    """(src, dst, rel_type, image, source) observations → edges table.

    weight = observation count (A1); images = evidence in
    deterministic (sorted) order (A2 — the reference appends in
    processing order, which a distributed run cannot reproduce;
    sorted order is the documented, testable choice); source =
    last-write-wins scalar (A3, graph_database.py:176-179): the
    reference overwrites on each re-observation, so the batch
    equivalent is the source of the LAST observation in doc order —
    ``max_by(source, image)`` (deterministic: ties only within one
    doc, which has one source).
    """
    return pairs.groupBy("src", "dst", "rel_type").agg(
        F.count(F.lit(1)).alias("weight"),
        F.sort_array(F.collect_list("image")).alias("images"),
        F.max_by("source", "image").alias("source"),
    )


def merge_edge_delta(old_edges: DataFrame,
                     delta_edges: DataFrame) -> DataFrame:
    """MERGE an edge delta (aggregated over NEW docs only) into the
    committed edges table — the batch form of the reference's per-
    observation Neo4j MERGE (graph_database.py:173-196: weight++,
    evidence append, scalar overwrite), costing O(delta) instead of
    re-aggregating every linked row ever seen:

    - weight: sum (counts are mergeable)
    - images: sorted merge (sorted ∪ sorted = sort of concat)
    - source: last-write-wins — the side holding the globally max
      evidence key wins; within a side ``aggregate_edges`` already
      picked the max_by, so comparing the two last list elements is
      exact. Precondition: evidence keys are disjoint across sides
      (delta built from docs absent from the old table), which also
      rules out cross-side ties.

    Exactly equals ``aggregate_edges`` over the union of the
    observations (pinned by tests/test_edges.py and the
    ``kg_edges_incremental`` driver oracle).
    """
    key = ["src", "dst", "rel_type"]
    o = old_edges.select(
        *key, F.col("weight").alias("w_o"), F.col("images").alias("im_o"),
        F.col("source").alias("s_o"))
    d = delta_edges.select(
        *key, F.col("weight").alias("w_d"), F.col("images").alias("im_d"),
        F.col("source").alias("s_d"))
    j = o.join(d, key, "full_outer")
    both = F.col("w_o").isNotNull() & F.col("w_d").isNotNull()
    source = F.when(F.col("w_d").isNull(), F.col("s_o")) \
        .when(F.col("w_o").isNull(), F.col("s_d")) \
        .otherwise(F.when(F.element_at("im_d", -1)
                          > F.element_at("im_o", -1),
                          F.col("s_d")).otherwise(F.col("s_o")))
    images = F.when(both, F.sort_array(F.concat("im_o", "im_d"))) \
        .otherwise(F.coalesce("im_o", "im_d"))
    return j.select(
        *key,
        (F.coalesce("w_o", F.lit(0))
         + F.coalesce("w_d", F.lit(0))).alias("weight"),
        images.alias("images"),
        source.alias("source"))


def complements_triples(edges: DataFrame) -> DataFrame:
    """Edge rows → (subj, complements, obj) triples (north_rule's
    fourth predicate). One triple per canonical direction."""
    return edges.select(
        F.col("src").alias("subj"),
        F.lit("complements").alias("pred"),
        F.col("dst").alias("obj"),
        F.col("rel_type"),
        F.col("weight").cast("double").alias("score"),
    )
