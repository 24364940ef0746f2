"""End-to-end knowledge-graph construction pipeline.

Spark-first restatement of the reference's two batch entry points
(src/engine/process_catalog.py, src/engine/process_social_media_images.py)
as one declarative lineage over the interleaved docs table:

  docs ──explode──► image mentions ──UDFs──► embeddings/attrs
        └─explode──► text spans ──lexicon──► doc-level triples
  mentions ⋈LSH catalog ──top-1≥0.7──► linked mentions
  linked ──self-join i<j──► pairs ──agg──► edges
  catalog ──LSH self-join──► near-dups ──CC──► canonical map
  linked+edges+triples ──canonicalize──► nodes / edges / triples tables

Stage boundaries are snapshot commits (sources/tables.py): each stage
is resumable — rerunning skips stages whose snapshot exists (and, for
the mention stage, processes only docs not yet in the lineage,
anti-join on doc_id). Shuffle inventory (the whole build):
  1. linking join (band,bsig,type,color)   — AQE skew-split
  2. candidate dedup + top-1 window (doc_id,span_idx)
  3. pair self-join (doc_id)               — narrow projected rows
  4. edge aggregation (src,dst,rel)        — map-side partial agg
  5. CC iterations (small: catalog-sized)
Everything else is map-side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import taxonomy as tx
from ..operators import attributes as at
from ..operators import components as cc
from ..operators import edges as ed
from ..operators import linking as lk
from ..operators import mentions as mn
from ..sources.tables import SnapshotTable


@dataclass
class KGPipeline:
    """Config + table handles for one KG build."""

    warehouse: str
    link_strategy: str = "auto"
    link_threshold: float = tx.LINK_THRESHOLD
    link_top_k: int = tx.LINK_TOP_K
    dup_threshold: float = cc.DUP_COSINE
    # scale knobs — the three gates that pick driver fast paths over
    # the distributed (100 TB) branches. Production defaults; tests
    # set them to 0 to force the at-scale plans end-to-end
    # (tests/test_pipeline.py::test_at_scale_branches_full_build).
    broadcast_budget_mb: int = lk.BROADCAST_BUDGET_MB
    canon_driver_threshold: int = 20_000
    cc_driver_threshold: int = 200_000
    tables: dict = field(default_factory=dict)

    def __post_init__(self):
        import threading

        # table() is called from concurrent stage threads in build()
        self._lock = threading.Lock()
        self._deferred: list = []
        # incremental-resume state, refreshed per build: the linked
        # rows / docs a resumed build ADDED (None ⇒ fresh build or
        # nothing new) and whether the canonical mapping changed —
        # edges/triples switch to O(new) delta maintenance only when
        # growth happened under an unchanged mapping
        self._inc_new_linked = None
        self._inc_new_docs = None
        self._canon_changed = True

    def table(self, name: str) -> SnapshotTable:
        with self._lock:
            if name not in self.tables:
                self.tables[name] = SnapshotTable(
                    os.path.join(self.warehouse, name))
            return self.tables[name]

    # ---- stages -------------------------------------------------------
    def stage_linked(self, docs: DataFrame, catalog: DataFrame,
                     resume: bool = True, ex=None) -> DataFrame:
        """Mention detection + entity linking; resumable per doc_id.

        Incremental semantics replace the reference's "rerun the batch
        script against Neo4j MERGE": already-linked docs are skipped
        via anti-join against the committed snapshot, new results are
        appended as a new snapshot.
        """
        spark = docs.sparkSession
        t = self.table("linked")
        seen = self.table("processed_docs")
        todo = docs
        self._inc_new_linked = None
        self._inc_new_docs = None
        resuming = resume and seen.exists()
        if resuming:
            # anti-join against the *processed* doc set — docs whose
            # mentions all failed the gates still count as processed
            done = seen.read(spark)
            todo = docs.join(done, "doc_id", "left_anti")
        # the isEmpty probe is only worth a job when an earlier snapshot
        # could already cover everything (each extra action costs a full
        # job launch — measurable against the build's fixed-cost floor)
        if resuming and todo.isEmpty():
            return t.read(spark)
        if self.link_strategy in ("auto", "matmul", "fused") and (
                self.link_strategy != "auto"
                or lk.fits_driver_broadcast(
                    catalog, budget_mb=self.broadcast_budget_mb)):
            # dim-sized catalog: one fused mapInArrow pass (detect +
            # embed + link) — no 512-d embedding column ever crosses
            # the Arrow/JVM boundary (linking.detect_and_link_fused)
            linked = lk.detect_and_link_fused(
                todo, catalog, top_k=self.link_top_k,
                threshold=self.link_threshold)
        else:
            mentions = mn.image_mentions(todo)
            # the budget decision was already made above — "auto"
            # falling through means the catalog is too big or too wide
            # for the packed broadcast, so go straight to LSH instead
            # of letting link_mentions re-probe with its default budget
            strat = "lsh" if self.link_strategy == "auto" \
                else self.link_strategy
            linked = lk.link_mentions(
                mentions, catalog, strategy=strat,
                top_k=self.link_top_k, threshold=self.link_threshold)
        flat = linked.select(
            "doc_id", "span_idx", "product_id", "category", "score",
            *[F.col(f"attrs.{a}").alias(a)
              for a in (*tx.SCALAR_ATTRS, *tx.MULTI_ATTRS)])
        if ex is not None and not resuming:
            # Fresh build with stage overlap: materialize the kernel
            # output ONCE as block-manager blocks and return it
            # directly — the linked snapshot commit moves OFF the
            # critical path (it runs on the executor thread while the
            # edges/triples/nodes stages consume the checkpointed
            # blocks), and downstream stages stop re-reading the
            # just-written parquet from shared tmpfs (the round-2
            # decomposition pinned the residual scaling gap to exactly
            # snapshot-commit serialism + tmpfs bandwidth contention).
            # localCheckpoint trades lineage fault-tolerance for speed:
            # an executor loss mid-build fails the job, but the
            # snapshot commit protocol bounds the blast radius — the
            # atomic CURRENT pointer means a partial commit is
            # invisible, and resume=True restarts from the last
            # committed stage (re-processing at most one batch).
            flat_cp = flat.localCheckpoint(eager=True)

            def _commit_linked():
                t.write(flat_cp, mode="append", stage="link")
                # processed-docs AFTER linked (crash between them ⇒
                # duplicated work on resume, never lost work)
                seen.write(todo.select("doc_id"), mode="append",
                           stage="link")
            self._deferred.append(ex.submit(_commit_linked))
            return flat_cp
        if resuming:
            # resumed growth: checkpoint the NEW rows once — the
            # append commit and the edges/triples delta paths below
            # both consume the blocks instead of re-running the kernel
            flat = flat.localCheckpoint(eager=True)
            self._inc_new_linked = flat
            self._inc_new_docs = todo
        t.write(flat, mode="append", stage="link")
        # same ordering constraint as above; nothing downstream depends
        # on processed_docs, so with an executor it overlaps the
        # edges/triples stages
        if ex is not None:
            self._deferred.append(ex.submit(
                seen.write, todo.select("doc_id"), "append", "link"))
        else:
            seen.write(todo.select("doc_id"), mode="append", stage="link")
        return t.read(spark)

    def stage_canonical(self, catalog: DataFrame) -> DataFrame:
        spark = catalog.sparkSession
        t = self.table("canonical")

        def rebuild():
            t.write(cc.canonical_mapping(
                        catalog, self.dup_threshold,
                        driver_threshold=self.canon_driver_threshold,
                        cc_driver_threshold=self.cc_driver_threshold),
                    mode="overwrite", stage="canonicalize")

        self._canon_changed = True
        if not t.exists():
            rebuild()
            return t.read(spark)
        # resumed build: the committed mapping is stale if the catalog
        # changed. ONE full-outer probe job classifies the change:
        # additions fold in incrementally (probe-restricted pair join
        # — the 10^12-catalog path never re-pairs existing items);
        # removals force a rebuild (old components' star edges can't
        # distinguish pairwise from via-deleted connectivity).
        old = t.read(spark)
        d = catalog.select("product_id").withColumn("_c", F.lit(1)).join(
            old.select("product_id").withColumn("_o", F.lit(1)),
            "product_id", "full_outer").agg(
            F.count(F.when(F.col("_o").isNull(), 1)).alias("added"),
            F.count(F.when(F.col("_c").isNull(), 1)).alias("removed"),
        ).first()
        if d["removed"] > 0:
            rebuild()
        elif d["added"] > 0:
            t.write(cc.update_canonical_mapping(
                        catalog, old, self.dup_threshold,
                        cc_driver_threshold=self.cc_driver_threshold),
                    mode="overwrite", stage="canonicalize")
        else:
            self._canon_changed = False
        return t.read(spark)

    def _edges_df(self, linked: DataFrame, canon: DataFrame) -> DataFrame:
        """The edges aggregation plan (no commit).

        Project down to the four pair-generation columns BEFORE the
        self-join: the join shuffles both sides by doc_id, and shipping
        the ten attribute fields through that exchange (plus a round-2
        explicit repartitionByRange — a THIRD full-width shuffle the
        hash join cannot reuse, since range partitioning doesn't
        satisfy its clustering) saturated shared tmpfs bandwidth
        exactly when the concurrent triples write needs it. Per-doc
        groups are tiny (≤ a few mentions), so the doc_id hash shuffle
        is skew-free without any explicit repartition."""
        narrow = linked.select("doc_id", "span_idx", "product_id",
                               "category")
        linked_canon = cc.canonicalize(narrow, canon, ["product_id"])
        return ed.aggregate_edges(ed.cooccurrence_pairs(linked_canon))

    def _incremental_ok(self, *table_names: str) -> bool:
        """True iff this resumed build may maintain the named derived
        tables by delta: docs grew, the canonical mapping did not
        change (a changed mapping rewrites OLD rows' endpoints), and
        the tables to merge into actually exist."""
        return (self._inc_new_linked is not None
                and not self._canon_changed
                and all(self.table(n).exists() for n in table_names))

    def _edges_plan(self, linked: DataFrame, canon: DataFrame) -> DataFrame:
        """Full re-aggregation, or — when the resumed build only GREW
        under an unchanged mapping — the committed edges MERGE the
        delta aggregated over just the new docs' linked rows
        (edges.merge_edge_delta): O(new), not O(all linked ever)."""
        if self._incremental_ok("edges"):
            narrow = self._inc_new_linked.select(
                "doc_id", "span_idx", "product_id", "category")
            delta = ed.aggregate_edges(ed.cooccurrence_pairs(
                cc.canonicalize(narrow, canon, ["product_id"])))
            return ed.merge_edge_delta(
                self.table("edges").read(linked.sparkSession), delta)
        return self._edges_df(linked, canon)

    def stage_edges(self, linked: DataFrame, canon: DataFrame) -> DataFrame:
        spark = linked.sparkSession
        t = self.table("edges")
        t.write(self._edges_plan(linked, canon), mode="overwrite",
                stage="edges")
        return t.read(spark)

    def stage_triples_base(self, docs: DataFrame, linked: DataFrame,
                           canon: DataFrame) -> None:
        """Attr + text triples — the bulk (≈12× the linked row count).
        Depends only on (linked, canon), NOT on edges, so build() runs
        this write concurrently with the edges stage.

        Incremental resume (growth under an unchanged mapping): attr +
        text triples are per-doc, so only the NEW docs' triples are
        computed and APPENDED; the stale complements rows are deleted
        first (copy-on-write, touches only their snapshot's files) and
        re-appended from the refreshed edges by stage_triples_comp —
        O(new docs + edge table), never O(corpus)."""
        incremental = self._incremental_ok("triples")
        if incremental:
            spark = docs.sparkSession
            docs, linked = self._inc_new_docs, self._inc_new_linked
            self.table("triples").delete_where(
                spark, F.col("pred") == "complements")
        attrs_struct = F.struct(*[F.col(a).alias(a)
                                  for a in (*tx.SCALAR_ATTRS, *tx.MULTI_ATTRS)])
        linked_canon = cc.canonicalize(linked, canon, ["product_id"]) \
            .withColumn("attrs", attrs_struct)
        t_attr = at.attr_triples(linked_canon)
        t_text = at.lexicon_triples(
            mn.text_mentions(docs), subj_col="doc_id") \
            .withColumn("doc_id", F.col("subj")) \
            .withColumn("span_idx", F.lit(-1)) \
            .withColumn("score", F.lit(1.0))
        allt = t_attr.unionByName(t_text.select(t_attr.columns))
        self.table("triples").write(
            allt, mode="append" if incremental else "overwrite",
            stage="triples")

    def stage_triples_comp(self, edges: DataFrame) -> DataFrame:
        """Append the (tiny) complements triples once edges exist."""
        spark = edges.sparkSession
        t = self.table("triples")
        t_comp = ed.complements_triples(edges).select(
            "subj", "pred", "obj",
            F.lit(None).cast("string").alias("doc_id"),
            F.lit(-1).alias("span_idx"), "score")
        t.write(t_comp, mode="append", stage="triples")
        return t.read(spark)

    def stage_triples(self, docs: DataFrame, linked: DataFrame,
                      canon: DataFrame, edges: DataFrame) -> DataFrame:
        self.stage_triples_base(docs, linked, canon)
        return self.stage_triples_comp(edges)

    def stage_nodes(self, catalog: DataFrame, canon: DataFrame) -> DataFrame:
        """Canonical nodes table — last-write-wins per canonical id
        (reference MERGE SET p += attrs, graph_database.py:89-92);
        deterministic winner = min product_id (== the canonical id)."""
        spark = catalog.sparkSession
        t = self.table("nodes")
        mapped = cc.canonicalize(catalog, canon, ["product_id"])
        w = Window.partitionBy("product_id").orderBy(F.asc("image_path"))
        nodes = mapped.withColumn("__rn", F.row_number().over(w)) \
            .filter(F.col("__rn") == 1).drop("__rn")
        t.write(nodes.drop("embedding", "style_embedding"),
                mode="overwrite", stage="nodes")
        return t.read(spark)

    def delete_product(self, spark: SparkSession, product_id: str) -> None:
        """DETACH DELETE (reference src/database/graph_database.py:
        400-446): drop the product node AND every incident edge, each
        committed as a new overwrite snapshot — prior snapshots remain
        time-travelable (`table.read(spark, snapshot_id=...)`)."""
        self.table("nodes").delete_where(
            spark, F.col("product_id") == product_id)
        self.table("edges").delete_where(
            spark, (F.col("src") == product_id)
            | (F.col("dst") == product_id))

    # ---- full build ---------------------------------------------------
    def build(self, docs: DataFrame, catalog: DataFrame,
              resume: bool = True, parallel: bool = True) -> dict[str, DataFrame]:
        """Run all stages. ``parallel=True`` (default) overlaps
        independent stages from driver threads — Spark schedules
        concurrent jobs and (with FAIR mode, session.py) interleaves
        their tasks, so small stages fill the big stages' scheduling
        gaps and tail idle slots instead of running serially after
        them. Round-1 scaling decomposition attributed ~half the
        efficiency loss to exactly this serial stage chain (kernel
        0.92 → full build 0.52). Dependency DAG honored:

            canonical ──┐                  ┌─► nodes
            linked ─────┴─► edges ─► triples
        """
        spark = docs.sparkSession
        if not parallel:
            linked = self.stage_linked(docs, catalog, resume=resume)
            canon = self.stage_canonical(catalog)
            edges = self.stage_edges(linked, canon)
            triples = self.stage_triples(docs, linked, canon, edges)
            nodes = self.stage_nodes(catalog, canon)
            return {"linked": linked, "canonical": canon, "edges": edges,
                    "triples": triples, "nodes": nodes}
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=5) as ex:
            f_canon = ex.submit(self.stage_canonical, catalog)
            linked = self.stage_linked(docs, catalog, resume=resume, ex=ex)
            canon = f_canon.result()
            f_nodes = ex.submit(self.stage_nodes, catalog, canon)
            # the attr+text triples write (the bulk of all output rows)
            # overlaps the edges aggregation — it needs only linked+canon
            f_tbase = ex.submit(self.stage_triples_base, docs, linked, canon)
            # edges: aggregate ONCE (localCheckpoint runs the agg job
            # now, concurrently with the triples-base write), then the
            # edges-table commit and the complements append both read
            # the checkpointed blocks — the round-2 serial tail
            # (edges write → comp append as back-to-back commits) now
            # overlaps fully
            t_edges = self.table("edges")
            edges_df = self._edges_plan(linked, canon) \
                .localCheckpoint(eager=True)
            f_ewrite = ex.submit(t_edges.write, edges_df, "overwrite",
                                 "edges")
            f_tbase.result()
            triples = self.stage_triples_comp(edges_df)
            f_ewrite.result()
            edges = t_edges.read(spark)
            nodes = f_nodes.result()
            for f in self._deferred:
                f.result()
            self._deferred.clear()
        return {"linked": linked, "canonical": canon, "edges": edges,
                "triples": triples, "nodes": nodes}


def read_fixtures(spark: SparkSession, fixture_dir: str) -> dict[str, DataFrame]:
    return {
        "docs": spark.read.parquet(os.path.join(fixture_dir, "docs.parquet")),
        "catalog": spark.read.parquet(os.path.join(fixture_dir, "catalog.parquet")),
        "taxonomy": spark.read.parquet(os.path.join(fixture_dir, "taxonomy.parquet")),
    }
