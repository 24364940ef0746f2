"""Connected-components canonicalization of duplicate entities.

The reference canonicalizes by exact ``product_id`` only (Neo4j MERGE
key, src/database/graph_database.py:89-92) — near-duplicate listings
stay distinct nodes. The north_rule requires true canonicalization:
detect near-duplicate catalog entities (cosine ≥ threshold) and
collapse each connected component to one canonical id.

Implementation is GraphFrames-style iterative label propagation
expressed as plain DataFrame self-joins (no GraphFrames dependency):
every vertex repeatedly adopts the minimum label among itself and its
neighbors; converges in O(component diameter) rounds. Lineage is cut
with ``localCheckpoint`` each round (at cluster scale: write the
label table to an Iceberg checkpoint instead — sources/tables.py).
Duplicate-listing components are tiny (2-5 nodes) so 3-4 rounds
converge; the loop exits by fixpoint count, not a guessed bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import taxonomy as tx
from ..functions.embeddings import cosine_col, hyperplanes, make_signature_udf

DUP_COSINE = 0.98


def near_duplicate_pairs(catalog: DataFrame,
                         threshold: float = DUP_COSINE,
                         nbits: int = 64, nbands: int = 8,
                         probe: DataFrame | None = None) -> DataFrame:
    """LSH-blocked self-join of the catalog embedding space →
    (src, dst) candidate duplicate pairs with cosine ≥ threshold.

    Blocking key = (type, color, band, bsig) exactly like the linking
    join; id1 < id2 halves the candidate set.

    ``probe``: optional subset of catalog rows — restricts the output
    to pairs with at least one endpoint in ``probe`` (the incremental
    canonicalization path: pair generation costs O(|new| × block)
    instead of O(|catalog| × block); src < dst still canonical).
    """
    planes = hyperplanes(tx.IMG_DIM, nbits, seed_key="dedup-img")
    sig = make_signature_udf(planes, nbands)

    def banded(df):
        c = df.select("product_id", "type", "color", "embedding") \
            .withColumn("sigs", sig("embedding"))
        return c.select("*", F.posexplode("sigs").alias("band", "bsig")) \
            .drop("sigs")

    e = banded(catalog)
    a_side = banded(probe) if probe is not None else e
    a = a_side.select(*[F.col(x).alias(f"a_{x}") for x in a_side.columns])
    b = e.select(*[F.col(x).alias(f"b_{x}") for x in e.columns])
    on = (F.col("a_band") == F.col("b_band")) \
        & (F.col("a_bsig") == F.col("b_bsig")) \
        & (F.col("a_type") == F.col("b_type")) \
        & (F.col("a_color") == F.col("b_color"))
    if probe is None:
        cand = a.join(
            on=on & (F.col("a_product_id") < F.col("b_product_id")),
            other=b, how="inner",
        ).dropDuplicates(["a_product_id", "b_product_id"])
        scored = cand.withColumn(
            "score", cosine_col("a_embedding", "b_embedding"))
        return scored.filter(F.col("score") >= threshold).select(
            F.col("a_product_id").alias("src"),
            F.col("b_product_id").alias("dst"), "score")
    # probe side may collide either way round — orient the pair
    # (least, greatest) BEFORE the dedup so probe×probe pairs are
    # emitted once
    cand = a.join(
        on=on & (F.col("a_product_id") != F.col("b_product_id")),
        other=b, how="inner",
    ).withColumn("src", F.least("a_product_id", "b_product_id")) \
     .withColumn("dst", F.greatest("a_product_id", "b_product_id")) \
     .dropDuplicates(["src", "dst"])
    scored = cand.withColumn(
        "score", cosine_col("a_embedding", "b_embedding"))
    return scored.filter(F.col("score") >= threshold) \
        .select("src", "dst", "score")


def connected_components(edges: DataFrame, vertices: DataFrame,
                         id_col: str = "id", max_iter: int = 50,
                         driver_threshold: int = 200_000) -> DataFrame:
    """(src,dst) edges + vertex ids → (id, component) with component =
    min id in the component.

    Physical strategy by graph size (same results either way — pinned
    by tests against a union-find oracle):

    - ≤ ``driver_threshold`` vertices: collect and union-find on the
      driver. Duplicate-entity graphs are catalog-sized — dozens of
      Spark jobs of label propagation over a few thousand rows is
      pure scheduling overhead (it dominated the build's serial
      fraction and capped scaling efficiency).
    - larger: iterative min-label propagation as DataFrame self-joins
      with per-round localCheckpoint (the 100 TB path; at cluster
      scale checkpoint to a table instead).
    """
    n_vertices = vertices.count()
    if n_vertices <= driver_threshold:
        # gate on EDGE count too: a pathological pair generation (e.g.
        # a threshold that matches everything) can produce O(n²) edges
        # under a modest vertex count — probing limit(cap+1).count()
        # costs one cheap early-terminating job, collect() would not
        edge_cap = 4 * driver_threshold
        if edges.limit(edge_cap + 1).count() > edge_cap:
            return _cc_label_propagation(edges, vertices, id_col, max_iter)
        vs = [r[0] for r in vertices.select(id_col).collect()]
        parent = {v: v for v in vs}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in edges.select("src", "dst").collect():
            a, b = find(r[0]), find(r[1])
            if a != b:
                lo, hi = (a, b) if a < b else (b, a)
                parent[hi] = lo
        spark = vertices.sparkSession
        rows = [(v, find(v)) for v in vs]
        schema = vertices.select(
            F.col(id_col).alias("id"),
            F.col(id_col).alias("component")).schema
        return spark.createDataFrame(rows, schema)
    return _cc_label_propagation(edges, vertices, id_col, max_iter)


def _cc_label_propagation(edges: DataFrame, vertices: DataFrame,
                          id_col: str = "id",
                          max_iter: int = 50) -> DataFrame:
    """Distributed min-label propagation (GraphFrames-style)."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = vertices.select(F.col(id_col).alias("id")) \
        .withColumn("component", F.col("id")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = sym.join(labels, sym.src == labels.id, "inner") \
            .select(F.col("dst").alias("id"), "component")
        new_labels = labels.select("id", "component").union(msgs) \
            .groupBy("id").agg(F.min("component").alias("component")) \
            .localCheckpoint(eager=True)
        changed = new_labels.alias("n").join(
            labels.alias("o"), "id").filter(
            F.col("n.component") != F.col("o.component")).count()
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_mapping(catalog: DataFrame,
                      threshold: float = DUP_COSINE,
                      driver_threshold: int = 20_000,
                      cc_driver_threshold: int = 200_000) -> DataFrame:
    """catalog → (product_id, canonical_id) — identity for singletons.

    Dim-sized catalogs (≤ ``driver_threshold``) run entirely on the
    driver: exact O(n²) numpy cosine + union-find — the distributed
    LSH self-join spends ~10 Spark jobs on 300 rows otherwise (pure
    fixed cost in every build). Larger catalogs keep the LSH-blocked
    pair generation + distributed CC. Results identical
    (tests/test_components.py pins both paths)."""
    n = catalog.count()
    if n <= driver_threshold:
        import numpy as np

        rows = catalog.select("product_id", "type", "color",
                              "embedding").collect()
        rows.sort(key=lambda r: r["product_id"])
        ids = [r["product_id"] for r in rows]
        keys = [(r["type"], r["color"]) for r in rows]
        mat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                        for r in rows])
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = mat @ mat.T
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(sims >= threshold)
        for i, j in zip(ii, jj):
            # blocking-key parity with the LSH path: same (type,color)
            if i < j and keys[i] == keys[j]:
                a, b = find(int(i)), find(int(j))
                if a != b:
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
        out = [(ids[i], ids[find(i)]) for i in range(n)]
        return catalog.sparkSession.createDataFrame(
            out, "product_id string, canonical_id string")
    pairs = near_duplicate_pairs(catalog, threshold)
    labels = connected_components(pairs, catalog, id_col="product_id",
                                  driver_threshold=cc_driver_threshold)
    return labels.select(F.col("id").alias("product_id"),
                         F.col("component").alias("canonical_id"))


def update_canonical_mapping(catalog: DataFrame, old_mapping: DataFrame,
                             threshold: float = DUP_COSINE,
                             cc_driver_threshold: int = 200_000
                             ) -> DataFrame:
    """Fold NEW catalog items into an existing canonical mapping
    without re-generating pairs for the whole catalog — the
    incremental path a 10^12-row catalog actually runs (from-scratch
    pair generation is the expensive stage; folding additions costs
    O(|new| × block), not O(|catalog| × block)).

    Correctness argument: embeddings of existing items are immutable
    (ids are content-addressed, F9), so the from-scratch near-dup
    graph over the grown catalog is exactly (old connectivity) ∪
    (edges incident to a new item). Old connectivity is preserved by
    the old mapping's (member → canonical) star edges; the incident
    edges come from one probe-restricted LSH join. Components — and
    therefore min-id canonical labels — match a full recompute up to
    the banded join's recall (≈0.999 at the 0.98 duplicate threshold;
    the same approximation the from-scratch >20k path makes). Pinned
    exactly equal on fixtures by tests/test_components.py, including
    a new item BRIDGING two previously separate components.

    Contract: supports catalog GROWTH only. Star edges stand in for
    pairwise connectivity inside old components, so with deletions
    the caller must rebuild from scratch (``KGPipeline.
    stage_canonical`` detects removals and does exactly that).
    """
    new_items = catalog.join(
        old_mapping.select("product_id"), "product_id", "left_anti")
    if new_items.isEmpty():
        return old_mapping
    pairs = near_duplicate_pairs(catalog, threshold, probe=new_items)
    old_edges = old_mapping \
        .filter(F.col("product_id") != F.col("canonical_id")) \
        .select(F.col("product_id").alias("src"),
                F.col("canonical_id").alias("dst"))
    edges = pairs.select("src", "dst").union(old_edges)
    labels = connected_components(edges, catalog, id_col="product_id",
                                  driver_threshold=cc_driver_threshold)
    return labels.select(F.col("id").alias("product_id"),
                         F.col("component").alias("canonical_id"))


def canonicalize(df: DataFrame, mapping: DataFrame,
                 cols: list[str]) -> DataFrame:
    """Rewrite every id column in ``cols`` through the canonical map
    (broadcast when dim-sized — mapping is |catalog| rows; at 1M+ rows
    Spark picks SMJ/shuffled-hash automatically)."""
    out = df
    for c in cols:
        m = mapping.select(F.col("product_id").alias(c),
                           F.col("canonical_id").alias(f"__canon_{c}"))
        out = out.join(m, c, "left").withColumn(
            c, F.coalesce(F.col(f"__canon_{c}"), F.col(c))
        ).drop(f"__canon_{c}")
    return out
