"""fashion_knowledge_graph_spark — a from-scratch PySpark-native
knowledge-graph construction engine with the capabilities of
``ashleyashok/fashion-knowledge-graph`` (reference read-only at
/root/reference; cited by file:line in docstrings).

The reference is a row-at-a-time Python application delegating to
Neo4j / Pinecone / Azure OpenAI. This package re-expresses its
semantics as distributed Spark DataFrame pipelines:

- ``taxonomy``   — the reference's closed attribute vocabularies
                   (src/utils/prompts.py:4-13) as DataFrame dims.
- ``datagen``    — deterministic synthetic fixtures (FIXTURES.md).
- ``functions``  — deterministic hash embeddings (stand-in for CLIP /
                   MiniLM, src/models/embedding_model.py), text utils.
- ``operators``  — mention detection, attribute→triple extraction,
                   LSH-blocked top-k cosine linking, co-occurrence
                   edges, connected components, top-k, RRF, dedup,
                   similarity search.
- ``sources``    — snapshot-committed parquet tables (local stand-in
                   for Iceberg), lineage + per-partition metrics.
- ``plans``      — end-to-end pipeline + recommendation query layer.
- ``streaming``  — incremental (resume / micro-batch) processing.
"""

__version__ = "0.1.0"
