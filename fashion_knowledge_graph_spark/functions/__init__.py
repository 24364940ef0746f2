"""Scalar / vectorized functions: deterministic hash embeddings,
cosine similarity columns, text analysis primitives."""
