"""Relational + custom operators composing the KG pipeline."""
