"""Similarity search over embeddings (filled in by the LLM-pipeline
milestone)."""
