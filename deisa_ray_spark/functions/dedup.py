"""Deduplication operators (filled in by the LLM-pipeline milestone)."""
