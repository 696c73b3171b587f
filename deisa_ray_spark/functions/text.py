"""Text analysis operators over the ``documents`` table (filled in by the
LLM-pipeline milestone)."""
