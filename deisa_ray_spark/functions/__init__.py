"""Training-data pipeline functions: dedup, similarity search, text
analysis, multimodal column plumbing (north-star extensions beyond the
reference surface, SURVEY §7 Phase 5)."""
