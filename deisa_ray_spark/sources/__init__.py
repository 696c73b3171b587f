"""Sources: parquet table registry + chunk-table model + ingest client."""

from deisa_ray_spark.sources.registry import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
