"""Streaming in-situ layer (reference's native dataflow, SURVEY §2.A).

Components:
- ``bridge.SparkBridge`` — the simulation-side ingest client (replaces
  reference ``Bridge``): validates metadata, writes chunk-row parquet
  files into a drop directory, sends the end-of-stream sentinel, reads
  feedback.
- ``engine.InSituEngine`` — the analytics side (replaces reference
  ``Deisa``): Structured Streaming over the drop directory, a stateful
  control-plane operator for assembly completeness / timestep boundaries /
  ordering / sentinel, and a driver-side dispatcher for sliding windows,
  AND/OR gating, callback invocation, and feedback publication.
- ``feedback.FeedbackStore`` — keyed (timestep, value) queues with
  strict-increase enforcement and fixed-size eviction.
"""

from deisa_ray_spark.streaming.bridge import SparkBridge
from deisa_ray_spark.streaming.engine import ArrayWindow, InSituEngine
from deisa_ray_spark.streaming.feedback import FeedbackStore

__all__ = ["SparkBridge", "ArrayWindow", "InSituEngine", "FeedbackStore"]
