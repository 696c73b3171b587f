"""Feedback channel as a Spark Python DataSource WRITER (Spark 4 API):
``df.write.format("deisa_feedback")`` and
``df.writeStream.format("deisa_feedback")``.

The reference's feedback path is ``Deisa.set(key, value, t)`` — an RPC
to the head actor, which enforces strictly-increasing timesteps per key
and bounded retention (A11, head_node.py:213-261). The engine already
exposes that as the imperative ``streaming.feedback.FeedbackStore``;
THIS module is the declarative twin: any DataFrame/stream of
``(key, t, value)`` rows can be sunk into the same store, which closes
the fileless in-situ loop end-to-end inside Spark — sim_grid source →
DataFrame transformations → feedback sink → ``SparkBridge.get``.

Contract placement mirrors the reference: executors only STAGE rows
(the bridge ranks' sends), the driver-side ``commit`` validates
strict-increase and publishes in timestep order (the head actor's
role). A failed batch publishes nothing (abort discards staged rows),
so the store never sees partial batches — exactly-once at feedback
granularity.

Feedback values are small by contract (reference: JSON-serializable,
queue_size default 1024), so rows travel in the commit messages
themselves — no staging files, no executor-side store access.

Scale notes: the feedback table is broadcast-size BY CONTRACT; the
writer's cost is one driver-side pass over O(keys × queue) tiny rows
per commit. The heavy side (the analytics producing the feedback) stays
fully distributed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

#: expected input schema (value pre-serialized to a JSON string).
FEEDBACK_SCHEMA = "key string, t bigint, value string"


@dataclass
class _StagedRows(WriterCommitMessage):
    rows: list  # list[(key, t, value_json)]


def _stage(iterator) -> _StagedRows:
    staged = []
    for row in iterator:
        staged.append((row["key"], int(row["t"]), row["value"]))
    return _StagedRows(rows=staged)


def _publish(feedback_dir: str, queue_size: int, messages) -> None:
    import json

    from deisa_ray_spark.streaming.feedback import FeedbackStore

    store = FeedbackStore(feedback_dir, queue_size=queue_size)
    rows = [r for m in messages if m is not None for r in m.rows]
    # Publish in (t, key) order so intra-batch multi-t keys satisfy the
    # strict-increase guard exactly when they are logically ordered.
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    # VALIDATE the whole batch against the store BEFORE writing anything
    # ("a failed batch publishes nothing"): a mid-loop violation would
    # otherwise leave earlier rows published, and the retried batch
    # would then trip the guard on its own partial publish — a
    # permanent crash loop.
    max_t = dict(store._max_t)
    for key, t, _value in ordered:
        prev = max_t.get(key)
        if prev is not None and t <= prev:
            raise ValueError(
                f"feedback batch rejected (nothing published): key={key!r} "
                f"t={t} <= stored max {prev} — timesteps must be strictly "
                "increasing per key"
            )
        max_t[key] = t
    for key, t, value in ordered:
        store.set(key, json.loads(value), t)


def _already_committed(feedback_dir: str, batch_id: int) -> bool:
    import os

    return os.path.exists(
        os.path.join(feedback_dir, f".committed-{batch_id}")
    )


def _mark_committed(feedback_dir: str, batch_id: int) -> None:
    import os

    os.makedirs(feedback_dir, exist_ok=True)
    with open(os.path.join(feedback_dir, f".committed-{batch_id}"), "w"):
        pass


class _FeedbackBatchWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.queue_size = int(options.get("queue_size", "1024"))

    def write(self, iterator) -> _StagedRows:
        return _stage(iterator)

    def commit(self, messages) -> None:
        _publish(self.path, self.queue_size, messages)

    def abort(self, messages) -> None:
        pass  # nothing was published


class _FeedbackStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.queue_size = int(options.get("queue_size", "1024"))

    def write(self, iterator) -> _StagedRows:
        return _stage(iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        # at-least-once replay of an already-committed batch must be a
        # no-op, not a strict-increase violation
        if _already_committed(self.path, batchId):
            return
        _publish(self.path, self.queue_size, messages)
        _mark_committed(self.path, batchId)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        pass


class FeedbackDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deisa_feedback"

    def schema(self) -> str:
        return FEEDBACK_SCHEMA

    def writer(self, schema, overwrite: bool) -> _FeedbackBatchWriter:
        if overwrite:
            raise ValueError("deisa_feedback is append-only (reference A11)")
        return _FeedbackBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> _FeedbackStreamWriter:
        return _FeedbackStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration: ``df.write.format('deisa_feedback')``."""
    spark.dataSource.register(FeedbackDataSource)
