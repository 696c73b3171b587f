"""Cross-OS-process workflow tests, mirroring the reference's real
``mpirun -n 4`` e2e (reference tests/test_mpi_workflow.py:92-135) without
MPI: four bridge ranks run as separate OS processes writing concurrently
into one drop directory while the engine consumes it in the parent.

This pins the actual concurrency surface of the drop-dir protocol —
atomic rename visibility (no partial reads), cross-process mtime
ordering, per-rank ordered sends interleaving — which single-process
tests cannot.

Also the negative case from reference tests/test_startup_order.py: a
world with fewer live bridges than the declared chunk grid must FAIL
with a clear error, not hang forever.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from deisa_ray_spark.errors import ContractError
from deisa_ray_spark.streaming import ArrayWindow, InSituEngine, SparkBridge
from deisa_ray_spark.streaming.bridge import metadata_for_grid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GLOBAL = (4, 4)
CHUNK = (2, 2)
N_RANKS = 4
N_STEPS = 5

_RANK_SCRIPT = """
import os, sys, time
import numpy as np

sys.path.insert(0, {repo!r})
from deisa_ray_spark.streaming.bridge import SparkBridge, metadata_for_grid

rank = int(sys.argv[1])
chunk_dir = sys.argv[2]
pos = (rank // 2, rank % 2)
md = metadata_for_grid(("temperature",), {glob!r}, {chunk!r}, pos)
b = SparkBridge(rank, md, chunk_dir)
for t in range({steps}):
    b.send("temperature", t * (rank + 1) * np.ones({chunk!r}, dtype=np.int64), t)
# MPI-barrier analogue: every rank marks done; rank 0 waits for all
# before emitting the sentinel (the reference closes after a barrier).
open(os.path.join(chunk_dir, f".rank{{rank}}.done"), "w").close()
if rank == 0:
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(
            os.path.exists(os.path.join(chunk_dir, f".rank{{r}}.done"))
            for r in range({ranks})
        ):
            break
        time.sleep(0.05)
    else:
        sys.exit(2)
    b.close({steps} - 1)
"""


def test_four_os_process_bridges_golden_values(spark, tmp_path):
    """4 concurrent bridge processes, engine in the parent: assembled
    sum per timestep must equal 4t*(1+2+3+4) = 40t, every timestep
    dispatched exactly once, all ranks exit 0."""
    chunk_dir = str(tmp_path / "chunks")
    script = tmp_path / "rank_worker.py"
    script.write_text(
        _RANK_SCRIPT.format(
            repo=REPO, glob=GLOBAL, chunk=CHUNK, steps=N_STEPS, ranks=N_RANKS
        )
    )
    procs = [
        subprocess.Popen([sys.executable, str(script), str(r), chunk_dir])
        for r in range(N_RANKS)
    ]
    try:
        sums: dict[int, float] = {}

        def cb(temperature):
            af = temperature[-1]
            a = af.to_numpy()
            assert a.shape == GLOBAL
            sums[af.t] = float(a.sum())

        engine = InSituEngine(spark, chunk_dir)
        engine.register_callback(cb, ArrayWindow("temperature"))
        engine.run(
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=None,
            timeout_sec=120.0,
        )
        assert sums == {t: 40.0 * t for t in range(N_STEPS)}
        assert engine.callbacks[0].calls == N_STEPS
    finally:
        for p in procs:
            p.wait(timeout=60)
    assert [p.returncode for p in procs] == [0] * N_RANKS


def test_under_subscribed_world_fails_fast(spark, tmp_path):
    """Declared 2-rank grid, only rank 0 ever sends: the engine must
    raise ContractError naming the partially-assembled group within the
    stall window — not block until the global timeout (reference
    tests/test_startup_order.py negative case)."""
    chunk_dir = str(tmp_path / "chunks")
    md = metadata_for_grid(("temperature",), (2, 4), CHUNK, (0, 0))
    b0 = SparkBridge(0, md, chunk_dir)  # rank 1 at (0, 1) never starts
    b0.send("temperature", np.ones(CHUNK, dtype=np.int64), 0)

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(lambda temperature: None, ArrayWindow("temperature"))
    with pytest.raises(ContractError, match="under-subscribed.*1/2 chunks"):
        engine.run(
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=None,
            timeout_sec=60.0,
            stall_timeout=2.0,
        )


def test_fully_assembled_stall_keeps_polling_until_timeout(spark, tmp_path):
    """The stall gate must NOT fire when every sent timestep is fully
    assembled (simulation alive between timesteps): that world hits the
    plain sentinel timeout instead of a spurious under-subscription
    error."""
    chunk_dir = str(tmp_path / "chunks")
    md = metadata_for_grid(("temperature",), CHUNK, CHUNK, (0, 0))
    b0 = SparkBridge(0, md, chunk_dir)  # 1-rank grid, fully assembled
    b0.send("temperature", np.ones(CHUNK, dtype=np.int64), 0)

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(lambda temperature: None, ArrayWindow("temperature"))
    with pytest.raises(TimeoutError, match="sentinel not seen"):
        engine.run(
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=None,
            timeout_sec=8.0,
            stall_timeout=2.0,
        )
    # t=0 is fully assembled but never dispatched: a timestep only closes
    # when a newer assembly (or the sentinel) arrives (A5) — the point is
    # that the stall gate did NOT misdiagnose this as under-subscription.
    assert engine.callbacks[0].calls == 0


def test_stray_partial_tmp_files_are_ignored(spark, tmp_path):
    """A bridge process killed mid-write leaves a hidden `.*.tmp` file in
    a chunk subdirectory (the atomic-rename protocol's only possible
    debris). The engine must ignore it everywhere: the streaming control
    plane, the data-plane read, and the under-subscription scan."""
    chunk_dir = str(tmp_path / "chunks")
    bridges = [
        SparkBridge(r, metadata_for_grid(("temperature",), GLOBAL, CHUNK,
                                         (r // 2, r % 2)), chunk_dir)
        for r in range(4)
    ]
    for t in range(3):
        for r, b in enumerate(bridges):
            b.send("temperature", t * (r + 1) * np.ones(CHUNK, dtype=np.int64), t)
    # simulate a crashed writer: garbage half-written tmp + a stray
    # hidden file at the drop root
    sub = os.path.join(chunk_dir, "arr_temperature", "t_1")
    with open(os.path.join(sub, ".chunk-9999-deadbeef.parquet.tmp"), "wb") as f:
        f.write(b"\x00\x01 not parquet at all")
    with open(os.path.join(chunk_dir, ".partial-upload"), "wb") as f:
        f.write(b"junk")
    bridges[0].close(2)

    sums = {}

    def cb(temperature):
        af = temperature[-1]
        sums[af.t] = float(af.to_numpy().sum())

    engine = InSituEngine(spark, chunk_dir)
    engine.register_callback(cb, ArrayWindow("temperature"))
    engine.run(checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=None)
    assert sums == {t: 40.0 * t for t in range(3)}
    # the under-subscription scan also skips hidden files: all groups
    # read as complete
    assert engine._incomplete_assemblies() == []


_FB_RANK_SCRIPT = """
import json, os, sys, time
import numpy as np

sys.path.insert(0, {repo!r})
from deisa_ray_spark.streaming.bridge import SparkBridge, metadata_for_grid

rank = int(sys.argv[1])
chunk_dir = sys.argv[2]
fb_dir = sys.argv[3]
pos = (rank // 2, rank % 2)
md = metadata_for_grid(("temperature",), {glob!r}, {chunk!r}, pos)
b = SparkBridge(rank, md, chunk_dir, feedback_dir=fb_dir)
out = {{}}
# pre-publish probe: nothing set yet -> default (reference miss path)
out["pre_miss"] = b.get("sum", 0, default="MISS")
for t in range({steps}):
    b.send("temperature", t * (rank + 1) * np.ones({chunk!r}, dtype=np.int64), t)
open(os.path.join(chunk_dir, f".rank{{rank}}.done"), "w").close()
if rank == 0:
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(
            os.path.exists(os.path.join(chunk_dir, f".rank{{r}}.done"))
            for r in range({ranks})
        ):
            break
        time.sleep(0.05)
    else:
        sys.exit(2)
    b.close({steps} - 1)
# collective read: EVERY rank polls for the engine's last published
# feedback (reference tests/test_feedback_loop.py:221-252 — all ranks
# observe the value, not just rank 0)
last_t = {steps} - 1
deadline = time.time() + 90
while time.time() < deadline:
    v = b.get("sum", last_t, default=None)
    if v is not None:
        out["hit"] = v
        break
    time.sleep(0.1)
else:
    sys.exit(3)
out["post_miss"] = b.get("sum", 999, default="MISS")  # exact-t miss stays a miss
out["queue"] = b.get("sum")  # no-t form: full queue oldest->newest
with open(os.path.join(chunk_dir, f".fbout.rank{{rank}}.json"), "w") as f:
    json.dump(out, f)
"""


def test_cross_process_feedback_loop_e2e(spark, tmp_path):
    """4 OS-process bridges + parent engine publishing feedback at every
    boundary: every rank observes the published value (collective read),
    exact-t misses stay misses, and the queue form returns the full
    history — the reference's feedback-loop e2e without MPI."""
    chunk_dir = str(tmp_path / "chunks")
    fb_dir = str(tmp_path / "fb")
    script = tmp_path / "fb_rank_worker.py"
    script.write_text(
        _FB_RANK_SCRIPT.format(
            repo=REPO, glob=GLOBAL, chunk=CHUNK, steps=N_STEPS, ranks=N_RANKS
        )
    )
    procs = [
        subprocess.Popen([sys.executable, str(script), str(r), chunk_dir, fb_dir])
        for r in range(N_RANKS)
    ]
    try:
        engine = InSituEngine(spark, chunk_dir, feedback_dir=fb_dir)

        def cb(temperature):
            af = temperature[-1]
            engine.set("sum", float(af.to_numpy().sum()), af.t)

        engine.register_callback(cb, ArrayWindow("temperature"))
        engine.run(
            checkpoint_dir=str(tmp_path / "ckpt"),
            max_files_per_trigger=None,
            timeout_sec=120.0,
        )
    finally:
        for p in procs:
            p.wait(timeout=120)
    assert [p.returncode for p in procs] == [0] * N_RANKS
    import json as _json

    for r in range(N_RANKS):
        with open(os.path.join(chunk_dir, f".fbout.rank{r}.json")) as f:
            out = _json.load(f)
        assert out["pre_miss"] == "MISS"
        assert out["hit"] == 40.0 * (N_STEPS - 1)
        assert out["post_miss"] == "MISS"
        # queue form: (t, value) pairs oldest→newest (JSON: lists)
        assert out["queue"] == [[t, 40.0 * t] for t in range(N_STEPS)]
