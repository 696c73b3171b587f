"""Scratch-path policy: one root for every derived artifact the engine
stages outside the source tables (MRL stored-prefix cache, compaction
outputs, bench table splits).

Resolution order:

1. ``$SPARK_GRAFT_SCRATCH_DIR`` — the operator's explicit choice; on a
   real cluster point this at shared storage so every executor sees the
   staged files (the same reason ``maintenance.compact_parquet`` takes
   an explicit ``dst_dir``).
2. A per-user directory under the system temp root — correct for
   local[, the test/bench environment] where driver and "executors"
   share one filesystem, and safe on multi-user hosts (a shared fixed
   dir would be owned by whoever ran first).

Callers that stage derived data should take a ``scratch_root=None``
parameter and resolve it through :func:`scratch_root`, keeping the
policy in one place.
"""

from __future__ import annotations

import getpass
import os
import tempfile

ENV_VAR = "SPARK_GRAFT_SCRATCH_DIR"


def _user_tag() -> str:
    try:
        return getpass.getuser()
    except Exception:
        return str(os.getuid()) if hasattr(os, "getuid") else "u"


def scratch_root(explicit: str | None = None) -> str:
    """Resolve the scratch root (created if missing)."""
    root = (
        explicit
        or os.environ.get(ENV_VAR)
        or os.path.join(tempfile.gettempdir(), f"deisa_scratch_{_user_tag()}")
    )
    os.makedirs(root, exist_ok=True)
    return root
