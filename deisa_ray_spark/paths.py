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
parameter and resolve it through :func:`run_scratch_root` (per-process:
staged artifacts never outlive the invocation that built them — see its
docstring for why), keeping the policy in one place. :func:`scratch_root`
alone resolves the shared base directory.
"""

from __future__ import annotations

import getpass
import os
import tempfile
import time

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


_RUN_TOKEN: str | None = None


def run_scratch_root(explicit: str | None = None) -> str:
    """Per-PROCESS staging root: ``<scratch_root>/run-<pid>-<token>``.

    Every artifact the engine derives from the source tables (MRL
    stored-prefix table, bench table splits) stages under THIS root, so
    nothing computed from the inputs survives the process: each bench /
    oracle invocation rebuilds its staged artifacts from the parquet
    sources. A cross-run fingerprint-keyed cache would amortize work the
    bench is supposed to measure, and would silently poison cross-core-
    count comparisons (an artifact staged by a ``local[32]`` run served
    to a ``local[8]`` run). Within the process the
    :func:`publish_fingerprinted_dir` protocol still dedups concurrent
    builders and in-place data regenerations.

    The dir is removed at interpreter exit (best effort); a root
    abandoned by a killed process is aged out (>6 h since its newest
    mtime) by the next process that initializes its own."""
    global _RUN_TOKEN
    import shutil
    import uuid

    base = scratch_root(explicit)
    first = _RUN_TOKEN is None
    if first:
        _RUN_TOKEN = uuid.uuid4().hex[:8]
    if first:
        now = time.time()
        for d in os.listdir(base):
            if d.startswith("run-") and not d.startswith(f"run-{os.getpid()}-"):
                full = os.path.join(base, d)
                if now - _tree_newest_mtime(full) > 6 * 3600:
                    shutil.rmtree(full, ignore_errors=True)
    root = os.path.join(base, f"run-{os.getpid()}-{_RUN_TOKEN}")
    if not os.path.isdir(root):
        import atexit

        os.makedirs(root, exist_ok=True)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def _tree_newest_mtime(root: str) -> float:
    """Newest mtime of ``root`` or anything under it; +inf (never
    stale) when the tree vanishes or errors mid-walk — deletion must be
    conservative."""
    try:
        newest = os.path.getmtime(root)
        for dirpath, dirnames, filenames in os.walk(root):
            for name in dirnames + filenames:
                try:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, name))
                    )
                except OSError:
                    return float("inf")
        return newest
    except OSError:
        return float("inf")


def publish_fingerprinted_dir(
    root_dir: str,
    src_key: str,
    fp_key: str,
    build: "callable",
) -> str:
    """Build-once cache-dir protocol shared by every staged artifact
    (MRL stored-prefix table, bench table splits): the artifact for
    ``(src_key, fp_key)`` lives at ``<root>/<src_key>-<fp_key>``;
    ``build(tmp_dir)`` populates a fresh build dir which is atomically
    renamed into place (a concurrent loser keeps the winner's copy),
    and publishing a new fingerprint for a source EVICTS that source's
    superseded dirs — bounded growth across data regenerations.

    ``build`` must leave a ``_STAGED_OK`` marker file in the dir it is
    given; its presence is the completed-publication check. Eviction
    skips ``.build-`` work dirs: deleting a concurrent builder's
    in-flight tmp dir would crash the loser instead of letting it fall
    back to the winner."""
    import shutil
    import uuid

    os.makedirs(root_dir, exist_ok=True)
    out = os.path.join(root_dir, f"{src_key}-{fp_key}")
    if not os.path.exists(os.path.join(out, "_STAGED_OK")):
        tmp = f"{out}.build-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        try:
            build(tmp)
            if not os.path.exists(os.path.join(tmp, "_STAGED_OK")):
                raise RuntimeError(
                    f"build() left no _STAGED_OK marker in {tmp}"
                )
        except BaseException:
            # a failed build must not leave an orphaned work dir behind
            # (eviction deliberately skips live .build- dirs, so leaks
            # here would accumulate unbounded)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner exists
        now = time.time()
        for d in os.listdir(root_dir):
            full = os.path.join(root_dir, d)
            if ".build-" in d:
                # live concurrent builders are untouchable, but a
                # crashed builder's dir (killed harder than an
                # exception can catch) ages out after an hour. Staleness
                # is the NEWEST mtime anywhere in the tree: a builder
                # writing into a nested subdir updates only that
                # subdir's mtime, not the top dir's — keying on the top
                # dir alone would rmtree a live long build out from
                # under its builder.
                if now - _tree_newest_mtime(full) > 3600:
                    shutil.rmtree(full, ignore_errors=True)
            elif d.startswith(f"{src_key}-") and d != f"{src_key}-{fp_key}":
                shutil.rmtree(full, ignore_errors=True)
    return out


def fingerprint_paths(paths_and_names) -> str:
    """Size+mtime fingerprint over (label, path) pairs — the data-version
    key for staged artifacts (testdata regenerates in place)."""
    import hashlib

    stats = []
    for label, p in paths_and_names:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for fn in sorted(files):
                    st = os.stat(os.path.join(root, fn))
                    stats.append(f"{label}/{fn}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.exists(p):
            st = os.stat(p)
            stats.append(f"{label}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(stats).encode()).hexdigest()[:12]
