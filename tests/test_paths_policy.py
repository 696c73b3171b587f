"""Scratch-root policy (paths.py) and the MRL stored-prefix staging
that uses it: explicit param > $SPARK_GRAFT_SCRATCH_DIR > per-user
tempdir, and the prefix cache must land under the resolved root while
still serving fresh, correct prefixes."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from deisa_ray_spark import paths
from deisa_ray_spark.functions.similarity import MRL_KEEP_DIMS, mrl_prefix_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_scratch_root_resolution_order(tmp_path, monkeypatch):
    envd = tmp_path / "env_root"
    argd = tmp_path / "arg_root"
    monkeypatch.setenv(paths.ENV_VAR, str(envd))
    assert paths.scratch_root(str(argd)) == str(argd)  # explicit wins
    assert paths.scratch_root() == str(envd)  # then env
    assert argd.is_dir() and envd.is_dir()  # both created
    monkeypatch.delenv(paths.ENV_VAR)
    assert "deisa_scratch_" in paths.scratch_root()  # tempdir fallback


def test_run_scratch_root_is_per_process_and_stable(tmp_path, monkeypatch):
    monkeypatch.setenv(paths.ENV_VAR, str(tmp_path / "r"))
    a = paths.run_scratch_root()
    b = paths.run_scratch_root()
    assert a == b, "must be stable within one process"
    assert f"run-{os.getpid()}-" in a, "must be keyed to THIS process"
    assert os.path.isdir(a)


def test_mrl_prefix_stages_under_scratch_root(spark, tmp_path, monkeypatch):
    root = tmp_path / "scratch"
    monkeypatch.setenv(paths.ENV_VAR, str(root))
    df = mrl_prefix_table(spark, SF_DIR)
    # staging is PER-PROCESS: <root>/run-<pid>-<token>/mrl_prefix — no
    # artifact computed from the sources may survive the invocation
    # that built it (and the run dir is removed at interpreter exit)
    run_dirs = [d for d in root.iterdir() if d.name.startswith(f"run-{os.getpid()}-")]
    assert len(run_dirs) == 1, f"expected one per-process run dir, got {run_dirs}"
    staged = run_dirs[0] / "mrl_prefix"
    assert staged.is_dir() and any(staged.iterdir()), "cache not under run root"
    # staged prefixes match a fresh slice of the source
    want = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.slice(F.col("embedding").cast("array<double>"), 1, MRL_KEEP_DIMS).alias(
                "prefix"
            ),
        )
    )
    assert df.count() == want.count()
    assert df.exceptAll(want).count() == 0
    # explicit param overrides the env root (same per-run layout)
    other = tmp_path / "other"
    mrl_prefix_table(spark, SF_DIR, scratch_root=str(other))
    other_runs = [d for d in other.iterdir() if d.name.startswith(f"run-{os.getpid()}-")]
    assert len(other_runs) == 1 and (other_runs[0] / "mrl_prefix").is_dir()


def test_publish_eviction_spares_inflight_build_dirs(tmp_path):
    """Superseded-fingerprint eviction must skip a concurrent builder's
    `.build-` work dir: deleting it would crash the losing builder
    mid-write instead of letting it fall back to the winner."""
    root = str(tmp_path / "cache")

    def build(tmp):
        with open(os.path.join(tmp, "_STAGED_OK"), "w") as f:
            f.write("x")

    os.makedirs(root)
    stale = os.path.join(root, "src1-oldfp")
    os.makedirs(stale)
    open(os.path.join(stale, "_STAGED_OK"), "w").close()
    inflight = os.path.join(root, "src1-newfp.build-deadbeef")
    os.makedirs(inflight)
    open(os.path.join(inflight, "partial.parquet"), "w").close()

    out = paths.publish_fingerprinted_dir(root, "src1", "newfp", build)
    assert os.path.exists(os.path.join(out, "_STAGED_OK"))
    assert not os.path.exists(stale)  # superseded fingerprint evicted
    assert os.path.exists(inflight)  # in-flight builder untouched


def test_stage_split_subsets_do_not_share_cache_identity(tmp_path, monkeypatch):
    """Different table subsets must stage under different src_keys, so
    one subset's eviction can never delete another's live dir."""
    from deisa_ray_spark.maintenance import stage_split_tables

    monkeypatch.setenv(paths.ENV_VAR, str(tmp_path / "scratch"))
    a = stage_split_tables(SF_DIR, tables=["region"])
    b = stage_split_tables(SF_DIR, tables=["nation"])
    assert a != b
    assert os.path.exists(os.path.join(a, "_STAGED_OK"))
    assert os.path.exists(os.path.join(b, "_STAGED_OK"))
