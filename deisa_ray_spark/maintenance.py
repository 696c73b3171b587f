"""Table maintenance: small-file compaction for parquet directories.

Streaming ingest (the bridge's one-file-per-send drop dir, or any
micro-batched sink) accretes many small files; at 100 TB the resulting
listing/footer overhead and 1-row-group scans dominate read cost. This
op rewrites a directory into few large files, optionally range-sorted
on a key — which both restores scan parallelism (row groups sized to
``maxPartitionBytes``) and gives readers min/max-statistics pruning on
the sort key.

The reference has no storage maintenance at all (its store is Ray's
in-memory object store, freed per timestep — SURVEY A16); this is part
of the persistent-table surface the Spark engine adds.

Scale notes: the rewrite is one shuffle (range partitioning on the sort
key, or round-robin without one) sized so each output file ≈
``target_file_bytes``; executors write in parallel; nothing passes the
driver. Equivalent of OPTIMIZE/compaction in table formats, without
requiring one.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionReport:
    n_files_before: int
    n_files_after: int
    bytes_before: int
    bytes_after: int
    n_rows: int


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith((".", "_"))
    ]


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    sort_by: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> CompactionReport:
    """Rewrite ``src_dir``'s parquet files into ``dst_dir`` as
    ``ceil(input_bytes / target_file_bytes)`` files, range-sorted on
    ``sort_by`` when given (enables min/max pruning on that key)."""
    before = _parquet_files(src_dir)
    bytes_before = sum(os.path.getsize(f) for f in before)
    n_out = max(1, -(-bytes_before // target_file_bytes))

    df = spark.read.parquet(src_dir)
    if sort_by:
        df = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst_dir)

    after = _parquet_files(dst_dir)
    n_rows = spark.read.parquet(dst_dir).count()
    return CompactionReport(
        n_files_before=len(before),
        n_files_after=len(after),
        bytes_before=bytes_before,
        bytes_after=sum(os.path.getsize(f) for f in after),
        n_rows=n_rows,
    )


@dataclass(frozen=True)
class PartitionReport:
    n_partitions: int
    n_files: int
    n_rows: int


def partition_table(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    partition_by: list[str],
    files_per_partition: int = 1,
) -> PartitionReport:
    """Rewrite a parquet directory hive-partitioned on ``partition_by``
    (directory-encoded key values). This is what makes two pruning paths
    available to every downstream query:

    - static partition pruning — a literal predicate on the partition key
      never lists, let alone reads, non-matching directories;
    - dynamic partition pruning (DPP) — a join against a filtered
      dimension prunes fact partitions at RUNTIME from the dimension's
      build side (``dynamicpruningexpression`` in the scan's
      PartitionFilters — pinned in tests/test_plans.py).

    At 100 TB this is the difference between scanning a day and scanning
    the archive. Keep the key low-cardinality (date buckets, source,
    tenant): each (partition × shuffle task) pair can emit a file, so a
    high-cardinality key re-creates the small-file problem compaction
    removes — hence the per-partition repartition below.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_dir)
    if files_per_partition > 1:
        # repartition(n, *partition_by) alone hashes on the key itself,
        # putting ALL of a key's rows in one task — the knob would be a
        # silent no-op. A row-hash salt bucket spreads each key over up
        # to files_per_partition tasks, giving real per-partition file
        # fan-out for scan parallelism.
        data_cols = [c for c in df.columns if c not in partition_by]
        salt = (F.abs(F.hash(*data_cols)) % files_per_partition).alias("__salt")
        df = (
            df.withColumn("__salt", salt)
            .repartition(files_per_partition * 8, *partition_by, "__salt")
            .drop("__salt")
        )
    else:
        df = df.repartition(files_per_partition, *partition_by)
    df.write.partitionBy(*partition_by).mode("overwrite").parquet(dst_dir)
    out = spark.read.parquet(dst_dir)
    n_parts = out.select(*partition_by).distinct().count()
    return PartitionReport(
        n_partitions=n_parts,
        n_files=len(_parquet_files(dst_dir)),
        n_rows=out.count(),
    )


def _zvalue(scaled_cols: list, bits: int = 16):
    """Bit-interleaved Morton code of pre-scaled long columns (JVM
    expressions only): bit b of column i lands at position b*n + i."""
    from pyspark.sql import functions as F

    n = len(scaled_cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled_cols):
            bit = F.shiftright(c, b).bitwiseAND(1)
            z = z + F.shiftleft(bit, b * n + i)
    return z


def zorder_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> CompactionReport:
    """Rewrite a parquet directory clustered on the Morton (Z-order)
    curve of ``cols``: range-partition + sort on the interleaved bit
    code, so EVERY listed column gets tight per-file min/max ranges —
    multi-dimensional data skipping, where a single-key sort gives
    min/max locality on the leading key only and leaves the second
    key's per-file range ≈ the whole domain.

    At 100 TB this is what lets ``WHERE l_partkey = ? AND l_suppkey
    BETWEEN ? AND ?`` skip most files on footer stats regardless of
    which predicate is more selective (the OPTIMIZE ZORDER BY of table
    formats, without requiring one). One shuffle (range partitioning on
    the z-value), executor-side writes, z-column dropped on write.
    """
    from pyspark.sql import functions as F

    if len(cols) * bits > 64:
        # shiftleft wraps its shift amount mod 64, so bit positions past
        # 63 would silently interleave ON TOP of the low bits — files
        # written without error, clustering quietly wrong
        raise ValueError(
            f"len(cols) * bits = {len(cols) * bits} exceeds the 64-bit "
            f"z-value; lower bits (e.g. bits={64 // len(cols)}) or cluster "
            "fewer columns"
        )
    before = _parquet_files(src_dir)
    df = spark.read.parquet(src_dir)
    # Normalize every dimension to the same bit-width before
    # interleaving — with raw values, the key with the wider domain owns
    # all the high interleaved bits and the curve degenerates to a
    # single-key sort. The min/max pass is one tiny aggregate (O(cols)
    # scalars to the driver).
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    bad = [c for c in cols if stats[f"lo_{c}"] is None]
    if bad:
        raise ValueError(
            f"cannot z-order {src_dir}: empty input or all-NULL cluster "
            f"column(s) {bad} (no min/max stats to scale by)"
        )
    top = (1 << bits) - 1
    scaled = [
        (
            (F.col(c).cast("double") - float(stats[f"lo_{c}"]))
            * top
            / max(float(stats[f"hi_{c}"]) - float(stats[f"lo_{c}"]), 1.0)
        )
        .cast("long")
        for c in cols
    ]
    df = df.withColumn("__z", _zvalue(scaled, bits))
    out = (
        df.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(dst_dir)
    after = _parquet_files(dst_dir)
    return CompactionReport(
        n_files_before=len(before),
        n_files_after=len(after),
        bytes_before=sum(os.path.getsize(f) for f in before),
        bytes_after=sum(os.path.getsize(f) for f in after),
        n_rows=spark.read.parquet(dst_dir).count(),
    )


@dataclass(frozen=True)
class UpsertReport:
    n_partitions_rewritten: int
    n_updated: int
    n_inserted: int


def upsert_parquet(
    spark: SparkSession,
    table_dir: str,
    updates,
    keys: list[str],
    partition_by: list[str],
) -> UpsertReport:
    """MERGE (upsert by key) into a hive-partitioned parquet table
    WITHOUT a table format: only the partitions present in ``updates``
    are read, merged (existing rows losing to updates on ``keys``), and
    rewritten — Spark's dynamic partitionOverwriteMode leaves every
    other partition's files physically untouched (asserted by inode in
    the test).

    Scale notes (100 TB): cost is O(affected partitions), not O(table).
    The affected-partition list is a distinct over the updates (tiny by
    assumption — an upsert batch touches few partitions); the merge is
    one partition-pruned scan + one anti-join against the update keys,
    which broadcast when the batch is small. This is the idiomatic
    no-format MERGE; a table format adds ACID/concurrency on top, not a
    different data path.
    """
    from pyspark.sql import functions as F

    parts = [tuple(r) for r in updates.select(*partition_by).distinct().collect()]
    pred = F.lit(False)
    for vals in parts:
        clause = F.lit(True)
        for c, v in zip(partition_by, vals):
            # eqNullSafe: `col == lit(None)` is NULL (never true), which
            # would drop every existing null-partition row from the
            # merge while dynamic overwrite still rewrites that
            # partition — deleting unrelated data
            clause = clause & F.col(c).eqNullSafe(F.lit(v))
        pred = pred | clause

    old = spark.read.parquet(table_dir).filter(pred)
    n_before = old.count()
    kept = old.join(updates.select(*keys), keys, "left_anti")
    n_kept = kept.count()
    # The merged plan reads the very partitions the write replaces —
    # materialize it (bounded: affected partitions + batch only) before
    # overwriting, or the write's tasks race the deletes.
    merged = kept.unionByName(updates).localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_by).parquet(table_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # drop the session's stale file-listing cache for this path
    spark.catalog.refreshByPath(table_dir)

    n_updates = updates.count()
    return UpsertReport(
        n_partitions_rewritten=len(parts),
        n_updated=n_before - n_kept,
        n_inserted=n_updates - (n_before - n_kept),
    )


@dataclass(frozen=True)
class TableStats:
    n_rows: int
    size_bytes: int


def analyze_star_schema(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    prefix: str = "star_",
) -> dict[str, TableStats]:
    """Register parquet tables in the catalog and collect CBO statistics
    (row counts, sizes, per-column NDV/min/max histograms via ``ANALYZE
    TABLE … FOR ALL COLUMNS``).

    This is what makes Catalyst's cost-based optimizer live: with stats,
    ``spark.sql.cbo.enabled`` + ``joinReorder.enabled`` re-order
    multi-way inner joins so filtered/small relations join first and the
    fact table last — at 100 TB the difference between a fact×fact
    intermediate and a dimension-pruned probe side. Proven in
    tests/test_plans.py::test_cbo_reorders_join_by_stats.
    """
    out = {}
    for name in tables:
        tbl = f"{prefix}{name}"
        spark.read.parquet(f"{sf_dir}/{name}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(tbl)
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        }
        stats = desc.get("Statistics", "")
        size = int(stats.split(" bytes")[0]) if " bytes" in stats else 0
        rows = (
            int(stats.split(", ")[1].split(" rows")[0])
            if " rows" in stats
            else 0
        )
        out[name] = TableStats(n_rows=rows, size_bytes=size)
    return out


def stage_split_tables(
    sf_dir: str,
    tables: list[str] | None = None,
    min_files: int = 8,
    scratch_root: str | None = None,
) -> str:
    """Stage ``sf_dir``'s parquet tables re-split into ≥ ``min_files``
    files each, returning the staged directory (layout-compatible with
    ``sf_dir``: ``<out>/<table>.parquet`` is a parquet directory).

    Why: the driver-generated testdata writes each table as ONE file
    with ONE row group, which caps every scan at one task regardless of
    cores — a local-bench artifact, not a property of the engine (any
    production table is many files). Splitting restores honest scan
    parallelism for the bench without touching the source data or any
    oracle (oracles keep reading ``sf_dir``).

    The split is a pyarrow row-slice rewrite — SCHEMA-PRESERVING, no
    engine decode/re-encode, so physical quirks the loader contract
    pins (events' TIMESTAMP(NANOS)) survive. Staging is PER-PROCESS
    (``paths.run_scratch_root()/bench_split``): every bench invocation
    re-stages from the sources (a row-slice copy, untimed setup — no
    computed bytes survive across runs), keyed by the table SUBSET + a
    size+mtime fingerprint so two staging calls within one process
    (bench + mirror harness) share one copy; publication/eviction go
    through the shared ``paths.publish_fingerprinted_dir`` protocol
    (also the MRL prefix cache's)."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq

    from deisa_ray_spark import paths
    from deisa_ray_spark.sources.registry import TABLES

    tables = list(tables or TABLES)
    src_dir = os.path.abspath(sf_dir)
    srcs = [(name, os.path.join(src_dir, f"{name}.parquet")) for name in tables]
    # the table subset is part of the identity: two invocations staging
    # different subsets must not share (and evict) each other's dirs
    src_key = hashlib.md5(
        f"{src_dir}|{min_files}|{','.join(sorted(tables))}".encode()
    ).hexdigest()[:12]
    fp_key = paths.fingerprint_paths(srcs)

    def build(tmp: str) -> None:
        for name, src in srcs:
            dst = os.path.join(tmp, f"{name}.parquet")
            if os.path.isdir(src) and len(_parquet_files(src)) >= min_files:
                shutil.copytree(src, dst)  # already parallel enough
                continue
            tbl = pq.read_table(src)
            os.makedirs(dst, exist_ok=True)
            n = max(1, min(min_files, tbl.num_rows))
            step = max(1, -(-tbl.num_rows // n))  # ceil; >=1 so 0-row writes
            for i in range(n):
                part = tbl.slice(i * step, step)
                # a 0-row FIRST part still writes: an empty table must
                # stage as one schema-bearing file, not an empty dir
                # Spark cannot infer a schema from
                if part.num_rows == 0 and i > 0:
                    break
                pq.write_table(
                    part,
                    os.path.join(dst, f"part-{i:05d}.parquet"),
                    version="2.6",  # keeps TIMESTAMP(NANOS) physical type
                )
        with open(os.path.join(tmp, "_STAGED_OK"), "w") as f:
            f.write(fp_key)

    root_dir = os.path.join(paths.run_scratch_root(scratch_root), "bench_split")
    return paths.publish_fingerprinted_dir(root_dir, src_key, fp_key, build)
