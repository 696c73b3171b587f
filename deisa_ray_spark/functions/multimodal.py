"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

North-star extension (SURVEY §7 Phase 5). PNG decode is REAL —
``decode_image_real`` routes PNG bytes through the pure-Python spec
codec ``formats/pngmini.py`` (stdlib zlib; PIL preferred when
installed), and ``mm_image_png_decode`` is the declared query consuming
real decoded pixels. Other formats (JPEG's DCT/huffman stack) remain
PIL-gated. The deterministic fake codec ``byte(i) = (media_id * 31 + i)
% 251`` still feeds the raw-payload plumbing queries, which makes the
ENTIRE Spark-side pipeline (binary payloads → mapInPandas decode →
per-media/per-frame features) verifiable against a closed-form SQL
oracle: schema, partitioning, UDF signatures, and batch shapes are real
in both paths.

Scale notes (100 TB): payloads stay opaque binary until the UDF — column
pruning means metadata-only queries never read them; decode parallelism =
input partitions (narrow, no shuffle); per-frame explode happens INSIDE
the Arrow batch, so the shuffle (if any downstream) sees already-reduced
features, not pixels.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deisa_ray_spark.registry import query

N_MEDIA = 40
FAKE_MOD = 251  #: prime modulus of the fake codec

#: Typed media schema: opaque payload + metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)


def _dims(m: int) -> tuple[int, int, int]:
    """Deterministic per-media image dims: width, height, n_frames."""
    return 8 + (m % 5) * 4, 8 + ((m * 7) % 3) * 4, 4 + m % 4


def fake_payload(media_id: int, n_bytes: int) -> bytes:
    """The deterministic fake codec (see module docstring)."""
    i = np.arange(n_bytes, dtype=np.int64)
    return ((media_id * 31 + i) % FAKE_MOD).astype(np.uint8).tobytes()


def make_media_df(spark: SparkSession, n: int = N_MEDIA) -> DataFrame:
    """Synthetic media table: images (even ids) and videos (odd ids).

    Partition count tracks the fixture size (40 rows → 2 partitions):
    each mapInPandas stage costs one Python worker per partition, so
    defaulting to cluster parallelism (32) turns a 2 s query into a 40 s
    one — measured, not theoretical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                w, h, nf = _dims(m)
                if m % 2 == 0:
                    rows.append(
                        {
                            "media_id": m,
                            "kind": "image",
                            "payload": fake_payload(m, w * h),
                            "meta": {"width": w, "height": h, "channels": 1,
                                     "n_frames": None, "sample_rate": None},
                        }
                    )
                else:
                    rows.append(
                        {
                            "media_id": m,
                            "kind": "video",
                            "payload": fake_payload(m, w * h * nf),
                            "meta": {"width": w, "height": h, "channels": 1,
                                     "n_frames": nf, "sample_rate": None},
                        }
                    )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=2).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image_real(payload: bytes, fmt: str = "PNG") -> np.ndarray:
    """REAL image decode. PIL when installed (every format); otherwise
    PNG decodes through the pure-Python spec codec
    (``formats/pngmini.py`` — stdlib zlib, chunk CRCs verified, all five
    scanline filters) and baseline grayscale JPEG through
    ``formats/jpegmini.py`` (r12 — T.81 marker parse, canonical Huffman,
    byte unstuffing, DC prediction, zigzag/dequant, exact float IDCT).
    Color / subsampled / progressive JPEG and other formats stay gated:
    stated, not silent."""
    # the try covers ONLY the import: an ImportError raised inside
    # PIL's lazy per-format plugin loading during the decode itself
    # must surface, not masquerade as "PIL not installed"
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:  # pragma: no cover — PIL absent in this env
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from deisa_ray_spark.formats.pngmini import decode_png

        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from deisa_ray_spark.formats.jpegmini import decode_jpeg_gray

        return decode_jpeg_gray(payload)
    raise NotImplementedError(
        f"real {fmt} decode requires PIL (not installed); only PNG and "
        "baseline grayscale JPEG have pure-Python decode paths "
        "(formats/pngmini.py, formats/jpegmini.py)"
    )


#: DuckDB twin of the fake codec: value of byte i of media m.
_SQL_BYTE = f"(m.media_id * 31 + i.i) % {FAKE_MOD}"
_SQL_MEDIA = f"""
media AS (
  SELECT CAST(r.range AS BIGINT) AS media_id,
         CASE WHEN r.range % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
         CAST(8 + (r.range % 5) * 4 AS INT) AS width,
         CAST(8 + ((r.range * 7) % 3) * 4 AS INT) AS height,
         CAST(4 + r.range % 4 AS INT) AS n_frames
  FROM range(0, {N_MEDIA}) r
)
"""


# --------------------------------------------------------------------------
# mm_image_features — decode binary → per-image pixel statistics.
# Oracle: closed form of the fake codec over the byte index range.
# --------------------------------------------------------------------------
@query(
    "mm_image_features",
    oracle="WITH " + _SQL_MEDIA + f"""
    SELECT m.media_id, m.width, m.height,
           CAST(m.width * m.height AS BIGINT) AS n_pixels,
           round(avg({_SQL_BYTE}), 6) AS mean_px,
           CAST(min({_SQL_BYTE}) AS DOUBLE) AS min_px,
           CAST(max({_SQL_BYTE}) AS DOUBLE) AS max_px,
           round(stddev_pop({_SQL_BYTE}), 6) AS std_px
    FROM media m JOIN range(0, 4096) i(i) ON i.i < m.width * m.height
    WHERE m.kind = 'image'
    GROUP BY m.media_id, m.width, m.height
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction: mapInPandas decode (np.frombuffer →
    reshape h×w) → per-image stats. The plumbing a real decoder drops
    into unchanged."""
    media = make_media_df(spark).filter(F.col("kind") == "image")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = r.meta["width"], r.meta["height"]
                img = np.frombuffer(r.payload, dtype=np.uint8).reshape(h, w)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "n_pixels": img.size,
                        "mean_px": float(img.mean()),
                        "min_px": float(img.min()),
                        "max_px": float(img.max()),
                        "std_px": float(img.std()),
                    }
                )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        feats,
        schema="media_id bigint, width int, height int, n_pixels bigint, "
        "mean_px double, min_px double, max_px double, std_px double",
    )
    # F.round (half-up) matches the SQL oracle; Python round() is
    # half-to-even and must not be used on the UDF side.
    return raw.withColumn("mean_px", F.round("mean_px", 6)).withColumn(
        "std_px", F.round("std_px", 6)
    )


# --------------------------------------------------------------------------
# mm_resize_mean — nearest-neighbor 2× downsample (stride-2 both axes)
# then mean: the resize plumbing with a closed-form oracle (kept pixels
# are those with even row and even column index).
# --------------------------------------------------------------------------
@query(
    "mm_resize_mean",
    oracle="WITH " + _SQL_MEDIA + f"""
    SELECT m.media_id,
           CAST(ceil(m.height / 2.0) * ceil(m.width / 2.0) AS BIGINT) AS n_resized,
           round(avg({_SQL_BYTE}), 6) AS mean_resized
    FROM media m JOIN range(0, 4096) i(i)
      ON i.i < m.width * m.height
     AND (i.i // m.width) % 2 = 0 AND (i.i % m.width) % 2 = 0
    WHERE m.kind = 'image'
    GROUP BY m.media_id, m.width, m.height
    """,
)
def mm_resize_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = make_media_df(spark).filter(F.col("kind") == "image")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = r.meta["width"], r.meta["height"]
                img = np.frombuffer(r.payload, dtype=np.uint8).reshape(h, w)
                small = img[::2, ::2]  # nearest-neighbor 2x downsample
                rows.append(
                    {
                        "media_id": r.media_id,
                        "n_resized": small.size,
                        "mean_resized": float(small.mean()),
                    }
                )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        feats, schema="media_id bigint, n_resized bigint, mean_resized double"
    )
    return raw.withColumn("mean_resized", F.round("mean_resized", 6))


# --------------------------------------------------------------------------
# mm_frame_sample — video frame sampling: every 2nd frame, per-frame mean.
# The per-frame explode happens inside the Arrow batch (pixels never hit
# a shuffle).
# --------------------------------------------------------------------------
@query(
    "mm_frame_sample",
    oracle="WITH " + _SQL_MEDIA + f"""
    SELECT m.media_id, CAST(f.f AS INT) AS frame_idx,
           round(avg((m.media_id * 31 + f.f * m.width * m.height + p.p)
                     % {FAKE_MOD}), 6) AS frame_mean
    FROM media m
    JOIN range(0, 8) f(f) ON f.f < m.n_frames AND f.f % 2 = 0
    JOIN range(0, 4096) p(p) ON p.p < m.width * m.height
    WHERE m.kind = 'video'
    GROUP BY m.media_id, f.f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = make_media_df(spark).filter(F.col("kind") == "video")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, nf = r.meta["width"], r.meta["height"], r.meta["n_frames"]
                vid = np.frombuffer(r.payload, dtype=np.uint8).reshape(nf, h, w)
                for fi in range(0, nf, 2):  # sample every 2nd frame
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "frame_mean": float(vid[fi].mean()),
                        }
                    )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        frames, schema="media_id bigint, frame_idx int, frame_mean double"
    )
    return raw.withColumn("frame_mean", F.round("frame_mean", 6))


# --------------------------------------------------------------------------
# mm_audio_window_rms — audio modality: opaque PCM payload → framed
# loudness features (RMS per 64-sample frame), the standard front end of
# audio filtering/dedup pipelines. Same deterministic fake codec, bytes
# read as unsigned samples; a real decoder (soundfile/ffmpeg) drops into
# the same mapInPandas slot.
#
# Numeric contract: per-frame sums of integer byte values (and their
# squares) are EXACT in double, and the frame length 64 divides exactly,
# so avg/sqrt are bit-identical across engines — the round(…,6) is
# belt-and-braces, not load-bearing.
# --------------------------------------------------------------------------
N_AUDIO = 24
FRAME_LEN = 64


def make_audio_df(spark: SparkSession, n: int = N_AUDIO) -> DataFrame:
    """Synthetic audio table: 16 kHz mono, n_samples a multiple of the
    frame length (256..448)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                n_samples = 256 + (m % 4) * FRAME_LEN
                rows.append(
                    {
                        "media_id": m,
                        "kind": "audio",
                        "payload": fake_payload(m, n_samples),
                        "meta": {"width": None, "height": None, "channels": 1,
                                 "n_frames": n_samples // FRAME_LEN,
                                 "sample_rate": 16000},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=2).mapInPandas(gen, schema=MEDIA_SCHEMA)


_AUDIO_RMS_ORACLE = f"""
    WITH audio AS (
      SELECT CAST(r.range AS BIGINT) AS media_id,
             CAST(256 + (r.range % 4) * {FRAME_LEN} AS INT) AS n_samples
      FROM range(0, {N_AUDIO}) r
    )
    SELECT a.media_id, i.i // {FRAME_LEN} AS frame_id,
           round(sqrt(avg(CAST(({_SQL_BYTE.replace('m.', 'a.')}) AS DOUBLE)
                          * (({_SQL_BYTE.replace('m.', 'a.')})))) / 125.0, 6) AS rms,
           round(avg(({_SQL_BYTE.replace('m.', 'a.')})) / 125.0, 6) AS mean_amp
    FROM audio a JOIN range(0, 512) i(i) ON i.i < a.n_samples
    GROUP BY a.media_id, i.i // {FRAME_LEN}
    """


def audio_frame_features(spark: SparkSession) -> DataFrame:
    """UNROUNDED framed audio features (rms, mean_amp per 64-sample
    frame) — the shared front end of mm_audio_window_rms (which rounds
    for its declared output) and mm_audio_vad_segments (which must
    threshold the raw value: thresholding a rounded rms while the
    oracle thresholds the unrounded one would flip frames within 5e-7
    of the boundary)."""
    audio = make_audio_df(spark)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s = np.frombuffer(r.payload, dtype=np.uint8).astype(np.float64)
                frames = s.reshape(-1, FRAME_LEN)
                rms = np.sqrt((frames * frames).mean(axis=1)) / 125.0
                mean_amp = frames.mean(axis=1) / 125.0
                for k in range(frames.shape[0]):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_id": k,
                            "rms": float(rms[k]),
                            "mean_amp": float(mean_amp[k]),
                        }
                    )
            yield pd.DataFrame(rows)

    return audio.mapInPandas(
        feats, schema="media_id bigint, frame_id bigint, rms double, mean_amp double"
    )


@query("mm_audio_window_rms", oracle=_AUDIO_RMS_ORACLE)
def mm_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio features: mapInPandas decode (np.frombuffer →
    reshape n_frames×64) → per-frame RMS/mean. The per-frame explode
    happens INSIDE the Arrow batch — the shuffle-facing output is
    features, never samples."""
    raw = audio_frame_features(spark)
    return raw.withColumn("rms", F.round("rms", 6)).withColumn(
        "mean_amp", F.round("mean_amp", 6)
    )


# --------------------------------------------------------------------------
# mm_binary_ingest — raw-binary media ingestion via Spark's binaryFile
# source: each file becomes one row (path, length, content BINARY) — the
# entry point for real image/audio/video corpora, where payloads arrive
# as opaque files and all downstream ops (decode, feature-extract, dedup
# by content hash) run over the binary column. Here it reads the fixture
# parquet files themselves as opaque blobs (the container ships no media
# files); the oracle is DuckDB's read_blob over the same glob.
#
# NOTE the oracle embeds the driver's correctness scale factor
# (sf0.01) literally — oracle SQL is static while the Spark side takes
# sf_dir; the pytest twin re-checks at the test SF including content
# md5 (DuckDB 1.0 cannot md5 a BLOB, so the declared oracle pins
# name+size only).
#
# Scale notes (100 TB): binaryFile is a standard FileFormat — files
# split across executors, content never passes the driver;
# pathGlobFilter prunes at listing time. For many small media files,
# pack into parquet-of-binary (make_media_df's shape) and read that —
# this query pins the raw-file entry path.
# --------------------------------------------------------------------------
#: the dir the declared oracle's read_blob is pinned to — the ONE
#: definition; mirrors retarget oracles by substituting THIS constant
#: (tools/sf1_mirror.py) instead of guessing the literal.
BLOB_ORACLE_DIR = "/root/testdata/sf0.01"


@query(
    "mm_binary_ingest",
    oracle=f"""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           size AS n_bytes
    FROM read_blob('{BLOB_ORACLE_DIR}/*.parquet')
    """,
)
def mm_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return files.select(
        F.regexp_extract(F.col("path"), "[^/]+$", 0).alias("file_name"),
        F.col("length").alias("n_bytes"),
    )


# --------------------------------------------------------------------------
# mm_scene_cuts — video scene-cut detection: mean absolute pixel
# difference between consecutive frames; a boundary where the diff
# exceeds the threshold. The standard first pass of video curation
# (segment, then sample/caption per scene). Same opaque-binary +
# Arrow-batch shape as the other mm ops — a real decoder drops into the
# same mapInPandas slot; frame pairs never leave the Python batch, only
# (media_id, frame_idx, mean_diff, is_cut) rows shuffle.
# --------------------------------------------------------------------------
SCENE_CUT_THRESHOLD = 83.0  #: ~FAKE_MOD/3 — splits the fake diffs


@query(
    "mm_scene_cuts",
    oracle="WITH " + _SQL_MEDIA + f"""
    SELECT m.media_id, CAST(f.f AS INT) AS frame_idx,
           round(avg(abs(
             (m.media_id * 31 + f.f * m.width * m.height + p.p) % {FAKE_MOD}
             - (m.media_id * 31 + (f.f - 1) * m.width * m.height + p.p) % {FAKE_MOD}
           )), 6) AS mean_diff,
           avg(abs(
             (m.media_id * 31 + f.f * m.width * m.height + p.p) % {FAKE_MOD}
             - (m.media_id * 31 + (f.f - 1) * m.width * m.height + p.p) % {FAKE_MOD}
           )) > {SCENE_CUT_THRESHOLD} AS is_cut
    FROM media m
    JOIN range(1, 8) f(f) ON f.f < m.n_frames
    JOIN range(0, 4096) p(p) ON p.p < m.width * m.height
    WHERE m.kind = 'video'
    GROUP BY m.media_id, f.f
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = make_media_df(spark).filter(F.col("kind") == "video")

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, nf = r.meta["width"], r.meta["height"], r.meta["n_frames"]
                vid = (
                    np.frombuffer(r.payload, dtype=np.uint8)
                    .reshape(nf, h, w)
                    .astype(np.int32)  # uint8 subtraction would wrap
                )
                for fi in range(1, nf):
                    d = float(np.abs(vid[fi] - vid[fi - 1]).mean())
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "mean_diff": d,
                            "is_cut": d > SCENE_CUT_THRESHOLD,
                        }
                    )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        cuts, schema="media_id bigint, frame_idx int, mean_diff double, is_cut boolean"
    )
    return raw.withColumn("mean_diff", F.round("mean_diff", 6))


# --------------------------------------------------------------------------
# mm_audio_vad_segments — voice-activity-style segmentation: frames with
# RMS above the threshold group into maximal consecutive runs
# (gaps-and-islands over frame_id), the front end of audio curation
# (keep speech, drop silence/noise spans). Decode happens once in the
# Arrow batch (the mm_audio_window_rms front end); the segmentation
# itself is RELATIONAL — window functions over the tiny per-frame
# feature rows, fully JVM-side.
# --------------------------------------------------------------------------
VAD_RMS_THRESHOLD = 1.1


@query(
    "mm_audio_vad_segments",
    oracle=f"""
    WITH audio AS (
      SELECT CAST(r.range AS BIGINT) AS media_id,
             CAST(256 + (r.range % 4) * {FRAME_LEN} AS INT) AS n_samples
      FROM range(0, {N_AUDIO}) r
    ),
    rms AS (
      SELECT a.media_id, i.i // {FRAME_LEN} AS frame_id,
             sqrt(avg(CAST(({_SQL_BYTE.replace('m.', 'a.')}) AS DOUBLE)
                      * (({_SQL_BYTE.replace('m.', 'a.')})))) / 125.0 AS rms
      FROM audio a JOIN range(0, 512) i(i) ON i.i < a.n_samples
      GROUP BY a.media_id, i.i // {FRAME_LEN}
    ),
    active AS (
      SELECT media_id, frame_id,
             frame_id - row_number() OVER (PARTITION BY media_id
                                           ORDER BY frame_id) AS grp
      FROM rms WHERE rms > {VAD_RMS_THRESHOLD}
    ),
    segs AS (
      SELECT media_id, count(*) AS seg_len FROM active
      GROUP BY media_id, grp
    )
    SELECT media_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(seg_len) AS BIGINT) AS active_frames,
           CAST(max(seg_len) AS BIGINT) AS longest_run
    FROM segs GROUP BY media_id
    """,
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # UNROUNDED front end: the threshold must see the same quantity the
    # oracle thresholds, or frames within 5e-7 of the boundary flip
    rms = audio_frame_features(spark)
    w = Window.partitionBy("media_id").orderBy("frame_id")
    active = rms.filter(F.col("rms") > VAD_RMS_THRESHOLD).withColumn(
        "grp", F.col("frame_id") - F.row_number().over(w)
    )
    segs = active.groupBy("media_id", "grp").agg(F.count(F.lit(1)).alias("seg_len"))
    return segs.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_len").cast("bigint").alias("active_frames"),
        F.max("seg_len").cast("bigint").alias("longest_run"),
    )


# --------------------------------------------------------------------------
# mm_image_ahash_dedup — perceptual near-duplicate detection by
# average-hash: sample a fixed 8×8 grid of pixels, set bit (i, j) when
# the sample exceeds the sample mean, bucket images by the 64-bit hash
# (emitted as two 32-bit halves — portable across engines without
# unsigned-64 headaches). aHash is shift-invariant in brightness
# (a constant offset moves every sample AND the mean), which is exactly
# why re-encoded/re-exposed copies of an image collide — the standard
# cheap image-dedup pass before embedding-based near-dup.
#
# Scale shape: one narrow Arrow-batched pass computes hashes; the
# bucket join is an equi-shuffle on the (hi, lo) pair — identical to
# exact text dedup's fingerprint shuffle. No pairwise comparison.
# --------------------------------------------------------------------------
def _ahash_oracle() -> str:
    return "WITH " + _SQL_MEDIA + f"""
    , samples AS (
      SELECT m.media_id, i.i AS si, j.j AS sj,
             (m.media_id * 31
              + ((i.i * m.height) // 8) * m.width
              + ((j.j * m.width) // 8)) % {FAKE_MOD} AS v
      FROM media m, range(0, 8) i(i), range(0, 8) j(j)
      WHERE m.kind = 'image'
    ),
    mu AS (SELECT media_id, avg(v) AS mu FROM samples GROUP BY media_id),
    bits AS (
      SELECT s.media_id,
             CAST(s.si * 8 + s.sj AS INT) AS bit,
             CASE WHEN s.v > mu.mu THEN 1 ELSE 0 END AS b
      FROM samples s JOIN mu USING (media_id)
    ),
    hashes AS (
      SELECT media_id,
             CAST(sum(CASE WHEN bit < 32 THEN b * power(2, bit) ELSE 0 END)
                  AS BIGINT) AS ahash_lo,
             CAST(sum(CASE WHEN bit >= 32 THEN b * power(2, bit - 32) ELSE 0 END)
                  AS BIGINT) AS ahash_hi
      FROM bits GROUP BY media_id
    )
    SELECT media_id, ahash_hi, ahash_lo,
           CAST(count(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS BIGINT)
             AS bucket_size
    FROM hashes
    """


@query("mm_image_ahash_dedup", oracle=_ahash_oracle())
def mm_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    media = make_media_df(spark).filter(F.col("kind") == "image")

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h = r.meta["width"], r.meta["height"]
                img = np.frombuffer(r.payload, dtype=np.uint8).reshape(h, w)
                ri = (np.arange(8) * h) // 8
                ci = (np.arange(8) * w) // 8
                samples = img[np.ix_(ri, ci)].astype(np.float64)
                bits = (samples > samples.mean()).astype(np.int64).ravel()
                lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
                hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
                rows.append({"media_id": r.media_id, "ahash_hi": hi, "ahash_lo": lo})
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        hashes, schema="media_id bigint, ahash_hi bigint, ahash_lo bigint"
    )
    return raw.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(W.partitionBy("ahash_hi", "ahash_lo")).cast("bigint"),
    )


# --------------------------------------------------------------------------
# mm_keyframe_dedup — video-level near-dup audit by KEYFRAME hashes: the
# composition video curation actually runs — scene-cut segmentation
# picks keyframes (frame 0 + every cut), each keyframe gets an aHash,
# and videos are compared by hash overlap. Re-encoded/trimmed copies of
# a video share keyframe hashes without any frame-exact alignment —
# the standard cheap video-dedup pass before embedding similarity.
#
# Scale shape: ONE Arrow-batched pass per video emits (media_id,
# frame_idx, hash) rows — decode never leaves the Python batch; the
# cross-video comparison is an equi-self-join on the 64-bit hash pair
# (exact-dedup's fingerprint shuffle, no pairwise frame comparison).
# --------------------------------------------------------------------------
@query(
    "mm_keyframe_dedup",
    oracle="WITH " + _SQL_MEDIA + f"""
    , diffs AS (
      SELECT m.media_id, m.width, m.height, CAST(f.f AS INT) AS f,
             avg(abs(
               (m.media_id * 31 + f.f * m.width * m.height + p.p) % {FAKE_MOD}
               - (m.media_id * 31 + (f.f - 1) * m.width * m.height + p.p)
                 % {FAKE_MOD})) AS d
      FROM media m
      JOIN range(1, 8) f(f) ON f.f < m.n_frames
      JOIN range(0, 4096) p(p) ON p.p < m.width * m.height
      WHERE m.kind = 'video'
      GROUP BY m.media_id, m.width, m.height, f.f
    ),
    kf AS (
      SELECT media_id, width, height, 0 AS f
      FROM media WHERE kind = 'video'
      UNION ALL
      SELECT media_id, width, height, f FROM diffs
      WHERE d > {SCENE_CUT_THRESHOLD}
    ),
    samples AS (
      SELECT k.media_id, k.f, i.i * 8 + j.j AS bit,
             (k.media_id * 31 + k.f * k.width * k.height
              + ((i.i * k.height) // 8) * k.width
              + ((j.j * k.width) // 8)) % {FAKE_MOD} AS v
      FROM kf k, range(0, 8) i(i), range(0, 8) j(j)
    ),
    mu AS (SELECT media_id, f, avg(v) AS mu FROM samples GROUP BY media_id, f),
    hashes AS (
      SELECT s.media_id, s.f,
             CAST(sum(CASE WHEN s.bit < 32 AND s.v > mu.mu
                           THEN power(2, s.bit) ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN s.bit >= 32 AND s.v > mu.mu
                           THEN power(2, s.bit - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM samples s JOIN mu USING (media_id, f)
      GROUP BY s.media_id, s.f
    ),
    matches AS (
      SELECT DISTINCT a.media_id, b.media_id AS other_id
      FROM hashes a JOIN hashes b
        ON a.hi = b.hi AND a.lo = b.lo AND a.media_id <> b.media_id
    )
    SELECT h.media_id,
           CAST(count(*) AS BIGINT) AS n_keyframes,
           CAST(count(DISTINCT (h.hi, h.lo)) AS BIGINT) AS n_distinct_hashes,
           CAST((SELECT count(*) FROM matches mm
                 WHERE mm.media_id = h.media_id) AS BIGINT) AS n_matched_videos
    FROM hashes h
    GROUP BY h.media_id
    """,
)
def mm_keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = make_media_df(spark).filter(F.col("kind") == "video")

    def keyframe_hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                w, h, nf = r.meta["width"], r.meta["height"], r.meta["n_frames"]
                vid = (
                    np.frombuffer(r.payload, dtype=np.uint8)
                    .reshape(nf, h, w)
                    .astype(np.int32)
                )
                frames = [0] + [
                    fi
                    for fi in range(1, nf)
                    if float(np.abs(vid[fi] - vid[fi - 1]).mean())
                    > SCENE_CUT_THRESHOLD
                ]
                ri = (np.arange(8) * h) // 8
                ci = (np.arange(8) * w) // 8
                for fi in frames:
                    s = vid[fi][np.ix_(ri, ci)].astype(np.float64)
                    bits = (s > s.mean()).astype(np.int64).ravel()
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": fi,
                            "lo": int((bits[:32] << np.arange(32, dtype=np.int64)).sum()),
                            "hi": int((bits[32:] << np.arange(32, dtype=np.int64)).sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    kf = media.mapInPandas(
        keyframe_hashes,
        schema="media_id bigint, frame_idx int, lo bigint, hi bigint",
    )
    # kf feeds three branches (both self-join sides + the per-video
    # agg): checkpoint so the decode+hash pass — the dominant cost —
    # executes exactly once, honoring the one-Arrow-pass claim above
    kf = kf.localCheckpoint(eager=True)
    a = kf.select("media_id", "hi", "lo")
    b = kf.select(F.col("media_id").alias("other_id"), "hi", "lo")
    matches = (
        a.join(b, ["hi", "lo"])
        .filter(F.col("media_id") != F.col("other_id"))
        .select("media_id", "other_id")
        .distinct()
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matched_videos"))
    )
    return (
        kf.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keyframes"),
            F.countDistinct("hi", "lo").cast("bigint").alias("n_distinct_hashes"),
        )
        .join(matches, "media_id", "left")
        .select(
            "media_id",
            "n_keyframes",
            "n_distinct_hashes",
            F.coalesce("n_matched_videos", F.lit(0)).cast("bigint").alias(
                "n_matched_videos"
            ),
        )
    )


# --------------------------------------------------------------------------
# mm_caption_filter — image-text PAIR curation: the CLIP-score gate a
# VLM data pipeline runs over (image, caption) pairs, composed with a
# min-resolution gate from the media metadata, reported as per-source
# yield. Pairing is by key (caption doc_id = media_id; image vector =
# embeddings[media_id], caption vector = embeddings[media_id +
# CAPTION_VEC_OFFSET]) — the row-aligned shape of a real pair table.
#
# Scale notes (100 TB): every join is a broadcast/equi join on the pair
# key (media ⋈ captions ⋈ embeddings ×2) — never pairwise across the
# corpus; the cosine is a JVM-side zip_with dot product; the yield
# report is one partial-agg shuffle on source. The keep decision
# compares the ROUNDED score (round-then-compare: both engines round
# the same double, so the gate frontier is deterministic — the
# dedup_embedding_cosine discipline).
# --------------------------------------------------------------------------
CAPTION_VEC_OFFSET = 100
CLIP_MIN_SCORE = 0.0  #: keep pairs with rounded cosine >= this
MIN_IMAGE_AREA = 128  #: and image width*height >= this


@query(
    "mm_caption_filter",
    oracle="WITH " + _SQL_MEDIA + f"""
    , pairs AS (
      SELECT m.media_id, d.source,
             m.width * m.height AS area,
             round(list_cosine_similarity(iv.embedding::DOUBLE[],
                                          cv.embedding::DOUBLE[]), 6) + 0
               AS clip_score
      FROM media m
      JOIN documents d ON d.doc_id = m.media_id
      JOIN embeddings iv ON iv.vec_id = m.media_id
      JOIN embeddings cv ON cv.vec_id = m.media_id + {CAPTION_VEC_OFFSET}
      WHERE m.kind = 'image'
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN clip_score >= {CLIP_MIN_SCORE}
                          AND area >= {MIN_IMAGE_AREA}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN clip_score >= {CLIP_MIN_SCORE}
                           AND area >= {MIN_IMAGE_AREA}
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
             AS kept_yield,
           round(avg(clip_score), 6) AS avg_clip
    FROM pairs GROUP BY source
    """,
)
def mm_caption_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style cross-modal curation: cosine-gate (image, caption)
    pairs over stored embeddings + a metadata resolution gate, then the
    per-source yield report a curation run is judged by."""
    from deisa_ray_spark.functions.dedup import cosine_sim
    from deisa_ray_spark.sources.registry import load_table

    media = make_media_df(spark).filter(F.col("kind") == "image")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    iv = emb.select(F.col("vec_id").alias("media_id"), F.col("e").alias("ie"))
    cv = emb.select(
        (F.col("vec_id") - CAPTION_VEC_OFFSET).alias("media_id"),
        F.col("e").alias("ce"),
    )
    pairs = (
        F.broadcast(
            media.select(
                "media_id",
                (F.col("meta.width") * F.col("meta.height")).alias("area"),
            )
        )
        .join(docs, docs.doc_id == F.col("media_id"))
        .join(iv, "media_id")
        .join(cv, "media_id")
        .select(
            "media_id",
            "source",
            "area",
            F.round(cosine_sim(F.col("ie"), F.col("ce")), 6).alias(
                "clip_score"
            ),
        )
    )
    keep = (F.col("clip_score") >= CLIP_MIN_SCORE) & (
        F.col("area") >= MIN_IMAGE_AREA
    )
    return pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
        F.round(F.sum(keep.cast("int")) / F.count(F.lit(1)), 6).alias(
            "kept_yield"
        ),
        F.round(F.avg("clip_score"), 6).alias("avg_clip"),
    )


# --------------------------------------------------------------------------
# mm_image_png_decode — REAL byte-level image decode as a declared,
# oracle-checked query: payloads are genuine PNG files (encoded inside
# the generator UDF with formats/pngmini — signature, IHDR, zlib IDAT,
# CRCs), each image carrying scanline filter type media_id % 5 so all
# five unfilter paths run inside the declared query, and the feature
# stage decodes them through decode_image_real (the PIL-or-pngmini
# gate), NOT by reinterpreting raw payload bytes. The pixel VALUES are
# still the deterministic fake-codec sequence, which is what makes a
# closed-form DuckDB oracle possible for stats computed from real
# decoded bytes. Plumbing is the mm_image_features shape: opaque binary
# until the Arrow mapInPandas batch, narrow, no shuffle before the
# per-image reduction.
# --------------------------------------------------------------------------
@query(
    "mm_image_png_decode",
    oracle="WITH " + _SQL_MEDIA + f"""
    SELECT m.media_id, CAST(m.media_id % 5 AS INT) AS filter_type,
           m.width, m.height,
           CAST(m.width * m.height AS BIGINT) AS n_pixels,
           round(avg({_SQL_BYTE}), 6) AS mean_px,
           CAST(min({_SQL_BYTE}) AS DOUBLE) AS min_px,
           CAST(max({_SQL_BYTE}) AS DOUBLE) AS max_px,
           round(stddev_pop({_SQL_BYTE}), 6) AS std_px
    FROM media m JOIN range(0, 4096) i(i) ON i.i < m.width * m.height
    WHERE m.kind = 'image'
    GROUP BY m.media_id, m.width, m.height
    """,
)
def mm_image_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → ship as binary → REAL PNG decode → per-image stats."""
    from deisa_ray_spark.formats.pngmini import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                if m % 2 != 0:
                    continue  # images only (even ids, as in make_media_df)
                w, h, _nf = _dims(m)
                px = np.frombuffer(fake_payload(m, w * h), dtype=np.uint8)
                rows.append(
                    {
                        "media_id": m,
                        "filter_type": m % 5,
                        "payload": encode_png(
                            px.reshape(h, w), filter_type=m % 5
                        ),
                        "meta": {"width": w, "height": h, "channels": 1,
                                 "n_frames": None, "sample_rate": None},
                    }
                )
            yield pd.DataFrame(rows)

    media = spark.range(0, N_MEDIA, numPartitions=2).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("filter_type", T.IntegerType(), False),
                T.StructField("payload", T.BinaryType(), False),
                T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, False),
            ]
        ),
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image_real(bytes(r.payload))
                assert img.shape == (r.meta["height"], r.meta["width"])
                rows.append(
                    {
                        "media_id": r.media_id,
                        "filter_type": r.filter_type,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "n_pixels": img.size,
                        "mean_px": float(img.mean()),
                        "min_px": float(img.min()),
                        "max_px": float(img.max()),
                        "std_px": float(img.std()),
                    }
                )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        feats,
        schema="media_id bigint, filter_type int, width int, height int, "
        "n_pixels bigint, mean_px double, min_px double, max_px double, "
        "std_px double",
    )
    return raw.withColumn("mean_px", F.round("mean_px", 6)).withColumn(
        "std_px", F.round("std_px", 6)
    )


# --------------------------------------------------------------------------
# mm_image_jpeg_decode — REAL baseline-JPEG decode as a declared,
# oracle-checked query (r12, closing the multimodal family's last
# format gate): payloads are genuine JPEG byte streams (SOI/DQT/SOF0/
# DHT/SOS/EOI, entropy-coded with the spec's Annex-K Huffman tables and
# byte stuffing, built by formats/jpegmini.encode_jpeg_gray), and the
# feature stage decodes them through decode_image_real (the
# PIL-or-jpegmini gate). JPEG is lossy, so a closed-form oracle needs
# the DECODED values, not the inputs: the fixture quantizes with a
# table of ones and derives each image's DCT coefficient block from a
# formula, making the decoded pixels exactly
# ``clamp(floor(IDCT(c) + 128.5), 0, 255)`` — an expression DuckDB can
# evaluate per pixel (the IDCT double sum over ``range(8) u, range(8)
# v`` with the same half-away rounding the decoder uses). Every stage
# of the real decode path runs inside the declared query: Huffman +
# unstuffing, DC prediction across blocks is exercised by the
# mm_jpeg fixture tests; here each image is one 8x8 block so the SQL
# stays one join deep.
# --------------------------------------------------------------------------
N_JPEG = 16
#: coefficient formula shared by the fixture and the oracle
_JPEG_COEF = "(((m.m * 7 + u.u * 3 + v.v * 5) % 13) - 6)"


@query(
    "mm_image_jpeg_decode",
    oracle=f"""
    WITH px AS (
      SELECT m.m AS media_id, x.x AS x, y.y AS y,
             GREATEST(0, LEAST(255, FLOOR(SUM(
               (CASE WHEN u.u = 0 THEN 1.0 / sqrt(2.0) ELSE 1.0 END)
               * (CASE WHEN v.v = 0 THEN 1.0 / sqrt(2.0) ELSE 1.0 END)
               * {_JPEG_COEF}
               * cos((2 * x.x + 1) * u.u * pi() / 16)
               * cos((2 * y.y + 1) * v.v * pi() / 16)
             ) / 4.0 + 128.5))) AS p
      FROM range(0, {N_JPEG}) m(m), range(0, 8) x(x), range(0, 8) y(y),
           range(0, 8) u(u), range(0, 8) v(v)
      GROUP BY m.m, x.x, y.y
    )
    SELECT media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST(64 AS BIGINT) AS n_pixels,
           round(avg(p), 6) AS mean_px,
           CAST(min(p) AS DOUBLE) AS min_px,
           CAST(max(p) AS DOUBLE) AS max_px,
           round(stddev_pop(p), 6) AS std_px
    FROM px GROUP BY media_id
    """,
)
def mm_image_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → ship as binary → REAL baseline-JPEG decode → stats."""
    from deisa_ray_spark.formats.jpegmini import encode_jpeg_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["id"]:
                m = int(m)
                co = np.array(
                    [
                        [((m * 7 + u * 3 + v * 5) % 13) - 6 for v in range(8)]
                        for u in range(8)
                    ],
                    dtype=np.int32,
                )[None, :, :]
                rows.append(
                    {
                        "media_id": m,
                        "payload": encode_jpeg_gray(co, width=8, height=8),
                        "meta": {"width": 8, "height": 8, "channels": 1,
                                 "n_frames": None, "sample_rate": None},
                    }
                )
            yield pd.DataFrame(rows)

    media = spark.range(0, N_JPEG, numPartitions=2).mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
                T.StructField("meta", MEDIA_SCHEMA["meta"].dataType, False),
            ]
        ),
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image_real(bytes(r.payload), fmt="JPEG")
                assert img.shape == (r.meta["height"], r.meta["width"])
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "n_pixels": img.size,
                        "mean_px": float(img.mean()),
                        "min_px": float(img.min()),
                        "max_px": float(img.max()),
                        "std_px": float(img.std()),
                    }
                )
            yield pd.DataFrame(rows)

    raw = media.mapInPandas(
        feats,
        schema="media_id bigint, width int, height int, n_pixels bigint, "
        "mean_px double, min_px double, max_px double, std_px double",
    )
    return raw.withColumn("mean_px", F.round("mean_px", 6)).withColumn(
        "std_px", F.round("std_px", 6)
    )
