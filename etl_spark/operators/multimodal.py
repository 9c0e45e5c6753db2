"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media items are opaque ``binary`` columns plus a typed metadata struct — the
same pattern the reference uses for geometry (WKB bytes shuttled across the
process boundary, SURVEY §1.2; core/points_to_ls_poly.py:35-40): bytes stay
opaque to the engine, structure lives in typed side columns.

The *decode* step (PIL/librosa/ffmpeg) is STUBBED — those libraries are not in
this container — behind ``_decode_image_real`` which raises
``NotImplementedError``. Everything Spark-side is real and tested: the schema,
the ``mapInPandas`` batch shape (Arrow record batches in/out), partition-count
preservation, and the deterministic fake decode used by tests.

At scale: media bytes dominate row size, so ``maxPartitionBytes`` governs
batch memory; feature extraction is embarrassingly parallel with zero shuffle
(mapInPandas preserves partitioning).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("byte_len", T.IntegerType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # per-row error isolation (reference U5: per-future try/except,
        # duckdb_construct_trajs_stops.py:191-206): a corrupt item yields a
        # null feature + error string instead of failing the batch/job.
        T.StructField("error", T.StringType(), True),
    ]
)


def _md5_mod(tag: str, seed: int, n: int):
    """Deterministic uniform int in [0, n) from md5 — md5 (not xxhash64) so a
    SQL oracle regenerates the same table bit-for-bit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{tag}|{seed}|"), F.col("id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n))


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table — JVM-generated binary payloads.

    Bytes = repeated md5(id) hex digits UTF-8-encoded, so payload sizes vary
    and content is reproducible with no Python in the generation path;
    modality and length derive from md5 too, so a DuckDB oracle can rebuild
    the table — including its sha256 — exactly (DuckDB's sha256 takes VARCHAR
    only, so the fake payload stays ASCII; the column is still ``binary`` and
    the downstream plumbing treats it as opaque bytes).
    """
    mods = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = (
        spark.range(n)
        .withColumn("media_id", F.col("id"))
        .withColumn(
            "modality",
            F.element_at(mods, (_md5_mod("mod", seed, 3) + 1).cast("int")),
        )
        .withColumn(
            "media",
            F.encode(
                F.repeat(
                    F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"))),
                    (_md5_mod("len", seed, 16) + 1).cast("int"),
                ),
                "UTF-8",
            ),
        )
        .withColumn(
            "meta",
            F.struct(
                F.concat(F.lit("x-fake/"), F.col("modality")).alias("mime"),
                (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(1920)) + 1).cast("int").alias("width"),
                (F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(1080)) + 1).cast("int").alias("height"),
                (F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
            ),
        )
        .select("media_id", "modality", "media", "meta")
    )
    return df


def _decode_image_real(data: bytes) -> "object":
    """Real image decode — requires PIL, not shipped in this container."""
    raise NotImplementedError(
        "image decode requires PIL/pillow; install on a real cluster and "
        "swap this stub (plumbing in extract_media_features is decode-agnostic)"
    )


def _fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature vector: bytes of sha256 scaled to [0,1).

    Stands in for an embedding model / mel spectrogram / frame histogram; the
    Spark-side contract (binary in, fixed-dim float array out, Arrow-batched)
    is identical to the real thing.
    """
    h = hashlib.sha256(data or b"").digest()
    return [b / 256.0 for b in h[:dim]]


def extract_media_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Batch feature extraction over media bytes via ``mapInPandas``.

    Zero-shuffle: runs on existing partitions; each Arrow batch becomes one
    pandas frame. Real deployments replace ``_fake_feature`` with the decode
    stack (see ``_decode_image_real``) without touching the plumbing.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]

            def safe_feature(b):
                try:
                    return (_fake_feature(b, feature_dim), None)
                except Exception as exc:  # noqa: BLE001 — isolate per row
                    return (None, f"{type(exc).__name__}: {exc}")

            feats = media.map(safe_feature)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_len": media.map(lambda b: len(b) if b is not None else 0).astype(
                        "int32"
                    ),
                    "content_sha256": media.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": feats.map(lambda t: t[0]),
                    "error": feats.map(lambda t: t[1]),
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing over media bytes via ``mapInPandas`` — schema, batch
    shape, meta rewrite, and per-row error isolation are real; the pixel
    work itself is the stubbed decode (``_decode_image_real``), replaced by
    a deterministic fake so the pipeline is testable in this container.

    Zero shuffle (partition-preserving); output rows keep (media_id,
    modality), carry the transformed bytes, and meta.width/height reflect
    the target — exactly the contract a PIL/ffmpeg-backed implementation
    drops into.
    """
    # same contract as the input media table + per-row error isolation
    out_schema = T.StructType(
        [*MEDIA_SCHEMA.fields, T.StructField("error", T.StringType(), True)]
    )

    def _fake_resize(b: bytes | None) -> bytes:
        # deterministic stand-in: content-derived bytes sized w*h/64 so the
        # output scales with the target like a real thumbnail would
        h = hashlib.sha256(b or b"").digest()
        n = max(1, (width * height) // 64)
        return (h * (n // len(h) + 1))[:n]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def safe(b):
                try:
                    return (_fake_resize(b), None)
                except Exception as exc:  # noqa: BLE001 — isolate per row
                    return (None, f"{type(exc).__name__}: {exc}")

            res = pdf["media"].map(safe)
            meta = pdf["meta"].map(
                lambda mv: {
                    "mime": (mv or {}).get("mime"),
                    "width": width,
                    "height": height,
                    "duration_ms": (mv or {}).get("duration_ms"),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "media": res.map(lambda t: t[0]),
                    "meta": meta,
                    "error": res.map(lambda t: t[1]),
                }
            )

    return df.mapInPandas(fn, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp.

    The frame *extraction* itself is part of the stubbed decode; the plan-side
    explode (row-per-frame with its timestamp, partition-preserving until the
    explode) is the real, tested piece.
    """
    frames = F.sequence(
        F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    return (
        df.where(F.col("modality") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
