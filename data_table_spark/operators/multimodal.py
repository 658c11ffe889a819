"""Multimodal column plumbing (SURVEY §2.2 north-star extension).

Convention: media travels as an opaque BINARY column plus a typed
metadata struct (modality, mime, width/height/duration…). Decoding and
feature extraction run as Arrow-batched pandas iterators (mapInPandas) so
the JVM⇄Python boundary is crossed per-BATCH, never per-row.

The container has no image/audio codecs, so ``decode`` is STUBBED: with
``fake=True`` it produces a deterministic fake decode (byte-stat
features) exercising the full Spark plumbing — schema, partitioning,
Arrow batch shape; with ``fake=False`` it raises NotImplementedError
exactly where a real codec (PIL/libav) would plug in. Byte-level
features (size, hashes, entropy-proxy) are real and expression-only.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

#: metadata struct carried next to every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),   # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque media blob
    with metadata — the fixture tables carry no real media, so this is
    the standing demo input for the media pipeline."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def media_byte_stats(spark, sf_dir):
    """Expression-only byte features over the binary column: size and
    SHA-256 — real (no stub), oracle-checkable."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length(F.col("media")).cast("long").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha256"),
    )


def decode_media(
    df: DataFrame,
    fake: bool = True,
    feat_dim: int = 4,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    fake=True: deterministic stand-in features = [n_bytes, first_byte,
    last_byte, byte_sum mod 997] — exercises identical plumbing to a real
    decoder. fake=False: NotImplementedError at the exact plug-in point.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires an image/audio codec "
                    "(PIL / torchaudio / pyav) not present in this "
                    "environment; plug it in here"
                )
            media = pdf["media"]
            n = media.map(len)
            first = media.map(lambda b: float(b[0]) if len(b) else 0.0)
            last = media.map(lambda b: float(b[-1]) if len(b) else 0.0)
            csum = media.map(lambda b: float(sum(b) % 997))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "feat": [
                        [float(a), b, c, d]
                        for a, b, c, d in zip(n, first, last, csum)
                    ],
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


def media_decode_features(spark, sf_dir):
    """Demo query: fake-decode the media blobs and expose scalar features
    (rows-only check; the pandas path has no SQL oracle)."""
    m = documents_as_media(spark, sf_dir)
    dec = decode_media(m, fake=True)
    return dec.select(
        "doc_id", "n_bytes",
        F.round(F.element_at("feat", 4), 1).alias("byte_sum_mod"),
    )


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_byte_stats": media_byte_stats,
    "media_decode_features": media_decode_features,
}

MULTIMODAL_ORACLE: dict[str, str] = {
    "media_byte_stats":
        # DuckDB sha256 takes VARCHAR and hashes its UTF-8 bytes — same
        # bytes Spark's sha2(encode(text,'UTF-8'), 256) hashes
        "SELECT doc_id, octet_length(encode(text))::BIGINT n_bytes, "
        "sha256(text) sha256 FROM documents",
    # media_decode_features: pandas-UDF path — rows-only; the fake decode
    # is pinned by tests/test_sources_sinks.py golden assertions instead.
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Ingest a directory of media files as (media_path, media, meta)
    via Spark's built-in ``binaryFile`` source — the canonical blob
    ingest path: distributed file listing, per-file content as one
    BINARY cell, pushdown-able path/mtime/length filters. Feeds the same
    decode/feature pipeline as documents_as_media.

    At 100 TB: binaryFile caps per-task bytes via
    spark.sql.files.maxPartitionBytes; millions-of-tiny-files corpora
    should be compacted into parquet with a binary column first (one
    pass through THIS reader, written with write_partitioned)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.col("path").alias("media_path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("media"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("raster", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Resize via mapInPandas — same Arrow-batch plumbing a real
    PIL/torchvision resize would use (binary in → fixed-size binary out).

    fake=True emits a deterministic width×height pseudo-raster (the
    media bytes cycled/truncated to exactly w·h bytes) so shape, schema
    and batch behavior are pinned by tests; fake=False raises at the
    codec plug-in point."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        size = width * height
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real resize requires an image codec (PIL/torchvision) "
                    "not present in this environment; plug it in here"
                )
            rasters = [
                bytes((b * ((size // max(len(b), 1)) + 1))[:size])
                for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "raster": rasters,
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, duration_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame-sampling: one media row in → n_frames rows out (the 1→N
    generator shape of a video pipeline), via mapInPandas so the fan-out
    happens inside the Arrow batch, never per-row.

    fake=True slices the blob into n_frames contiguous segments with
    evenly spaced fake timestamps; fake=False raises at the demuxer
    plug-in point (pyav). Frames inherit the row's partition — no
    shuffle; at 100 TB follow with write_partitioned, not a groupBy."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires a demuxer (pyav/ffmpeg) "
                    "not present in this environment; plug it in here"
                )
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                step = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * duration_ms // n_frames)
                    out["frame"].append(bytes(blob[i * step:(i + 1) * step]))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)
