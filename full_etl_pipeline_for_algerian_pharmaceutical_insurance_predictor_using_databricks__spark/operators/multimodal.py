"""Multimodal-column plumbing (north-star extension): image/audio/video
as opaque `binary` columns + typed metadata, processed by Arrow-batched
pandas functions via `mapInPandas`.

The container has no image/audio codecs, so the decode kernel is a
deterministic fake (clearly marked; same signature as a real one — swap
`_decode_image_batch`'s body for PIL/libvips and everything else
stands). What IS real and tested: the binary column handling, the
mapInPandas batch shape (iterator of pandas DataFrames), the output
schema contract, and partition-parallel execution.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, not partition size.
Binary payloads stay off the driver; decode runs where the bytes live.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..sources import load_table

#: Output contract of the image-metadata extractor.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this environment


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a deterministic binary 'image' payload to each document
    (md5-derived bytes) — stands in for a real `binary` media column
    read from parquet/lakehouse."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_binary(F.md5(F.col("text")), F.lit("hex")).alias("image_bytes"),
    )


def _decode_image_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """FAKE decode kernel (deterministic). A real implementation would be

        from PIL import Image; img = Image.open(io.BytesIO(b))

    and is intentionally not emulated further."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug a real codec here")
    b = batch["image_bytes"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": b.str.len().astype("int32"),
            "width": (b.str[0].astype("int32") % 64) + 1,
            "height": (b.str[1].astype("int32") % 64) + 1,
            "format": b.str[2].astype("int32").map(lambda x: ["png", "jpeg", "webp"][x % 3]),
        }
    )


def image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary column → typed metadata via mapInPandas (Arrow batches)."""
    media = synthetic_media(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_image_batch(batch)

    return media.mapInPandas(run, IMAGE_META_SCHEMA)


def frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 4) -> DataFrame:
    """'Video' frame sampling shape: explode byte payload into frames,
    keep every n-th — demonstrates the explode+filter pattern used for
    frame extraction (the decode itself being the fake above)."""
    media = synthetic_media(spark, sf_dir)
    frames = media.select(
        "doc_id",
        F.posexplode(
            F.split(F.base64(F.col("image_bytes")), "(?!^)")
        ).alias("frame_idx", "frame_token"),
    )
    # Spark's split() keeps one trailing empty token — not a frame
    return frames.filter(
        (F.col("frame_idx") % every_n == 0) & (F.col("frame_token") != "")
    )


#: Output contract of the audio feature extractor.
AUDIO_RMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)

AUDIO_WINDOW = 4  # samples per analysis window (16 synthetic samples → 4 windows)


def audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Audio' feature extraction shape: opaque PCM binary → per-window
    RMS energy via a numpy kernel in mapInPandas. The synthetic payload
    treats each md5 byte as an unsigned 8-bit sample; a real pipeline
    swaps the frombuffer line for soundfile/librosa decode and keeps
    the same batch plumbing. Integer sample sums are exact in double,
    so the kernel is bit-comparable to the SQL oracle."""
    media = synthetic_media(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            if len(batch) == 0:
                continue
            samples = np.stack(
                [np.frombuffer(b, dtype=np.uint8).astype(np.int64) for b in batch["image_bytes"]]
            )  # (rows, 16)
            n_win = samples.shape[1] // AUDIO_WINDOW
            windows = samples[:, : n_win * AUDIO_WINDOW].reshape(
                len(batch), n_win, AUDIO_WINDOW
            )
            sq_sum = (windows * windows).sum(axis=2)  # exact int sums
            rms = np.sqrt(sq_sum.astype(np.float64) / float(AUDIO_WINDOW))
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(batch["doc_id"].to_numpy(), n_win),
                    "window_idx": np.tile(np.arange(n_win, dtype=np.int32), len(batch)),
                    "rms": rms.ravel(),
                    "n_samples": np.int32(AUDIO_WINDOW),
                }
            )

    return media.mapInPandas(run, AUDIO_RMS_SCHEMA)


#: Output contract of the resize kernel.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized_bytes", T.BinaryType()),
        T.StructField("n_bytes_out", T.IntegerType()),
    ]
)

RESIZE_KEEP_BYTES = 8  # fake 2:1 downsample of the 16-byte payload


def image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' shape: binary → smaller binary via a pandas kernel
    (real pipeline: PIL thumbnail / ffmpeg scale). The fake kernel
    keeps the payload's byte prefix, so the binary→binary round trip
    through Arrow is still value-checked end-to-end by the SQL oracle
    (DuckDB replays the prefix via the md5 hex string)."""
    media = synthetic_media(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            resized = batch["image_bytes"].str[:RESIZE_KEEP_BYTES]
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "resized_bytes": resized,
                    "n_bytes_out": resized.str.len().astype("int32"),
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA).select(
        "doc_id",
        F.hex(F.col("resized_bytes")).alias("resized_hex"),
        "n_bytes_out",
    )


QUERIES = {
    "mm_image_metadata": image_metadata,
    "mm_frame_sample": frame_sample,
    "mm_audio_rms": audio_rms_windows,
    "mm_image_resize": image_resize,
}

# The decode kernel is a deterministic md5-derived fake, so (unlike a
# real codec) it IS SQL-expressible — the oracle replays the byte math
# in DuckDB, value-checking the whole mapInPandas round trip (binary
# column → Arrow batch → pandas kernel → typed rows).
_IMAGE_META_SQL = """
SELECT
    doc_id,
    octet_length(unhex(md5(text))) AS n_bytes,
    (('0x' || substr(md5(text), 1, 2))::INT % 64) + 1 AS width,
    (('0x' || substr(md5(text), 3, 2))::INT % 64) + 1 AS height,
    ['png', 'jpeg', 'webp'][(('0x' || substr(md5(text), 5, 2))::INT % 3) + 1] AS format
FROM documents
"""

_FRAME_SAMPLE_SQL = """
SELECT doc_id, frame_idx, substr(b64, frame_idx + 1, 1) AS frame_token
FROM (
    SELECT doc_id, b64, unnest(range(0, length(b64))) AS frame_idx
    FROM (SELECT doc_id, to_base64(unhex(md5(text))) AS b64 FROM documents)
)
WHERE frame_idx % 4 = 0
"""

_AUDIO_RMS_SQL = f"""
SELECT
    doc_id,
    (i // {AUDIO_WINDOW}) AS window_idx,
    sqrt(SUM(s * s) / {AUDIO_WINDOW}.0) AS rms,
    {AUDIO_WINDOW} AS n_samples
FROM (
    SELECT doc_id, t.i AS i,
           ('0x' || substr(h, 2 * t.i + 1, 2))::INT AS s
    FROM (SELECT doc_id, md5(text) AS h FROM documents)
    CROSS JOIN range(16) AS t(i)
)
GROUP BY doc_id, i // {AUDIO_WINDOW}
"""

_RESIZE_SQL = f"""
SELECT
    doc_id,
    upper(substr(md5(text), 1, {2 * RESIZE_KEEP_BYTES})) AS resized_hex,
    {RESIZE_KEEP_BYTES} AS n_bytes_out
FROM documents
"""

ORACLES: dict[str, str] = {
    "mm_image_metadata": _IMAGE_META_SQL,
    "mm_frame_sample": _FRAME_SAMPLE_SQL,
    "mm_audio_rms": _AUDIO_RMS_SQL,
    "mm_image_resize": _RESIZE_SQL,
}
