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
    return frames.filter(F.col("frame_idx") % every_n == 0)


QUERIES = {
    "mm_image_metadata": image_metadata,
    "mm_frame_sample": frame_sample,
}

#: Binary payloads + pandas kernels aren't SQL-expressible → rows-only.
ORACLES: dict[str, str] = {}
