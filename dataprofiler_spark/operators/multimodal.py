"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
plumbing — schema contract, Arrow batch shape, ``mapInPandas`` UDF
signature, partition sizing — is real and tested; the actual codec calls
(PIL/librosa/ffmpeg) are STUBBED behind ``decode_image_stub`` with a
deterministic fake, clearly marked, because media libraries are not
available in this environment. Swapping the stub for a real decoder
changes no Spark code: same iterator-of-DataFrames contract.

Scale notes: media rows are large, so ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` bound executor memory per Arrow batch;
feature-extraction output is tiny relative to input, so the UDF projects
early and never returns raw bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, byte_len long, format string, width int, height int, checksum string"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode.

    STUB: replace with e.g. PIL.Image.open(io.BytesIO(payload)) in a real
    deployment (NotImplementedError-free so the plumbing is testable).
    Derives pseudo width/height/format from the bytes deterministically.
    """
    import hashlib

    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    return {
        "byte_len": n,
        "format": ["png", "jpeg", "webp"][n % 3],
        "width": 64 + (n % 512),
        "height": 64 + ((n // 7) % 512),
        "checksum": digest,
    }


def decode_media_features(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Arrow-batched: each pandas DataFrame chunk holds ``maxRecordsPerBatch``
    rows; the UDF is a generator so memory stays bounded per batch.
    """
    id_name, bin_name = id_col, bin_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[bin_name].map(_fake_decode)
            out = pd.DataFrame({
                "id": pdf[id_name].astype("int64"),
                "byte_len": [f["byte_len"] for f in feats],
                "format": [f["format"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
            })
            yield out

    return df.select(id_col, bin_col).mapInPandas(extract, schema=MEDIA_SCHEMA)


def media_profile(features: DataFrame) -> DataFrame:
    """Aggregate profile of decoded media features — the same wide-agg
    pattern as every other profile operator."""
    return features.agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("byte_len").alias("total_bytes"),
        F.min("byte_len").alias("min_bytes"),
        F.max("byte_len").alias("max_bytes"),
        F.count_distinct("checksum").alias("distinct_payloads"),
        F.count_distinct("format").alias("n_formats"),
    )


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Testdata adapter: materialize a binary column from text (the
    testdata ships no real media; the binary path must still be exercised
    end-to-end)."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )
