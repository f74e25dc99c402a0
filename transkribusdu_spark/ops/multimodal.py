"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata; decode / feature-extraction as Arrow-batched
pandas UDFs over ``mapInPandas``.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBBED: ``decode_image_real`` raises
``NotImplementedError`` by design; ``extract_binary_features`` is a
deterministic fake decoder whose Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested —
swap the kernel body for a real decoder on a cluster that has the libs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType(
            [
                T.StructField("mime", T.StringType(), False),
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
            ]
        ), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_hist", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize a deterministic binary payload per document (stands in
    for a decoded WARC image record): payload = UTF-8 bytes of the text;
    metadata typed as struct<mime,width,height>."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/x-fake").alias("mime"),
            F.pmod("doc_id", F.lit(1024)).cast("int").alias("width"),
            F.pmod("doc_id", F.lit(768)).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image_real(media: DataFrame) -> DataFrame:
    """Real decoder entry point — intentionally unimplemented here.

    On a cluster with PIL/opencv, replace the kernel inside
    ``extract_binary_features`` with actual decode; the Spark plumbing is
    identical."""
    raise NotImplementedError(
        "image decode libraries are not available in this container; "
        "use extract_binary_features (deterministic fake kernel) or swap "
        "in a real decoder on a full cluster"
    )


def extract_binary_features(media: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Deterministic fake kernel: byte mean + 16-bin byte histogram (real
    decoders slot into the same mapInPandas shape). Vectorized with
    numpy.frombuffer per payload — no per-byte Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "mime": [], "byte_mean": [], "byte_hist": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=hist_bins, range=(0, 256))
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(int(arr.size))
                out["mime"].append(meta["mime"] if isinstance(meta, dict) else meta.mime)
                out["byte_mean"].append(round(float(arr.mean()) if arr.size else 0.0, 6))
                out["byte_hist"].append((hist / max(arr.size, 1)).round(6).tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
