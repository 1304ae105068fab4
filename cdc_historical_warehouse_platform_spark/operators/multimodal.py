"""Multimodal column plumbing: image/audio/video as opaque binary.

North-star requirement. The pattern for 100 TB multimodal tables:

- payloads are **opaque `binary` columns** with a typed metadata
  struct alongside (mime, byte length, checksum) — never parsed by
  Catalyst, only moved;
- decode / feature-extraction runs in **Arrow-batched Python**
  (``mapInPandas``) so bytes cross the JVM↔Python boundary once per
  batch, not per row;
- real codecs (PIL / librosa / av) are not in this container, so the
  decode step is STUBBED: ``decode_image``/``decode_audio`` raise
  ``NotImplementedError`` unless the library import succeeds, and the
  tested path uses a deterministic byte-level feature extractor
  (length, checksum, byte histogram entropy) — the Spark-side schema,
  partitioning, UDF signature and batch shape are all real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary_payload",
    "FEATURE_SCHEMA",
    "extract_binary_features",
    "decode_image",
    "decode_audio",
]


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text
    (deterministic fake), plus the typed metadata struct a real
    ingest would carry."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("distinct_bytes", T.IntegerType()),
    ]
)


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` receives an iterator of pandas batches — the shape
    a real decoder (resize / frame-sample / mel-spectrogram) would
    plug into. Pure-Python byte features keep it deterministic here.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                counts: dict[int, int] = {}
                for byte in data:
                    counts[byte] = counts.get(byte, 0) + 1
                n = len(data) or 1
                entropy = -sum(
                    (c / n) * math.log2(c / n) for c in counts.values()
                )
                import hashlib

                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(data),
                        "checksum": hashlib.md5(data).hexdigest(),
                        "byte_entropy": round(entropy, 6),
                        "distinct_bytes": len(counts),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(_features, FEATURE_SCHEMA)


def _stub(name: str, lib: str):
    raise NotImplementedError(
        f"{name} requires {lib}, which is not available in this environment; "
        "the Spark-side plumbing (schema, mapInPandas batching, partitioning) "
        "is implemented and tested with the byte-level extractor instead."
    )


def decode_image(payload: bytes):
    """Decode an image payload → (height, width, channels) array."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        _stub("decode_image", "Pillow")
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    """Decode an audio payload → waveform array + sample rate."""
    try:
        import librosa  # noqa: F401
    except ImportError:
        _stub("decode_audio", "librosa")
    import io

    import librosa

    return librosa.load(io.BytesIO(payload))
