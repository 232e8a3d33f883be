"""Multimodal (image/audio/video) column operators (north-star C5).

Contract: media travels as an opaque ``binary`` payload column plus typed
metadata (media_type, width/height/duration, codec).  All per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
Pandas iteration via ``mapInPandas`` — the ONLY sanctioned Python row path —
so each task processes whole record batches and the cluster scales the
decode horizontally.

The actual codec work is STUBBED in this environment (no image/audio libs
in the container): `decode_stub` raises NotImplementedError unless
`fake=True`, in which case it produces a deterministic fake feature vector
(sha-seeded) so the Spark-side plumbing — schema, batch iteration,
partitioning — is fully real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Output schema of featurize_binary
FEATURE_SCHEMA = (
    "item_id long, media_type string, n_bytes int, "
    "digest string, feature array<float>"
)

FEATURE_DIM = 8


def decode_stub(payload: bytes, media_type: str, fake: bool = False) -> list[float]:
    """Decode + feature-extract one media payload.

    Real implementation would dispatch on media_type to PIL/libav/etc.
    With fake=True, returns a deterministic pseudo-feature derived from the
    content digest — stable across engines and runs.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for deterministic test features"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def featurize_binary(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    fake_decode: bool = True,
    batch_note_col: str | None = None,
) -> DataFrame:
    """mapInPandas featurization over binary payloads.

    Partitioning note (100 TB): payloads should be stored size-bucketed so
    Arrow batches have bounded memory; repartition by a size bucket before
    calling if payload sizes are heavy-tailed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col].astype(str),
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "digest": pdf[payload_col].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": pdf.apply(
                        lambda r: decode_stub(
                            r[payload_col], r[media_type_col], fake=fake_decode
                        ),
                        axis=1,
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a binary payload column from text content."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )
