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

def _pickle_module_by_value() -> None:
    """Make this module's functions serialize BY VALUE into UDF closures.

    cloudpickle serializes module-level functions by reference (module path
    + name), which breaks on executors that don't have this package on
    their import path.  Registering the module switches to by-value for
    everything the UDF closures pull in.  Idempotent; call at the top of
    every operator that ships Python to executors.
    """
    try:
        from pyspark import cloudpickle
        import social_warner_spark.operators.multimodal as _self

        cloudpickle.register_pickle_by_value(_self)
    except Exception:
        pass  # older Spark: fall back to by-reference (works when the
        # package is installed on executors)


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

    _pickle_module_by_value()

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


# --- typed media operators (decode / resize / frame-sample) ------------------
#
# Each is the standard mapInPandas shape: binary in → (metadata, binary) out.
# The codec call is isolated in one stub function per op so swapping in
# PIL/libav later changes no Spark plumbing.

RESIZE_SCHEMA = (
    "item_id long, width int, height int, payload binary"
)
FRAMES_SCHEMA = "item_id long, frame_index int, frame_ts_ms long, frame binary"


def _resize_stub(payload: bytes, width: int, height: int, fake: bool) -> bytes:
    if not fake:
        raise NotImplementedError("image resize requires a codec library")
    # deterministic fake: digest-seeded bytes of length w*h (content-stable)
    seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    reps = (width * height) // len(seed) + 1
    return (seed * reps)[: width * height]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Batch image resize over binary payloads (decode→resize→re-encode)."""

    _pickle_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": pdf[payload_col].map(
                        lambda b: _resize_stub(b, width, height, fake_decode)
                    ),
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def _frame_sample_stub(
    payload: bytes, every_ms: int, max_frames: int, fake: bool
) -> list[tuple[int, int, bytes]]:
    if not fake:
        raise NotImplementedError("video decode requires a codec library")
    # deterministic fake: frame count derived from payload length
    n = min(max_frames, max(1, len(payload) // 64))
    return [
        (i, i * every_ms, hashlib.sha256(payload + bytes([i])).digest())
        for i in range(n)
    ]


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "item_id",
    payload_col: str = "payload",
    fake_decode: bool = True,
) -> DataFrame:
    """Row-expanding frame sampling: one output row per sampled frame.

    A mapInPandas generator (not explode of a UDF array) so very long
    videos never materialize all frames in one value.
    """

    _pickle_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"item_id": [], "frame_index": [], "frame_ts_ms": [], "frame": []}
            for item_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for idx, ts_ms, frame in _frame_sample_stub(
                    payload, every_ms, max_frames, fake_decode
                ):
                    out["item_id"].append(int(item_id))
                    out["frame_index"].append(idx)
                    out["frame_ts_ms"].append(ts_ms)
                    out["frame"].append(frame)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)
