"""Multimodal (image/audio/video) column operators (north-star C5).

Contract: media travels as an opaque ``binary`` payload column plus typed
metadata (media_type, width/height/duration, codec).  All per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
Pandas iteration via ``mapInPandas`` — the ONLY sanctioned Python row path —
so each task processes whole record batches and the cluster scales the
decode horizontally.

Codec boundary: pixel/sample DECODE is stubbed in this environment (no
image/audio libs in the container): `decode_stub` raises
NotImplementedError unless `fake=True`, in which case it produces a
deterministic fake feature vector (sha-seeded) so the Spark-side plumbing —
schema, batch iteration, partitioning — is fully real and tested.

Container METADATA, however, needs no codec: `parse_media_header` reads
real PNG/JPEG/GIF dimensions and WAV format/duration straight from the
byte headers (pure Python struct reads), and `probe_media` runs it as the
standard mapInPandas shape — the honest middle ground between "stub
everything" and libraries the environment lacks.
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


# --- header probing (real metadata, no codec libraries) ----------------------

PROBE_SCHEMA = (
    "item_id long, media_type string, n_bytes int, width int, height int, "
    "sample_rate int, n_channels int, bits_per_sample int, duration_ms long"
)


def parse_media_header(payload: bytes) -> dict:
    """Sniff + parse container metadata from raw bytes (pure Python).

    Formats: PNG (IHDR width/height), JPEG (SOF0/1/2 frame dims), GIF
    (logical screen), WAV (fmt chunk + data-size-derived duration), BMP
    (BITMAPINFOHEADER dims), FLAC (STREAMINFO rate/channels/bit-depth +
    total-samples-derived duration).
    Returns {"media_type": None} for unrecognized payloads — callers keep
    the opaque-binary contract instead of failing the batch.
    """
    out = {
        "media_type": None, "width": None, "height": None, "sample_rate": None,
        "n_channels": None, "bits_per_sample": None, "duration_ms": None,
    }
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            out["media_type"] = "image/png"
            out["width"] = int.from_bytes(payload[16:20], "big")
            out["height"] = int.from_bytes(payload[20:24], "big")
        elif payload[:3] == b"GIF" and payload[3:6] in (b"87a", b"89a"):
            out["media_type"] = "image/gif"
            out["width"] = int.from_bytes(payload[6:8], "little")
            out["height"] = int.from_bytes(payload[8:10], "little")
        elif payload[:2] == b"\xff\xd8":
            out["media_type"] = "image/jpeg"
            i = 2
            while i + 9 < len(payload):
                if payload[i] != 0xFF:
                    break
                # 0xFF fill bytes may pad between segments (ITU T.81 B.1.1.2)
                while i + 9 < len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                marker = payload[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    out["height"] = int.from_bytes(payload[i + 5 : i + 7], "big")
                    out["width"] = int.from_bytes(payload[i + 7 : i + 9], "big")
                    break
                if marker == 0xD9:  # EOI — no frame header found
                    break
                if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone marker (TEM/SOI/RSTn), no length field
                else:
                    i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            out["media_type"] = "audio/wav"
            i, byte_rate, data_size = 12, None, None
            while i + 8 <= len(payload):
                chunk_id = payload[i : i + 4]
                chunk_size = int.from_bytes(payload[i + 4 : i + 8], "little")
                if chunk_id == b"fmt ":
                    body = payload[i + 8 : i + 8 + chunk_size]
                    out["n_channels"] = int.from_bytes(body[2:4], "little")
                    out["sample_rate"] = int.from_bytes(body[4:8], "little")
                    byte_rate = int.from_bytes(body[8:12], "little")
                    out["bits_per_sample"] = int.from_bytes(body[14:16], "little")
                elif chunk_id == b"data":
                    data_size = chunk_size
                i += 8 + chunk_size + (chunk_size % 2)  # chunks are word-aligned
            if byte_rate and data_size is not None:
                out["duration_ms"] = data_size * 1000 // byte_rate
        elif payload[:2] == b"BM" and len(payload) >= 26:
            # BITMAPINFOHEADER: signed little-endian dims at offsets 18/22
            out["media_type"] = "image/bmp"
            out["width"] = int.from_bytes(payload[18:22], "little", signed=True)
            # negative height = top-down row order; magnitude is the height
            out["height"] = abs(
                int.from_bytes(payload[22:26], "little", signed=True)
            )
        elif payload[:4] == b"fLaC" and len(payload) >= 42:
            # METADATA_BLOCK_STREAMINFO is mandatory-first: 4-byte header
            # then 34 bytes; rate(20b)/channels-1(3b)/bps-1(5b)/samples(36b)
            # packed big-endian starting at byte 18 of the block body
            out["media_type"] = "audio/flac"
            bits = int.from_bytes(payload[18:26], "big")
            out["sample_rate"] = bits >> 44
            out["n_channels"] = ((bits >> 41) & 0x7) + 1
            out["bits_per_sample"] = ((bits >> 36) & 0x1F) + 1
            total_samples = bits & ((1 << 36) - 1)
            if out["sample_rate"]:
                out["duration_ms"] = total_samples * 1000 // out["sample_rate"]
    except (IndexError, ValueError):
        out = {k: None for k in out}
    return out


def probe_media(
    df: DataFrame, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """Real header metadata per item, as a mapInPandas batch map.

    Same 100 TB shape as featurize_binary — opaque binary in, typed
    metadata out, zero shuffle; only the first KBs of each payload are
    touched, so column-pruned scans that keep payloads out of other
    operators matter more than the parse itself.
    """

    _pickle_module_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].astype("int64"),
                    "media_type": [p["media_type"] for p in parsed],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "width": pd.array([p["width"] for p in parsed], dtype="Int32"),
                    "height": pd.array([p["height"] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array(
                        [p["sample_rate"] for p in parsed], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [p["n_channels"] for p in parsed], dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        [p["bits_per_sample"] for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p["duration_ms"] for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(run, schema=PROBE_SCHEMA)


def synth_media_payload(doc_id: int, n_chars: int) -> tuple[bytes, str]:
    """Deterministic REAL container bytes for tests/queries (no codec libs):
    odd ids → a PNG whose IHDR encodes formula-derived dimensions, even ids
    → a WAV whose fmt/data chunks encode formula-derived audio params.  The
    formulas are integer-only so a SQL oracle can state the expected
    metadata while Spark actually round-trips it through real bytes.
    """
    if doc_id % 2 == 1:
        width = 16 + doc_id % 32
        height = 9 + doc_id % 17
        ihdr_body = (
            width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor
        )
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + len(ihdr_body).to_bytes(4, "big") + b"IHDR" + ihdr_body
            + b"\x00\x00\x00\x00"  # CRC (not validated by the probe)
        )
        return payload, "image/png"
    sample_rate = 8000 * (1 + doc_id % 3)
    n_channels = 1 + (doc_id // 2) % 2
    bits = 16
    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    n_samples = 100 + n_chars
    data_size = n_samples * block_align
    fmt_body = (
        (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    payload = (
        b"RIFF" + (36 + data_size).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
        # declared data size drives the duration math; the body is bounded
        # (header-only probes never read sample bytes)
        + b"data" + data_size.to_bytes(4, "little") + bytes(data_size % 4096)
    )
    return payload, "audio/wav"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a binary payload column from text content."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def with_synth_media(
    df: DataFrame, id_col: str = "doc_id", n_chars_col: str = "n_chars"
) -> DataFrame:
    """Attach a real PNG/WAV container payload per row (synth_media_payload),
    built in an Arrow-batched pandas UDF (struct packing is Python work)."""

    _pickle_module_by_value()

    @F.pandas_udf("binary")
    def make_payload(ids: pd.Series, n_chars: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_media_payload(int(i), int(n))[0] for i, n in zip(ids, n_chars)]
        )

    return df.withColumn("payload", make_payload(F.col(id_col), F.col(n_chars_col)))


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
