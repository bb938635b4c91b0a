"""Multimodal (image/audio/video) column plumbing.

Media live as opaque ``binary`` payload columns with typed metadata;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the expensive Python work streams through
executors without materializing blobs on the driver.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode`` is STUBBED: when the real libraries are importable they are
used; otherwise a clearly-marked deterministic fake (byte-histogram
"signal") stands in. The Spark-side contract — schema, batching,
partitioning, UDF signatures — is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

FEATURE_DIM = 16

_MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, magic string, "
    f"features array<double>"
)


def _try_real_decoder():
    """Gate on real codec libs; None -> use the deterministic stub."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


def _decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: normalized 16-bin byte histogram.

    Stands in for image decode / audio PCM extraction. Replace with a
    real codec call when the library is present (see _try_real_decoder).
    """
    if not payload:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return hist / len(arr)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in blob column: utf-8 bytes of the text + media metadata.

    In a real pipeline this column comes straight from the lakehouse
    (parquet/iceberg binary column); everything downstream only sees
    ``payload: binary``.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("text/plain")
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _try_real_decoder()
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            magics = []
            for p in payloads:
                b = bytes(p) if p is not None else b""
                magics.append(b[:4].hex())
                if decoder == "pil":  # pragma: no cover
                    raise NotImplementedError(
                        "real image decode path requires PIL; stub is used when absent"
                    )
                feats.append(_decode_stub(b).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                    "magic": magics,
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=_MEDIA_SCHEMA)


def frame_sample(df: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Sample n evenly-spaced byte windows ("frames") per payload —
    the video-keyframe pattern, as plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if len(b) == 0:
                    continue
                step = max(1, (len(b) - frame_bytes) // max(1, n_frames - 1))
                for fi in range(n_frames):
                    off = min(fi * step, max(0, len(b) - frame_bytes))
                    rows.append((doc_id, fi, off, b[off : off + frame_bytes]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "offset", "frame"]
            )

    return df.mapInPandas(run, schema="doc_id long, frame_idx int, offset long, frame binary")


def resize(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize stub: decimate each payload to ``target_bytes`` by
    even-stride byte sampling — the image-resize slot (same signature a
    real PIL ``thumbnail`` call would occupy; swap the body when codecs
    are available). Output keeps the binary column contract so resize
    composes with extract_features / frame_sample."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                if len(b) <= target_bytes:
                    out.append(b)
                else:
                    stride = len(b) / target_bytes
                    out.append(bytes(b[int(i * stride)] for i in range(target_bytes)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                }
            )

    return df.mapInPandas(run, schema="doc_id long, media_type string, payload binary")


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: resize -> frame-sample pipeline over blobs; emits
    per-doc frame stats (deterministic; rows-only)."""
    docs = load_table(spark, "documents", sf_dir, parallel=False).select(
        "doc_id", "text"
    )  # parallel=False: mapInPandas worker fan-out costs more than it buys here
    frames = frame_sample(resize(attach_payload(docs)))
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("offset").alias("max_offset"),
            # sort by frame_idx before digesting: collect_list order is
            # arrival-order (nondeterministic under parallelism)
            F.expr(
                "md5(concat_ws('', transform("
                "array_sort(collect_list(struct(frame_idx AS i, hex(frame) AS h))),"
                " s -> s.h)))"
            ).alias("frames_digest"),
        )
        .orderBy("doc_id")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: full plumbing pass over documents-as-blobs.

    rows-only check (mapInPandas decode isn't SQL-expressible)."""
    docs = load_table(spark, "documents", sf_dir, parallel=False).select(
        "doc_id", "text"
    )  # parallel=False: see multimodal_frames
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "magic",
        F.round(F.element_at("features", 1), 9).alias("f0"),
    ).orderBy("doc_id")


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_frames": multimodal_frames,
}
ORACLE_SQL: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Container-header parsing — REAL decode of image dimensions and audio
# stream parameters from raw bytes (PNG / JPEG / GIF / RIFF-WAV headers
# are simple enough to read without codec libraries, so unlike the
# pixel-level stub above these produce true metadata).
# ---------------------------------------------------------------------------


def _parse_image_header(b: bytes):
    """(format, width, height) from the container header, or
    (None, None, None) when unrecognized/truncated."""
    import struct

    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOF segment
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
    return None, None, None


def _parse_wav_header(b: bytes):
    """(channels, sample_rate, n_frames, duration_s) from a RIFF/WAVE
    header, or Nones when unrecognized."""
    import struct

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None, None, None, None
    i = 12
    channels = rate = bits = None
    data_size = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)
    if None in (channels, rate, bits) or data_size is None or channels == 0 or bits == 0:
        return None, None, None, None
    n_frames = data_size // (channels * bits // 8)
    return channels, rate, n_frames, round(n_frames / rate, 6)


def parse_image_meta(
    df: DataFrame, content_col: str = "content", id_col: str = "path"
) -> DataFrame:
    """True (format, width, height) per binary payload — header-only
    reads, Arrow-batched, no codec libraries; pairs with
    ``sources.io.read_binary_files`` for asset inventory at scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _parse_image_header(bytes(b) if b is not None else b"")
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [m[0] for m in metas],
                    "width": pd.array([m[1] for m in metas], dtype="Int64"),
                    "height": pd.array([m[2] for m in metas], dtype="Int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        gen, schema=f"{id_col} string, format string, width long, height long"
    )


def parse_audio_meta(
    df: DataFrame, content_col: str = "content", id_col: str = "path"
) -> DataFrame:
    """True (channels, sample_rate, n_frames, duration_s) per RIFF/WAV
    payload — header-only reads, Arrow-batched, no codec libraries."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _parse_wav_header(bytes(b) if b is not None else b"")
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "channels": pd.array([m[0] for m in metas], dtype="Int64"),
                    "sample_rate": pd.array([m[1] for m in metas], dtype="Int64"),
                    "n_frames": pd.array([m[2] for m in metas], dtype="Int64"),
                    "duration_s": pd.array([m[3] for m in metas], dtype="Float64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        gen,
        schema=(
            f"{id_col} string, channels long, sample_rate long, "
            "n_frames long, duration_s double"
        ),
    )
