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
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
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
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
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
