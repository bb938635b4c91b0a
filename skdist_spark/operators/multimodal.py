"""Multimodal (image/audio/video) column plumbing.

Media live as opaque ``binary`` payload columns with typed metadata;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the expensive Python work streams through
executors without materializing blobs on the driver.

Pixel/sample/frame decode is REAL for every common container:
BMP (24/32-bit BI_RGB), PPM/PGM (P6/P5), PNG (8-bit
gray/RGB/palette/gray-alpha/RGBA, incl. Adam7 — stdlib zlib inflate
+ scanline unfiltering), GIF (standard LZW + palette, animated frames),
baseline JPEG (SOF0 Huffman DCT, any chroma sampling, restart
markers — see jpeg.py), WAV PCM waveforms, and Y4M video luma frames —
all pure Python/numpy, no codec library. resize/feature-extract
operate on those actual pixels (nearest-neighbor resample, luminance
histograms), re-encoding to P6/P5 so stages compose. Only
arithmetic-coded JPEG, 16-bit PNG, and compressed audio
(MP3/ogg) still need PIL/librosa/ffmpeg, which are NOT in this
container; for those ``decode`` falls back to a clearly-marked
deterministic stub (byte-histogram "signal") while container HEADERS
(dimensions, sample rates) are parsed for real either way. The
Spark-side contract — schema, batching, partitioning, UDF signatures —
is identical across both paths.
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


# ---------------------------------------------------------------------------
# REAL pixel codecs for uncompressed containers (pure numpy, no libs).
# BMP: BITMAPINFOHEADER, BI_RGB, 24/32 bpp, bottom-up or top-down rows.
# PPM/PGM: P6 (RGB) / P5 (gray) binary rasters, maxval <= 255.
# ---------------------------------------------------------------------------


def decode_pixels(b: bytes):
    """(format, pixels HxWxC uint8) for BMP/PPM/PGM/PNG/GIF/baseline-
    JPEG payloads, or (None, None) when the container is unsupported
    (arithmetic-coded JPEG, 16-bit PNG, exotic codecs) — callers
    fall back to the stub path on None.  PNG decode is real (stdlib
    zlib inflate + scanline unfiltering, see decode_png_pixels); JPEG
    decode is real baseline SOF0 (see jpeg.decode_jpeg_pixels)."""
    import struct

    if b[:2] == b"BM" and len(b) >= 54:
        off = struct.unpack("<I", b[10:14])[0]
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        comp = struct.unpack("<I", b[30:34])[0]
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
            return None, None
        top_down = h < 0
        h = abs(h)
        ch = bpp // 8
        stride = (w * ch + 3) & ~3  # rows padded to 4 bytes
        if off + stride * h > len(b):
            return None, None
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
        rows = rows.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
        if not top_down:
            rows = rows[::-1]
        # BGR(A) -> RGB(A)
        rgb = rows[..., [2, 1, 0]] if ch == 3 else rows[..., [2, 1, 0, 3]]
        return "bmp", np.ascontiguousarray(rgb)
    if b[:2] in (b"P6", b"P5"):
        # header: magic, width, height, maxval — tokens separated by
        # whitespace, '#' comments run to end of line
        toks, i, n = [], 2, len(b)
        while len(toks) < 3 and i < n:
            c = b[i : i + 1]
            if c == b"#":
                while i < n and b[i] not in (10, 13):
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not b[j : j + 1].isspace():
                    j += 1
                toks.append(b[i:j])
                i = j
        if len(toks) < 3:
            return None, None
        try:
            w, h, maxval = (int(t) for t in toks)
        except ValueError:
            return None, None
        if w <= 0 or h <= 0 or not 0 < maxval <= 255:
            return None, None
        i += 1  # single whitespace byte after maxval, then the raster
        ch = 3 if b[:2] == b"P6" else 1
        if i + w * h * ch > n:
            return None, None
        px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i)
        return ("ppm" if ch == 3 else "pgm"), px.reshape(h, w, ch)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        px = decode_png_pixels(b)
        if px is not None:
            return "png", px
    if b[:6] in (b"GIF87a", b"GIF89a"):
        _, _, frames = decode_gif_frames(b, max_frames=1)
        if frames:
            return "gif", frames[0]
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_pixels

        px = decode_jpeg_pixels(b)
        if px is not None:
            return "jpeg", px
    return None, None


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 (3-channel) / P5 (1-channel) binary encoding of a HxWxC
    uint8 array — the round-trip partner of decode_pixels."""
    h, w, ch = pixels.shape
    if ch == 4:  # drop alpha: PPM has no alpha plane
        pixels, ch = pixels[..., :3], 3
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def _luma_histogram(px: np.ndarray) -> np.ndarray:
    """Normalized FEATURE_DIM-bin luminance histogram of real pixels
    (integer BT.601-ish weights 77/150/29 over 256)."""
    p = px.astype(np.uint32)
    if p.shape[2] == 1:
        luma = p[..., 0]
    else:
        luma = (p[..., 0] * 77 + p[..., 1] * 150 + p[..., 2] * 29) >> 8
    hist, _ = np.histogram(luma, bins=FEATURE_DIM, range=(0, 256))
    return hist / luma.size


def resize_nearest(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw) — deterministic integer
    index math (floor(i * src/dst)), no float filtering."""
    h, w = pixels.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return np.ascontiguousarray(pixels[ys][:, xs])


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type -> samples/px


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth).  Sub/Up vectorize; Average/Paeth walk the
    row (they depend on the just-reconstructed left neighbor)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = int(raw[pos])
        row = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: cumsum per bpp lane
            rec = row.copy()
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = row.copy()
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row.copy()
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png_pixels(b: bytes):
    """REAL PNG decode in pure numpy + stdlib zlib: 8-bit depth,
    gray / RGB / palette / gray-alpha / RGBA, both non-interlaced and
    Adam7-interlaced (each pass unfiltered as its own sub-image and
    scattered onto the pass grid).  Returns an HxWxC uint8 array or
    None (16-bit or malformed payloads fall back to the metadata-only
    path)."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(b)
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if (
        w is None
        or bit_depth != 8
        or interlace not in (0, 1)
        or color_type not in _PNG_CHANNELS
        or (color_type == 3 and plte is None)
    ):
        return None
    ch = _PNG_CHANNELS[color_type]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error:
        return None
    if interlace == 0:
        stride = w * ch
        if raw.size != h * (stride + 1):
            return None
        px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    else:  # Adam7: 7 independently-filtered sub-images, scattered
        px = np.zeros((h, w, ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = pw * ch
            need = ph * (stride + 1)
            if pos + need > raw.size:
                return None
            sub = _png_unfilter(raw[pos : pos + need], ph, stride, ch)
            pos += need
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        if pos != raw.size:
            return None
    if color_type == 3:
        px = plte[px[..., 0]]  # palette lookup -> HxWx3
    return np.ascontiguousarray(px)


def encode_png(
    pixels: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """Minimal PNG encoder (8-bit gray/RGB/RGBA, filter 0 or 2,
    optional Adam7 interlacing) — the round-trip partner for
    decode_png_pixels and a crafted-bytes source for filter and
    deinterlace coverage tests."""
    import struct
    import zlib

    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def filt(img: np.ndarray) -> bytearray:
        ph, pw = img.shape[:2]
        body = bytearray()
        prev = np.zeros((pw, ch), dtype=np.int32)
        for y in range(ph):
            cur = img[y].astype(np.int32)
            if filter_type == 2 and y > 0:
                body.append(2)
                body.extend(((cur - prev) & 0xFF).astype(np.uint8).tobytes())
            else:
                body.append(0)
                body.extend(cur.astype(np.uint8).tobytes())
            prev = cur
        return body

    rows = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                rows.extend(filt(sub))
    else:
        rows = filt(pixels)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24bpp BI_RGB bottom-up BMP encoding of a HxWx3 uint8 RGB array —
    crafted-bytes source for the decode round-trip tests and the
    synthetic blob generator."""
    import struct

    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    bgr = pixels[::-1][..., [2, 1, 0]]  # bottom-up rows, RGB -> BGR
    raster[:, : w * 3] = bgr.reshape(h, w * 3)
    data = raster.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


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
                fmt, px = decode_pixels(b)
                if px is not None:
                    # REAL pixels (BMP/PPM/PGM): luminance histogram
                    feats.append(_luma_histogram(px).tolist())
                    continue
                if decoder == "pil":  # pragma: no cover
                    raise NotImplementedError(
                        "compressed-codec decode requires PIL; stub is used when absent"
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


def resize_images(
    df: DataFrame,
    max_side: int = 32,
    id_col: str = "doc_id",
    content_col: str = "payload",
) -> DataFrame:
    """REAL image resize: payloads that decode (BMP/PPM/PGM) are
    nearest-neighbor resampled so their longer side is <= ``max_side``
    and re-encoded as P6/P5, so the output composes with
    extract_features / frame_sample / another resize.  Undecodable
    (compressed) payloads pass through byte-identical with
    ``decoded = false`` — no silent lossy fallback on real media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, fmts, ws, hs, dec = [], [], [], [], []
            for p in pdf[content_col]:
                b = bytes(p) if p is not None else b""
                fmt, px = decode_pixels(b)
                if px is None:
                    payloads.append(b)
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    dec.append(False)
                    continue
                h, w = px.shape[:2]
                longer = max(h, w)
                if longer > max_side:
                    tw = max(1, (w * max_side) // longer)
                    th = max(1, (h * max_side) // longer)
                    px = resize_nearest(px, tw, th)
                payloads.append(encode_ppm(px))
                fmts.append(fmt)
                ws.append(px.shape[1])
                hs.append(px.shape[0])
                dec.append(True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "decoded": dec,
                    content_col: payloads,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, format string, width int, height int, "
            f"decoded boolean, {content_col} binary"
        ),
    )


def multimodal_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the REAL pixel path end-to-end — deterministic
    per-doc gradient images (crafted from doc_id, no codec libs
    needed; every third doc is a baseline JPEG from jpeg.encode_jpeg,
    the rest BMP) -> pixel decode -> nearest-neighbor resize to 8px
    -> luminance histogram features over the true resized pixels.
    rows-only (pixel rasters aren't SQL-expressible); determinism is
    pinned by the crafted-bytes round-trip tests in the test suite
    (our JPEG codec is bit-deterministic: fixed tables, integer
    quantization)."""
    # Moderate explicit fan-out: the pure-Python codec work is CPU-bound
    # (single-partition wall at sf0.1 ~9 s), but each mapInPandas stage
    # pays per-partition Python-worker fan-out, so max parallelism
    # LOSES to it at this payload size (measured sweep at sf0.1:
    # 1 part 9.1 s, 8 parts 1.8 s, 32 parts 2.5 s).  Target ~1/4 of the
    # cores with a floor of 8; at 100 TB the scan's own split count
    # exceeds this and the repartition becomes a no-op-sized shuffle of
    # (doc_id) rows only.
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    docs = (
        load_table(spark, "documents", sf_dir, parallel=False)
        .select("doc_id")
        .repartition(n_parts, "doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 16 + d % 7, 12 + d % 5
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (xx * 255) // max(w - 1, 1),
                        (yy * 255) // max(h - 1, 1),
                        (xx + yy + d) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                if d % 3 == 0:
                    from .jpeg import encode_jpeg

                    payloads.append(encode_jpeg(px, quality=95))
                else:
                    payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    # localCheckpoint: the encode->decode->resize subtree feeds BOTH
    # sides of the final join; without a lineage cut Spark executes the
    # expensive Python codec work twice.  The materialized frame is
    # tiny (one <=8px P6 payload per doc), so this is a bounded cut,
    # not a cache of raw media.
    small = resize_images(blobs, max_side=8).localCheckpoint()
    feats = extract_features(
        small.withColumn("media_type", F.lit("image/x-portable-pixmap"))
    )
    return (
        small.select("doc_id", "format", "width", "height")
        .join(
            feats.select(
                "doc_id",
                "n_bytes",
                F.round(F.element_at("features", 1), 9).alias("luma_bin0"),
                F.round(F.element_at("features", FEATURE_DIM), 9).alias(
                    "luma_bin_last"
                ),
            ),
            "doc_id",
        )
        .orderBy("doc_id")
    )


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
    "multimodal_pixels": multimodal_pixels,
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


# ---------------------------------------------------------------------------
# REAL audio decode: RIFF/WAV PCM samples ARE raw — parse the data
# chunk into a numpy waveform and compute true signal features
# (per-window RMS energy, zero-crossing rate) with no audio library.
# ---------------------------------------------------------------------------


def decode_wav_pcm(b: bytes):
    """(sample_rate, samples float64 in [-1, 1], shape (n, channels))
    for 8/16-bit PCM RIFF-WAV payloads, or (None, None) otherwise."""
    import struct

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None, None
    i = 12
    fmt_code = channels = rate = bits = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            fmt_code, channels, rate = struct.unpack("<HHI", b[i + 8 : i + 16])
            bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size % 2)
    if fmt_code != 1 or data is None or not channels or bits not in (8, 16):
        return None, None
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2")
        wave = raw.astype(np.float64) / 32768.0
    else:  # 8-bit WAV PCM is unsigned, midpoint 128
        raw = np.frombuffer(data, dtype=np.uint8)
        wave = (raw.astype(np.float64) - 128.0) / 128.0
    n = (len(wave) // channels) * channels
    return rate, wave[:n].reshape(-1, channels)


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """16-bit PCM WAV encoding of an (n, channels) float array in
    [-1, 1] — the crafted-bytes source for the audio round trips."""
    import struct

    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = rate * ch * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


AUDIO_WINDOW_MS = 100


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "payload",
    window_ms: int = AUDIO_WINDOW_MS,
) -> DataFrame:
    """TRUE per-window audio features from PCM payloads: one row per
    (payload, window) with RMS energy and zero-crossing rate computed
    from the actual samples (channel-averaged).  Non-PCM payloads
    yield no rows — no fake numbers for real media.  Arrow-batched
    mapInPandas; windows are rate * window_ms / 1000 samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, zcr = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[content_col]):
                b = bytes(p) if p is not None else b""
                rate, wave = decode_wav_pcm(b)
                if wave is None or len(wave) == 0:
                    continue
                mono = wave.mean(axis=1)
                step = max(1, rate * window_ms // 1000)
                for w in range(0, len(mono), step):
                    seg = mono[w : w + step]
                    ids.append(doc_id)
                    widx.append(w // step)
                    rms.append(float(np.sqrt(np.mean(seg * seg))))
                    sign = np.signbit(seg)
                    zcr.append(
                        float(np.count_nonzero(sign[1:] != sign[:-1]))
                        / max(len(seg) - 1, 1)
                    )
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="Int64"),
                    "window_idx": pd.array(widx, dtype="Int32"),
                    "rms": pd.array(rms, dtype="Float64"),
                    "zcr": pd.array(zcr, dtype="Float64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        schema=f"{id_col} long, window_idx int, rms double, zcr double",
    )


# ---------------------------------------------------------------------------
# REAL video frames: YUV4MPEG2 (.y4m) is raw uncompressed YUV with a
# text header — true frame extraction with no ffmpeg.
# ---------------------------------------------------------------------------


def decode_y4m_frames(b: bytes, max_frames: int | None = None):
    """(width, height, [luma frames HxW uint8]) for C420/C444/Cmono
    YUV4MPEG2 payloads, or (None, None, None).  Only the luma plane is
    returned (what frame-level features consume); chroma is skipped by
    offset."""
    if not b.startswith(b"YUV4MPEG2"):
        return None, None, None
    eol = b.find(b"\n")
    if eol < 0:
        return None, None, None
    w = h = None
    colorspace = "C420"
    for tok in b[10:eol].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok.decode("ascii", "replace")
    if not w or not h:
        return None, None, None
    if colorspace.startswith("C420"):
        frame_bytes = w * h * 3 // 2
    elif colorspace.startswith("C444"):
        frame_bytes = w * h * 3
    elif colorspace.startswith("Cmono"):
        frame_bytes = w * h
    else:
        return None, None, None
    frames = []
    pos = eol + 1
    while pos < len(b):
        feol = b.find(b"\n", pos)
        if feol < 0 or b[pos : pos + 5] != b"FRAME":
            break
        pos = feol + 1
        if pos + frame_bytes > len(b):
            break
        luma = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=pos)
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
        if max_frames is not None and len(frames) >= max_frames:
            break
    return w, h, frames


def encode_y4m(frames, w: int, h: int, colorspace: str = "C420") -> bytes:
    """Minimal YUV4MPEG2 encoding (luma from ``frames``, neutral 128
    chroma) — the crafted source for the video round trips."""
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 {colorspace}\n".encode())
    chroma = {"C420": w * h // 2, "C444": w * h * 2, "Cmono": 0}[colorspace]
    for f in frames:
        out.extend(b"FRAME\n")
        out.extend(np.asarray(f, dtype=np.uint8).tobytes())
        out.extend(bytes([128]) * chroma)
    return bytes(out)


VIDEO_SAMPLE_FRAMES = 4


def video_keyframes(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "payload",
    n_frames: int = VIDEO_SAMPLE_FRAMES,
) -> DataFrame:
    """TRUE video keyframe sampling: decode Y4M payloads, pick
    ``n_frames`` evenly spaced REAL luma frames, and emit per-frame
    statistics (mean luma, frame md5, inter-frame mean absolute
    difference vs the previous sampled frame — the scene-change
    signal).  Non-Y4M payloads yield no rows."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col], pdf[content_col]):
                b = bytes(p) if p is not None else b""
                w, h, frames = decode_y4m_frames(b)
                if not frames:
                    continue
                idxs = sorted(
                    {
                        (fi * (len(frames) - 1)) // max(n_frames - 1, 1)
                        for fi in range(min(n_frames, len(frames)))
                    }
                )
                prev = None
                for fi in idxs:
                    fr = frames[fi]
                    mad = (
                        float(np.abs(fr.astype(np.int16) - prev).mean())
                        if prev is not None
                        else None
                    )
                    rows.append(
                        (
                            doc_id,
                            fi,
                            w,
                            h,
                            float(fr.mean()),
                            hashlib.md5(fr.tobytes()).hexdigest(),
                            mad,
                        )
                    )
                    prev = fr.astype(np.int16)
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "width", "height",
                    "mean_luma", "frame_md5", "mad_prev",
                ],
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, frame_idx int, width int, height int, "
            "mean_luma double, frame_md5 string, mad_prev double"
        ),
    )


def multimodal_av(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: REAL audio + video decode end-to-end on
    deterministic per-doc payloads (a doc_id-keyed PCM tone in a real
    WAV container; a doc_id-keyed gradient clip in a real Y4M
    container) — per-doc window/frame counts plus digest-stable
    aggregates of the true signal features.  rows-only: sample-level
    DSP is not SQL-expressible; correctness is pinned by the
    analytic-signal tests in test_operators.py."""
    docs = load_table(spark, "documents", sf_dir, parallel=False).select(
        "doc_id"
    )  # parallel=False: see multimodal_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            wavs, clips = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 4000
                n = rate // 4  # 250 ms
                t = np.arange(n) / rate
                freq = 200 + (d % 20) * 25
                tone = (0.5 * np.sin(2 * np.pi * freq * t)).reshape(-1, 1)
                wavs.append(encode_wav_pcm16(tone, rate))
                w, h = 16, 8
                frames = [
                    ((np.arange(w)[None, :] + np.arange(h)[:, None] + d + fi) % 256)
                    .astype(np.uint8)
                    for fi in range(3 + d % 3)
                ]
                clips.append(encode_y4m(frames, w, h))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "wav": wavs, "clip": clips}
            )

    blobs = docs.mapInPandas(
        gen, schema="doc_id long, wav binary, clip binary"
    ).localCheckpoint()  # generated once, consumed by both branches
    audio = (
        audio_features(blobs, content_col="wav")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.round(F.avg("rms"), 6).alias("mean_rms"),
            F.round(F.avg("zcr"), 6).alias("mean_zcr"),
        )
    )
    video = (
        video_keyframes(blobs, content_col="clip")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_keyframes"),
            F.round(F.avg("mean_luma"), 6).alias("mean_luma"),
            F.expr(
                "md5(concat_ws('', sort_array(collect_list(frame_md5))))"
            ).alias("frames_digest"),
        )
    )
    return audio.join(video, "doc_id").orderBy("doc_id")


QUERIES["multimodal_av"] = multimodal_av


# ---------------------------------------------------------------------------
# REAL GIF decode: LZW decompression + palette lookup in pure Python/
# numpy (GIF is lossless — only the LZW coding stands between the
# bytes and true pixels).  Non-interlaced, full-frame images; animated
# GIFs yield every frame.
# ---------------------------------------------------------------------------


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int):
    """Standard GIF LZW: LSB-first variable-width codes, dictionary
    grows to 12 bits, clear code resets."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < n_pixels:
        if bitpos + code_size > total_bits:
            break
        code = 0
        for i in range(code_size):
            if (data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1:
                code |= 1 << i
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or len(table[code]) > 0):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # corrupt stream
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        return None
    return bytes(out[:n_pixels])


def decode_gif_frames(b: bytes, max_frames: int | None = None):
    """(width, height, [RGB frames HxWx3 uint8]) for non-interlaced
    full-frame GIF87a/89a payloads (animated GIFs yield each frame),
    or (None, None, None) for interlaced/partial-frame/corrupt
    payloads."""
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None, None, None
    w, h = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    frames = []
    while pos < len(b):
        marker = b[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if marker != 0x2C:
            return None, None, None
        left, top, fw, fh = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
        ipacked = b[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(b, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if ipacked & 0x40 or (left, top, fw, fh) != (0, 0, w, h) or table is None:
            return None, None, None  # interlaced / partial-frame: unsupported
        min_code = b[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(b) and b[pos] != 0:
            lzw.extend(b[pos + 1 : pos + 1 + b[pos]])
            pos += 1 + b[pos]
        pos += 1
        idx = _gif_lzw_decode(min_code, bytes(lzw), w * h)
        if idx is None:
            return None, None, None
        arr = np.frombuffer(idx, np.uint8).reshape(h, w)
        if int(arr.max()) >= len(table):
            return None, None, None
        frames.append(np.ascontiguousarray(table[arr]))
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        return None, None, None
    return w, h, frames


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Standard GIF LZW encoder (dictionary growth to 12 bits, clear
    on overflow) — exercises the decoder's growth path for real."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code, size):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += size
        while nbits >= 8:
            out_bits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], code_size)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        cur = nxt[-1:]
    if cur:
        emit(table[cur], code_size)
    emit(end, code_size)
    if nbits:
        out_bits.append(bitbuf & 0xFF)
    return bytes(out_bits)


def encode_gif(frames, palette: np.ndarray) -> bytes:
    """GIF89a encoding of index frames (each HxW uint8 into
    ``palette`` (Px3, P a power of two >= 2)) — the crafted source for
    the decode round trips, including animation."""
    import struct

    h, w = np.asarray(frames[0]).shape
    p = len(palette)
    depth = max((p - 1).bit_length(), 1)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HH", w, h))
    out.append(0x80 | (depth - 1))  # GCT present, size 2^depth
    out.extend(b"\x00\x00")
    pal = np.zeros(((1 << depth), 3), np.uint8)
    pal[:p] = palette
    out.extend(pal.tobytes())
    min_code = max(depth, 2)
    for f in frames:
        out.append(0x2C)
        out.extend(struct.pack("<HHHH", 0, 0, w, h))
        out.append(0)  # no LCT, not interlaced
        out.append(min_code)
        lzw = _gif_lzw_encode(min_code, np.asarray(f, np.uint8).tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---- perceptual-hash image near-dup ------------------------------------
# The multimodal face of the dedup family: a 64-bit dHash (horizontal
# gradient sign over a 9x8 luma thumbnail) per image, then LSH-banded
# candidate retrieval — 8 bands x 8 bits, so any pair within Hamming
# distance 7 shares at least one identical band (pigeonhole: 7 bit
# differences cannot cover 8 bands) and the band equi-join is LOSSLESS
# for the threshold, never image x image.

DHASH_BANDS = 8
DHASH_MAX_HAMMING = 7


def _dhash64(px: "np.ndarray") -> int:
    """64-bit difference hash: integer BT.601 luma, nearest-neighbor
    9x8 thumbnail, bit(r,c) = luma[r,c+1] > luma[r,c]. Pure integer
    ops — deterministic across platforms. Returned as signed two's
    complement so it stores in a Spark BIGINT."""
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] >= 3:
        luma = (
            299 * px[:, :, 0].astype(np.int64)
            + 587 * px[:, :, 1].astype(np.int64)
            + 114 * px[:, :, 2].astype(np.int64)
        ) // 1000
    else:
        luma = px[:, :, 0].astype(np.int64)
    thumb = resize_nearest(luma.astype(np.uint8)[:, :, None], 9, 8)[:, :, 0]
    bits = thumb[:, 1:].astype(np.int16) > thumb[:, :-1].astype(np.int16)
    h = 0
    for r in range(8):
        for c in range(8):
            if bits[r, c]:
                h |= 1 << (r * 8 + c)
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "payload"
) -> DataFrame:
    """Per-image 64-bit dHash over decodable payloads (BMP/PPM/PGM/
    PNG/GIF/baseline-JPEG); undecodable rows emit NULL. Arrow-batched
    mapInPandas — the only Python is the codec itself."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf[content_col]:
                b = bytes(p) if p is not None else b""
                _, px = decode_pixels(b)
                hashes.append(None if px is None else _dhash64(px))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "dhash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(id_col, content_col).mapInPandas(
        run, schema=f"{id_col} long, dhash long"
    )


def dhash_near_dup(
    hashes: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = DHASH_MAX_HAMMING,
    n_bands: int = DHASH_BANDS,
) -> DataFrame:
    """Near-duplicate image pairs within ``max_hamming`` bits, via the
    banded equi-join (lossless for max_hamming < n_bands, the
    MinHash-band argument): explode each hash into ``n_bands`` equal
    slices, meet candidates on (band, value), verify with one XOR
    bit_count.  Shuffle carries (band, value) keys.

    SIZE THE BANDS TO THE CORPUS: expected candidates are
    n_bands * N^2 / 2^(64/n_bands), so 8-bit bands (threshold 7) stop
    scaling around N ~ 10^5 even on unclustered hashes — for larger
    corpora use n_bands=4 (16-bit bands, lossless to Hamming 3, fine
    to N ~ 10^8) or run the 8-band recall pass only WITHIN buckets the
    4-band pass surfaces.  Measured in the stress lane at 500k hashes.
    """
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding is lossless only for max_hamming < n_bands "
            f"({max_hamming} >= {n_bands})"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = F.expr(
        f"transform(sequence(0, {n_bands - 1}),"
        " b -> struct(b AS band,"
        f" CAST(shiftrightunsigned(dhash, b * {width}) & {mask} AS BIGINT) AS val))"
    )
    h = hashes.where(F.col("dhash").isNotNull())
    b = h.select(
        F.col(id_col), F.col("dhash"), F.explode(bands).alias("bv")
    ).select(id_col, "dhash", "bv.band", "bv.val")
    left = b.alias("a")
    right = b.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(h_a ^ h_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


N_DHASH_DOCS = 100  # bounded demo corpus for the driver query


def multimodal_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: the full perceptual-dedup pipeline on crafted
    deterministic images — encode (BMP, every third doc baseline JPEG)
    -> pixel decode -> dHash -> banded near-dup join.  Images share a
    base gradient per (doc_id % 10) group with a small per-doc
    brightness perturbation, so within-group pairs land within the
    Hamming threshold and cross-group pairs do not.  rows-only (pixel
    rasters aren't SQL-expressible); the band-join's losslessness vs
    brute-force XOR is pinned in pytest."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    docs = (
        load_table(spark, "documents", sf_dir, parallel=False)
        .select("doc_id")
        .where(F.col("doc_id") < N_DHASH_DOCS)
        .repartition(n_parts, "doc_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def bits64(tag: str) -> int:
            return int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big")

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % 10
                # target dHash = group base pattern XOR a small per-doc
                # mask (<= 3 bits), so within-group Hamming <= 6 and
                # cross-group ~32. Encoded as a 9x8 grid of 4x4 flat
                # gray blocks with +/-15 luma walks — the thumbnail
                # sampler (floor(i*src/dst)) lands exactly on block
                # corners, and +/-15 steps survive JPEG q95 error.
                pattern = bits64(f"grp:{g}")
                mask = 0
                pos = bits64(f"doc:{d}")
                for k in range((d // 10) % 4):
                    mask |= 1 << ((pos >> (6 * k)) & 63)
                pattern ^= mask
                v = np.empty((8, 9), dtype=np.int64)
                v[:, 0] = 128
                for c in range(8):
                    step = np.array(
                        [
                            15 if (pattern >> (r * 8 + c)) & 1 else -15
                            for r in range(8)
                        ],
                        dtype=np.int64,
                    )
                    v[:, c + 1] = v[:, c] + step
                px = np.repeat(
                    np.repeat(v.astype(np.uint8), 4, axis=0), 4, axis=1
                )[:, :, None].repeat(3, axis=2)
                if d % 3 == 0:
                    from .jpeg import encode_jpeg

                    payloads.append(encode_jpeg(px, quality=95))
                else:
                    payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(gen, schema="doc_id long, payload binary")
    pairs = dhash_near_dup(image_dhash(blobs))
    return pairs.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming"
    ).orderBy("doc_a", "doc_b")


QUERIES["multimodal_dhash_dedup"] = multimodal_dhash_dedup
