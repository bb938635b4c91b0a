"""Baseline JPEG codec round-trip tests (pure Python, no Spark).

The encoder exists as the decoder's test partner: every decoder code
path (interleaved MCUs, 4:2:0 chroma upsample, restart-marker resync,
grayscale single-component scans, byte stuffing, ZRL/EOB runs) is
exercised by bytes crafted here, with error bounds tight enough to
prove the DCT/quantizer/Huffman plumbing is the real thing.
"""

from __future__ import annotations

import numpy as np
import pytest

from skdist_spark.operators.jpeg import (
    _canonical_codes,
    _DC_LUMA,
    decode_jpeg_pixels,
    encode_jpeg,
    ZIGZAG,
)
from skdist_spark.operators.multimodal import decode_pixels


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 19 + seed) % 256, (yy * 11) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)


def _err(a, b):
    return np.abs(a.astype(int) - b.astype(int))


def test_flat_color_near_lossless():
    img = np.full((16, 16, 3), [120, 60, 200], dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(img, quality=100))
    assert out.shape == (16, 16, 3)
    # flat block -> DC-only; only YCbCr<->RGB rounding remains
    assert _err(out, img).max() <= 1


def test_gradient_rgb_odd_dims_quality_ladder():
    img = _gradient(21, 13)
    prev_mean = None
    for q in (95, 75, 50):
        out = decode_jpeg_pixels(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        e = _err(out, img)
        # q95 must be tight; lower quality monotonically noisier
        if q == 95:
            assert e.max() <= 4
        if prev_mean is not None:
            assert e.mean() >= prev_mean - 0.05
        prev_mean = e.mean()


def test_grayscale_single_component_scan():
    yy, xx = np.mgrid[0:21, 0:13]
    g = ((xx * 7 + yy * 3) % 256).astype(np.uint8)[..., None]
    out = decode_jpeg_pixels(encode_jpeg(g, quality=95))
    assert out.shape == (21, 13, 1)
    assert _err(out, g).max() <= 2


def test_chroma_420_subsampling():
    base = _gradient(21, 13, seed=5)
    big = np.kron(base, np.ones((3, 3, 1))).astype(np.uint8)  # 63x39, smooth
    out = decode_jpeg_pixels(encode_jpeg(big, quality=90, subsample=True))
    assert out.shape == big.shape
    # chroma decimation costs a little accuracy but stays bounded
    assert _err(out, big).mean() < 3.0


def test_restart_markers_resync():
    big = np.kron(_gradient(21, 13, seed=9), np.ones((3, 3, 1))).astype(
        np.uint8
    )
    plain = decode_jpeg_pixels(encode_jpeg(big, quality=90))
    rst = decode_jpeg_pixels(encode_jpeg(big, quality=90, restart_interval=3))
    # restart markers change the byte stream, not the decoded pixels
    assert np.array_equal(plain, rst)


def test_restart_with_subsampling():
    big = np.kron(_gradient(11, 17, seed=2), np.ones((4, 4, 1))).astype(
        np.uint8
    )
    a = decode_jpeg_pixels(encode_jpeg(big, quality=85, subsample=True))
    b = decode_jpeg_pixels(
        encode_jpeg(big, quality=85, subsample=True, restart_interval=2)
    )
    assert np.array_equal(a, b)


def test_deterministic_bytes():
    img = _gradient(24, 16)
    assert encode_jpeg(img, quality=90) == encode_jpeg(img, quality=90)


def test_rejects_outside_baseline_scope():
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\x89PNG") is None
    assert decode_jpeg_pixels(b"\xff\xd8\x00\x01") is None
    good = encode_jpeg(_gradient(16, 16), quality=90)
    assert decode_jpeg_pixels(good[:40]) is None  # truncated pre-scan
    assert decode_jpeg_pixels(good[:-30]) is None  # truncated mid-scan
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    prog = bytearray(good)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(prog)) is None


def test_decode_pixels_dispatch():
    img = _gradient(18, 14)
    fmt, px = decode_pixels(encode_jpeg(img, quality=95))
    assert fmt == "jpeg"
    assert px.shape == img.shape
    assert _err(px, img).mean() < 2.0 and _err(px, img).max() <= 8


def test_zigzag_is_a_permutation_with_standard_corners():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[0] == 0 and ZIGZAG[1] == 1 and ZIGZAG[2] == 8
    assert ZIGZAG[63] == 63


def test_canonical_code_assignment_is_prefix_free():
    codes = _canonical_codes(*_DC_LUMA)
    seen = set()
    for sym, (code, length) in codes.items():
        bits = format(code, f"0{length}b")
        for other, (c2, l2) in codes.items():
            if other != sym:
                b2 = format(c2, f"0{l2}b")
                assert not b2.startswith(bits) or len(b2) == len(bits)
        assert (code, length) not in seen
        seen.add((code, length))


@pytest.mark.parametrize("h,w", [(8, 8), (9, 8), (8, 9), (1, 1), (7, 31)])
def test_dimension_edge_cases(h, w):
    img = _gradient(h, w)
    out = decode_jpeg_pixels(encode_jpeg(img, quality=92))
    assert out.shape == (h, w, 3)
    assert _err(out, img).mean() < 6.0


def test_progressive_decode_matches_baseline_exactly():
    """The progressive encoder writes the SAME quantized coefficients
    as the baseline encoder, so decoding the SOF2 stream must equal
    decoding the SOF0 stream pixel-for-pixel — this pins the whole
    progressive scan machinery (DC first/refine, AC first with EOB
    runs, AC refinement correction bits, spectral selection, 4:2:0
    non-interleaved AC grids) against the already-trusted sequential
    path rather than against its own encoder."""
    import numpy as np

    from skdist_spark.operators.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    smooth = (
        (np.add.outer(np.arange(33) * 3, np.arange(41) * 2)[..., None] % 256)
        .astype(np.uint8)
        .repeat(3, axis=2)
    )
    cases = [
        (rng.integers(0, 256, (16, 16), dtype=np.uint8), {}),
        (rng.integers(0, 256, (24, 17, 3), dtype=np.uint8), {}),
        (smooth, {}),  # sparse AC bands: long EOB runs
        (rng.integers(0, 256, (40, 40, 3), dtype=np.uint8), {"subsample": True}),
        (rng.integers(0, 256, (19, 23, 3), dtype=np.uint8), {"al": 2}),
        (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), {"bands": ((1, 63),)}),
        (rng.integers(0, 256, (8, 8), dtype=np.uint8), {}),
        (
            rng.integers(0, 256, (64, 48, 3), dtype=np.uint8),
            {"subsample": True, "al": 2, "bands": ((1, 2), (3, 20), (21, 63))},
        ),
    ]
    for px, kw in cases:
        base = decode_jpeg_pixels(
            encode_jpeg(px, quality=85, subsample=kw.get("subsample", False))
        )
        prog = decode_jpeg_pixels(encode_jpeg_progressive(px, quality=85, **kw))
        assert prog is not None, kw
        assert base.shape == prog.shape, kw
        assert (base == prog).all(), (
            kw,
            int(np.abs(base.astype(int) - prog.astype(int)).max()),
        )


def test_progressive_rejects_out_of_scope():
    from skdist_spark.operators.jpeg import decode_jpeg_pixels

    # arithmetic-coded SOF9 still returns None (out of scope)
    import struct

    sof9 = bytearray(b"\xff\xd8")
    sof9 += b"\xff\xc9" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    sof9 += b"\xff\xd9"
    assert decode_jpeg_pixels(bytes(sof9)) is None
