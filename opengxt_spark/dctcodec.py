"""Pure-numpy lossy image codec: 8x8 block DCT + quantization + Deflate.

Built from the public JPEG specification (ITU-T T.81): the same 8x8
type-II DCT, the Annex K luminance quantization table, and the IJG
quality-scaling rule. The entropy stage is stdlib zlib instead of Huffman
(simpler, still a real compressor), and channels are coded independently in
RGB (no chroma subsampling) — so this is not wire-format JPEG, but it is a
genuinely LOSSY transform codec: coefficients are divided by the quant
table and rounded, and the reconstruction differs from the source.

Purpose (VERDICT r3 item #4): the BASELINE.json per-row invariant
"decoded-pixel allclose (PSNR >= 40 dB) for lossy formats" needs an
actually-lossy path to run against; the container has no image libraries,
and this module exercises the contract with no dependency beyond numpy.

Format: little-endian header  magic 'DCT1' | u16 w | u16 h | u8 channels |
u8 quality  followed by zlib-compressed int16 quantized coefficients in
block-raster order (per channel, blocks row-major, 64 coeffs row-major).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"DCT1"

#: ITU-T T.81 Annex K, Table K.1 — luminance quantization values.
_Q_BASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)

#: Default quality: the synthetic gen_pixels pattern is near-worst-case
#: (mod-256 ramps — energy in the highest DCT bands), and q=96 clears the
#: BASELINE "PSNR >= 40 dB for lossy formats" floor with ~4 dB margin
#: while remaining measurably lossy (PSNR < inf, reconstruction != source).
DEFAULT_QUALITY = 96


def quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling: q in [1,100] -> per-coefficient step sizes."""
    q = min(max(int(quality), 1), 100)
    s = 5000 / q if q < 50 else 200 - 2 * q
    t = np.floor((_Q_BASE * s + 50) / 100)
    return np.clip(t, 1, 255)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis (T @ block @ T.T transforms)."""
    n = 8
    k = np.arange(n)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    t *= np.sqrt(2.0 / n)
    t[0, :] = np.sqrt(1.0 / n)
    return t


_T = _dct_matrix()


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) float -> (nby, nbx, 8, 8) with edge replication padding."""
    h, w = ch.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(blocks), hh // 8, ww // 8


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    ch = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return ch[:h, :w]


def encode(img: np.ndarray, quality: int = DEFAULT_QUALITY) -> bytes:
    """(h, w, c) or (h, w) uint8 -> lossy-coded bytes."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if w > 0xFFFF or h > 0xFFFF or c > 255:
        raise ValueError(f"image too large for DCT1 header: {img.shape}")
    qt = quant_table(quality)
    out = [MAGIC, struct.pack("<HHBB", w, h, c, min(max(quality, 1), 100))]
    coef = []
    for ci in range(c):
        blocks, _, _ = _to_blocks(img[:, :, ci].astype(np.float64) - 128.0)
        # batched orthonormal DCT-II:  T @ B @ T.T  over all blocks at once
        f = np.einsum("ij,yxjk,lk->yxil", _T, blocks, _T, optimize=True)
        coef.append(np.rint(f / qt).astype(np.int16))
    payload = np.concatenate([x.reshape(-1) for x in coef]).tobytes()
    out.append(zlib.compress(payload, 6))
    return b"".join(out)


def decode(data: bytes) -> np.ndarray:
    """Lossy-coded bytes -> (h, w, c) uint8 reconstruction."""
    if data[:4] != MAGIC:
        raise ValueError("not a DCT1 payload")
    w, h, c, quality = struct.unpack_from("<HHBB", data, 4)
    qt = quant_table(quality)
    nby, nbx = -(-h // 8), -(-w // 8)
    per = nby * nbx * 64
    q = np.frombuffer(zlib.decompress(data[10:]), dtype=np.int16)
    if q.size != per * c:
        raise ValueError("DCT1 payload size mismatch")
    chans = []
    for ci in range(c):
        f = q[ci * per:(ci + 1) * per].astype(np.float64).reshape(
            nby, nbx, 8, 8
        ) * qt
        blocks = np.einsum("ji,yxjk,kl->yxil", _T, f, _T, optimize=True)
        ch = _from_blocks(blocks, h, w) + 128.0
        chans.append(ch)
    out = np.stack(chans, axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
