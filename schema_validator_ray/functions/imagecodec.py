"""Deterministic stand-in image codec.

The container has no real image libraries (no PIL / cv2), so the decode step the
north rule requires is implemented against a tiny deterministic codec with the same
*shape* as a real one: an opaque ``bytes`` payload that (a) round-trips grayscale
pixel arrays, (b) is lossless for "png" and lossy-but-PSNR>=40dB for "jpeg"/"webp"
(2-bit quantization => PSNR ~47 dB), and (c) fails loudly on truncation/corruption.
All Ray-side plumbing (schema, batch sizing, actor signature, violation emission)
is real and tested; swapping in PIL decode is a one-function change here.

Payload layout: b"FIMG" | fmt_code u8 | w u32le | h u32le | zlib(payload).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"FIMG"
FMT_CODES = {"png": 0, "jpeg": 1, "webp": 2}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}
LOSSY = {"jpeg", "webp"}
_Q_SHIFT = 2  # lossy quantization: drop 2 LSBs -> max error 3, PSNR ~ 43-48 dB


class CodecError(ValueError):
    """Raised on undecodable payloads (truncated / corrupt / unknown format)."""


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if pixels.dtype != np.uint8 or pixels.ndim != 2:
        raise ValueError("pixels must be 2-D uint8 (grayscale)")
    h, w = pixels.shape
    if fmt not in FMT_CODES:
        raise CodecError(f"unknown format {fmt!r}")
    if fmt in LOSSY:
        payload = (pixels >> _Q_SHIFT).astype(np.uint8).tobytes()
    else:
        payload = pixels.tobytes()
    header = MAGIC + struct.pack("<BII", FMT_CODES[fmt], w, h)
    return header + zlib.compress(payload, level=1)


def decode(data: bytes) -> tuple[np.ndarray, str, int, int]:
    """Returns (pixels HxW uint8, fmt, w, h). Raises CodecError on bad input."""
    if len(data) < 13 or data[:4] != MAGIC:
        raise CodecError("bad magic / truncated header")
    code, w, h = struct.unpack("<BII", data[4:13])
    fmt = FMT_NAMES.get(code)
    if fmt is None:
        raise CodecError(f"unknown format code {code}")
    try:
        raw = zlib.decompress(data[13:])
    except zlib.error as e:
        raise CodecError(f"corrupt payload: {e}") from None
    if len(raw) != w * h:
        raise CodecError(f"payload size {len(raw)} != {w}x{h}")
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
    if fmt in LOSSY:
        # dequantize to bucket centers
        px = np.minimum(px.astype(np.uint16) << _Q_SHIFT, 255).astype(np.uint8)
        px = np.minimum(px + (1 << (_Q_SHIFT - 1)), 255).astype(np.uint8)
    return px, fmt, w, h


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(pixels: np.ndarray) -> int:
    """8x8 average-hash of the image -> signed int64 (the table's phash column)."""
    h, w = pixels.shape
    # block-mean downsample to 8x8 (pad to a multiple of 8 by edge-clipping)
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = pixels[ys[i]:max(ys[i + 1], ys[i] + 1),
                                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def intensity_histogram(pixels: np.ndarray, bins: int = 16) -> np.ndarray:
    """Fixed-bin pixel-intensity histogram (drift feature), int64[bins]."""
    hist, _ = np.histogram(pixels, bins=bins, range=(0, 256))
    return hist.astype(np.int64)
