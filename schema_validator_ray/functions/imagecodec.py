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

# optional real-decoder seam: when PIL is importable, decode() falls through
# to it for any payload that is NOT stand-in (FIMG) framed — so pointing the
# engine at real JPEG/PNG/WebP files works the day the environment has
# codecs, while FIMG payloads take the byte-identical stand-in branch first
try:                                              # pragma: no cover - env
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:                               # the shipped container
    _PILImage = None
    HAVE_PIL = False


def _pil_decode(data) -> tuple[np.ndarray, str, int, int]:
    """Real-codec branch: grayscale pixels via PIL. Only reachable when the
    payload is not FIMG-framed and PIL is installed."""
    import io

    try:
        with _PILImage.open(io.BytesIO(bytes(data))) as im:
            fmt = (im.format or "").lower()
            if fmt == "jpg":
                fmt = "jpeg"
            px = np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception as e:  # PIL raises a zoo of types on corrupt input
        raise CodecError(f"undecodable image payload: {e}") from None
    h, w = px.shape
    return px, fmt, w, h


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


def decode(data) -> tuple[np.ndarray, str, int, int]:
    """Returns (pixels HxW uint8, fmt, w, h). Raises CodecError on bad input.
    Accepts bytes or any buffer (e.g. a zero-copy Arrow memoryview).

    FIMG-framed payloads always take the stand-in branch (byte-identical
    whether or not PIL is installed); anything else goes to PIL when
    available, else raises CodecError as before."""
    if len(data) < 13 or bytes(data[:4]) != MAGIC:
        if HAVE_PIL and len(data) >= 4 and bytes(data[:4]) != MAGIC:
            return _pil_decode(data)
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
    """8x8 block-mean average-hash -> signed int64 (the table's phash column).
    Vectorized with two axis reductions (np.add.reduceat) — one pass over the
    pixels instead of an integral image, so memory traffic is ~1x the image.
    Block sums of uint8 stay < 2^53: float means are bit-identical to a direct
    ``.mean()`` per block."""
    h, w = pixels.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    # guards only matter for h<8 / w<8 (y1/x1 may then repeat — recompute edges)
    row_red = np.add.reduceat(pixels, y0, axis=0, dtype=np.int64)  # (8, w)
    sums = np.add.reduceat(row_red, x0, axis=1)                    # (8, 8)
    if h < 8 or w < 8:
        # reduceat's degenerate-segment semantics differ; fall back to slices
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = pixels[y0[i]:y1[i], x0[j]:x1[j]].mean()
    else:
        areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
        blocks = sums / areas
    bits = (blocks > blocks.mean()).ravel()
    val = np.bitwise_or.reduce(_PHASH_POW[bits]) if bits.any() else np.uint64(0)
    return int(val.astype(np.int64))


_PHASH_POW = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def intensity_histogram(pixels: np.ndarray, bins: int = 16) -> np.ndarray:
    """Fixed-bin pixel-intensity histogram (drift feature), int64[bins].
    bincount over the top bits == np.histogram with uniform bins on [0,256)."""
    shift = 8 - (bins - 1).bit_length()
    return np.bincount((pixels.ravel() >> shift), minlength=bins).astype(np.int64)
