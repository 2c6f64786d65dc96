"""Image payload codecs — pure numpy + zlib, no external image libs.

The container has no PIL/libjpeg, so:

* ``png``  — a real, spec-conformant PNG codec (8-bit RGB, filter 0/1/2,
  zlib DEFLATE). Lossless: decode(encode(x)) == x exactly. Any standard
  viewer opens the output.
* ``jpeg`` — DETERMINISTIC FAKE LOSSY CODEC ("FLC1"). The real decode
  step is stubbed per the build contract: we emulate lossy compression
  by 6-bit uniform quantization (+ zlib), which is deterministic and
  yields PSNR ≈ 46 dB — comfortably above the ≥40 dB per-row fidelity
  gate (BASELINE.json input_hint). Swap `encode_lossy/decode_lossy` for
  libjpeg bindings in production; every Spark-side contract (binary
  column in, HxWx3 uint8 out) is identical.

These run inside Arrow-batched pandas UDFs (one Python call per batch of
~10k rows, tiny images), never per-row Spark Python UDFs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 (None) prepended to each scanline, vectorized
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an RGB8 PNG produced by any encoder using filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).reshape(h, w, 3)
    if np.any(filters):  # our encoder always writes 0; handle 1-4 for foreign PNGs
        bpp = 3
        flat = out.reshape(h, w * bpp)
        for y in range(h):
            f = filters[y]
            if f == 0:
                continue
            prev = flat[y - 1] if y > 0 else np.zeros(w * bpp, dtype=np.int32)
            row = flat[y]
            if f == 2:  # Up
                flat[y] = (row + prev) & 0xFF
            else:  # Sub/Average/Paeth need a serial scan
                for x in range(w * bpp):
                    a = flat[y, x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if (x >= bpp and y > 0) else 0
                    if f == 1:
                        pred = a
                    elif f == 3:
                        pred = (a + b) // 2
                    else:  # Paeth
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    flat[y, x] = (row[x] + pred) & 0xFF
    return out.astype(np.uint8)


_FLC_SIG = b"FLC1"
_FLC_SHIFT = 2  # 6-bit quantization: step 4 → MSE ≈ 4²/12 ≈ 1.33 → PSNR ≈ 46.9 dB


def encode_lossy(img: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE of a lossy (JPEG-like) encoder — see module doc."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {img.shape} {img.dtype}")
    h, w, _ = img.shape
    q = (img.astype(np.uint16) + (1 << (_FLC_SHIFT - 1))) >> _FLC_SHIFT
    q = np.minimum(q, 255 >> _FLC_SHIFT).astype(np.uint8)
    return _FLC_SIG + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != _FLC_SIG:
        raise ValueError("not an FLC1 payload")
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return (q.astype(np.uint16) << _FLC_SHIFT).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on the `fmt` column of the image table → (h, w, 3) uint8."""
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":  # FLC1 stand-in, see module docstring
        return decode_lossy(data)
    raise NotImplementedError(f"unsupported image format: {fmt!r}")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return encode_lossy(img)
    raise NotImplementedError(f"unsupported image format: {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
