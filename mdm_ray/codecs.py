"""Pure-NumPy media codecs for header-simple public formats.

No third-party image/audio libraries exist in this environment, but three
public formats are simple enough to decode from scratch with ``struct`` +
NumPy — which turns the media stage from a stub into a real, testable codec
path (the remaining formats — JPEG/PNG/MP3/MP4 — still raise in strict mode):

* **BMP** (Windows bitmap, ``BM`` magic): 14-byte file header + 40-byte
  BITMAPINFOHEADER, uncompressed 24-bit BGR, rows bottom-up, each row padded
  to 4 bytes. (Format spec is public: Windows BITMAPFILEHEADER /
  BITMAPINFOHEADER documentation.)
* **PPM** (Netpbm ``P6``): ASCII header ``P6 <w> <h> <maxval>`` + raw RGB.
* **WAV** (RIFF/WAVE): ``fmt `` chunk (PCM, channels, sample rate, 16-bit)
  + ``data`` chunk of little-endian int16 samples.

Encoders exist so tests and fixtures can synthesize real files
deterministically — they are exact inverses of the decoders for the
supported subset (24-bit BMP, P6 PPM, PCM16 WAV).

All decode functions take ``bytes`` and return NumPy arrays + plain-Python
metadata; they never touch Ray — the Dataset plumbing lives in ``media.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """[H, W, 3] uint8 RGB → 24-bit uncompressed BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp expects [H, W, 3] uint8")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    data_offset = 14 + 40
    file_size = data_offset + pixel_bytes
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    # BITMAPINFOHEADER: size, w, h (positive => bottom-up), planes, bpp,
    # compression=0 (BI_RGB), image size, ppm x/y, palette counts
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = rgb[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → [H, W, 3] uint8 RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (header={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only 24-bit BI_RGB is implemented"
        )
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if h_signed > 0:  # bottom-up storage
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# PPM (P6 binary)
# ---------------------------------------------------------------------------


def encode_ppm(rgb: np.ndarray) -> bytes:
    """[H, W, 3] uint8 RGB → binary P6 PPM bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_ppm expects [H, W, 3] uint8")
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + rgb.tobytes()


def _ppm_tokens(data: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated ints after the magic, skipping
    ``#`` comments; returns (values, offset just past the final separator)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(data)
    while len(vals) < count:
        while i < n and data[i : i + 1].isspace():
            i += 1
        if i < n and data[i : i + 1] == b"#":
            while i < n and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(data[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte follows maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 PPM bytes → [H, W, 3] uint8 RGB."""
    if len(data) < 10 or data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), off = _ppm_tokens(data, 3)
    if maxval != 255:
        raise ValueError("only maxval=255 PPM is implemented")
    need = off + w * h * 3
    if len(data) < need:
        raise ValueError("truncated PPM payload")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """[N] or [N, C] int16 samples → RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes → ([N, C] int16 samples, sample_rate)."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    raw = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (clen,) = struct.unpack_from("<I", data, i + 4)
        chunk = data[i + 8 : i + 8 + clen]
        if len(chunk) < clen:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            raw = chunk
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            "only PCM16 is implemented"
        )
    samples = np.frombuffer(raw, dtype="<i2")
    n = len(samples) // ch
    return samples[: n * ch].reshape(n, ch).copy(), sample_rate


# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format sniff: 'bmp' | 'ppm' | 'wav' | None (unknown)."""
    if len(data) >= 2 and data[:2] == b"BM":
        return "bmp"
    if len(data) >= 2 and data[:2] == b"P6":
        return "ppm"
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode an image payload → [H, W, 3] uint8 RGB."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        f"image format {fmt or 'unknown'} not decodable without codec "
        "libraries; supported from-scratch formats: BMP (24-bit), PPM (P6)"
    )


# ---------------------------------------------------------------------------
# deterministic fixture synthesis (content-seeded, no RNG state)
# ---------------------------------------------------------------------------


def synth_rgb(seed_text: str, h: int = 16, w: int = 16) -> np.ndarray:
    """Deterministic [h, w, 3] uint8 image derived from a string seed —
    a smooth per-channel gradient pattern so channel means/histograms are
    non-trivial and reproducible at any parallelism."""
    import hashlib

    d = hashlib.sha256(seed_text.encode()).digest()
    base = np.frombuffer(d, dtype=np.uint8)[:3].astype(np.int32)
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        ((base[c] + (xx * (c + 1) + yy * (3 - c)) * 7) % 256).astype(np.uint8)
        for c in range(3)
    ]
    return np.stack(chans, axis=2)


def synth_pcm(seed_text: str, n: int = 800, sample_rate: int = 8000) -> np.ndarray:
    """Deterministic [n] int16 sawtooth tone derived from a string seed.

    Integer arithmetic ONLY (``m * (((i*step) mod 4096) - 2048)``) so an
    independent reimplementation (e.g. a SQL oracle) reproduces samples
    bit-exactly — float ``sin`` would differ in final ulps across libms."""
    import hashlib

    d = hashlib.sha256(seed_text.encode()).digest()
    step = 16 + (d[0] % 240)   # sawtooth increment per sample
    m = 1 + (d[1] % 15)        # amplitude multiplier, |sample| <= 30720
    i = np.arange(n, dtype=np.int64)
    return (m * ((i * step) % 4096 - 2048)).astype(np.int16)
