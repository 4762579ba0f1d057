"""Multimodal (image/audio/video) stage plumbing.

Media rides as opaque ``binary`` payload columns + typed metadata structs
(matching the interleaved-span model's ``media_ref`` keys). The codec core:

* ``mode="strict"`` → REAL pure-NumPy decode for header-simple public
  formats — BMP (24-bit), PPM (P6), WAV (PCM16) — implemented from scratch
  in ``codecs.py``; formats that need codec libraries absent from this
  container (JPEG/PNG/MP3/MP4) raise NotImplementedError, clearly marked.
* ``mode="fake"``   → deterministic synthetic decode (content-seeded), kept
  for plumbing tests that don't care about pixel values.

All stages are callable-class actor pools (decoder state built once per
actor, ``map_batches(Cls, concurrency=..., batch_size=...)``) with SMALL batch
sizes — large binary payloads must not be batched by row-count heuristics.
Decode loops are per-row by nature (opaque variable-size binaries), which is
fine: the cost is in the decode kernel, not loop overhead, and batches are
deliberately small.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from . import codecs

MEDIA_META_TYPE = pa.struct(
    [
        ("media_ref", pa.string()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_payload(media_ref: str, size: int = 256) -> bytes:
    """Deterministic fake payload for a media_ref (tests / fake decode)."""
    seed = hashlib.sha256(media_ref.encode()).digest()
    reps = -(-size // len(seed))
    return (seed * reps)[:size]


def _resize_nearest(rgb: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy index gather)."""
    sh, sw = rgb.shape[:2]
    if (sh, sw) == (h, w):
        return rgb
    yy = (np.arange(h) * sh // h).clip(0, sh - 1)
    xx = (np.arange(w) * sw // w).clip(0, sw - 1)
    return rgb[yy[:, None], xx[None, :]]


class ImageDecoder:
    """Actor-pool stage: binary payload -> decoded HxWx3 uint8 tensor column.

    ``strict`` mode really decodes BMP (24-bit) / PPM (P6) payloads via the
    from-scratch codecs in ``codecs.py`` (unknown formats raise); decoded
    images are nearest-neighbor resized to ``out_hw`` so downstream feature
    batches are fixed-width. ``fake`` mode emits a deterministic tensor
    derived from the payload bytes (plumbing tests).
    """

    def __init__(self, mode: str = "strict", out_hw: tuple[int, int] = (8, 8)):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode
        self.h, self.w = out_hw

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.mode == "strict":
            return _resize_nearest(codecs.decode_image(payload), self.h, self.w)
        need = self.h * self.w * 3
        buf = (payload * (-(-need // max(1, len(payload)))))[:need]
        return np.frombuffer(buf, dtype=np.uint8).reshape(self.h, self.w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        tensors = [self.decode_one(p) for p in payloads]
        flat = pa.array(
            [t.ravel() for t in tensors], pa.list_(pa.uint8())
        )
        return batch.append_column("pixels", flat).append_column(
            "pixel_shape",
            pa.array([[self.h, self.w, 3]] * batch.num_rows, pa.list_(pa.int32())),
        )


class AudioDecoder:
    """Actor-pool stage: WAV payload -> (duration_ms, rms, sample_rate,
    n_samples) scalar feature columns via the from-scratch PCM16 decoder.
    ``fake`` mode derives the same columns from the payload bytes."""

    def __init__(self, mode: str = "strict"):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode

    def decode_one(self, payload: bytes) -> tuple[float, float, int, int]:
        if self.mode == "strict":
            samples, rate = codecs.decode_wav(payload)
            mono = samples.astype(np.float64).mean(axis=1)
            rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
            return len(mono) * 1000.0 / rate, rms, rate, len(mono)
        arr = np.frombuffer(payload[: len(payload) - len(payload) % 2],
                            dtype="<i2").astype(np.float64)
        rms = float(np.sqrt(np.mean(arr**2))) if len(arr) else 0.0
        return len(arr) * 1000.0 / 8000, rms, 8000, len(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [self.decode_one(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "duration_ms": pa.array([d[0] for d in decoded], pa.float64()),
                "rms": pa.array([d[1] for d in decoded], pa.float64()),
                "sample_rate": pa.array([d[2] for d in decoded], pa.int32()),
                "n_samples": pa.array([d[3] for d in decoded], pa.int64()),
            }
        )


class ImageFeatureExtractor:
    """Actor-pool stage: decoded pixels -> small feature vector (channel means
    + histogram) — stands in for a real vision model's embedding head."""

    def __init__(self, bins: int = 8):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for pix, shape in zip(batch["pixels"].to_pylist(), batch["pixel_shape"].to_pylist()):
            arr = np.array(pix, dtype=np.uint8).reshape(shape)
            means = arr.reshape(-1, shape[2]).mean(axis=0) / 255.0
            hist, _ = np.histogram(arr, bins=self.bins, range=(0, 255))
            hist = hist / max(1, hist.sum())
            feats.append(np.concatenate([means, hist]).astype(np.float32).tolist())
        return batch.append_column("media_embedding", pa.array(feats, pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool stage: video payload -> N deterministic frame payloads
    (fake mode slices the byte stream; real mode would demux)."""

    def __init__(self, num_frames: int = 4, mode: str = "fake"):
        self.num_frames = num_frames
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError("video demuxer not available; use mode='fake'")
        out_ref, out_idx, out_payload = [], [], []
        for ref, payload in zip(batch["media_ref"].to_pylist(), batch["payload"].to_pylist()):
            n = max(1, len(payload) // self.num_frames)
            for i in range(self.num_frames):
                out_ref.append(ref)
                out_idx.append(i)
                out_payload.append(payload[i * n: (i + 1) * n] or payload[:n])
        return pa.table(
            {
                "media_ref": pa.array(out_ref, pa.string()),
                "frame_index": pa.array(out_idx, pa.int32()),
                "payload": pa.array(out_payload, pa.binary()),
            }
        )


def media_table_from_refs(refs: list[str], mime: str = "image/fake",
                          kind: str = "opaque", hw: tuple[int, int] = (16, 16),
                          wav_samples: int = 800) -> pa.Table:
    """Build a media table (media_ref, meta, payload) from refs.

    ``kind``: ``"opaque"`` (content-seeded bytes, fake-mode plumbing),
    ``"bmp"`` / ``"ppm"`` (real deterministic images encoded with the
    from-scratch codecs), ``"wav"`` (real PCM16 tones). Real kinds are
    decodable by the strict-mode stages."""
    h, w = hw
    if kind == "opaque":
        payloads = [synth_media_payload(r) for r in refs]
        metas = [
            {"media_ref": r, "mime": mime, "width": 8, "height": 8, "duration_ms": 0}
            for r in refs
        ]
    elif kind in ("bmp", "ppm"):
        enc = codecs.encode_bmp if kind == "bmp" else codecs.encode_ppm
        payloads = [enc(codecs.synth_rgb(r, h, w)) for r in refs]
        metas = [
            {"media_ref": r, "mime": f"image/{kind}", "width": w, "height": h,
             "duration_ms": 0}
            for r in refs
        ]
    elif kind == "wav":
        rate = 8000
        payloads = [
            codecs.encode_wav(codecs.synth_pcm(r, wav_samples, rate), rate)
            for r in refs
        ]
        metas = [
            {"media_ref": r, "mime": "audio/wav", "width": 0, "height": 0,
             "duration_ms": int(wav_samples * 1000 / rate)}
            for r in refs
        ]
    else:
        raise ValueError(kind)
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "meta": pa.array(metas, MEDIA_META_TYPE),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def decode_pipeline(media_ds, concurrency=(1, 4), batch_size: int = 64,
                    mode: str = "strict", out_hw: tuple[int, int] = (8, 8)):
    """media table -> decoded + feature-extracted Dataset (actor pools,
    small batches because payloads are large)."""
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"mode": mode, "out_hw": out_hw},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def audio_pipeline(media_ds, concurrency=(1, 4), batch_size: int = 64,
                   mode: str = "strict"):
    """media table of WAV payloads -> scalar audio features Dataset."""
    return media_ds.map_batches(
        AudioDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
