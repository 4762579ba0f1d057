"""Multimodal (image/audio/video) stage plumbing.

Media rides as opaque ``binary`` payload columns + typed metadata structs
(matching the interleaved-span model's ``media_ref`` keys). The actual codec
work (decode / resize / frame-sample / feature-extract) requires image/audio
libraries that are NOT in this container, so the codec core is stubbed:

* ``mode="strict"``  → raises NotImplementedError (clearly marked)
* ``mode="fake"``    → deterministic synthetic decode (content-seeded), so the
  Ray-side plumbing — schema, actor-pool signature, batch sizing, output
  layout — is real and fully tested.

All stages are callable-class actor pools (decoder state built once per
actor, ``map_batches(Cls, concurrency=..., batch_size=...)``) with SMALL batch
sizes — large binary payloads must not be batched by row-count heuristics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


class ImageDecoder:
    """Actor-pool stage: binary payload -> decoded HxWxC uint8 tensor column.

    Real implementation would hold the codec context in __init__ (once per
    actor). ``fake`` mode emits a deterministic 8x8x3 tensor derived from the
    payload bytes so downstream stages are testable.
    """

    def __init__(self, mode: str = "fake", out_hw: tuple[int, int] = (8, 8)):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode
        self.h, self.w = out_hw

    def decode_one(self, payload: bytes) -> np.ndarray:
        if self.mode == "strict":
            raise NotImplementedError(
                "image codec not available in this environment; use mode='fake' "
                "or install a codec library and implement decode_one"
            )
        need = self.h * self.w * 3
        buf = (payload * (-(-need // max(1, len(payload)))))[:need]
        return np.frombuffer(buf, dtype=np.uint8).reshape(self.h, self.w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        tensors = [self.decode_one(p) for p in payloads]
        flat = pa.array(
            [t.ravel().tolist() for t in tensors], pa.list_(pa.uint8())
        )
        return batch.append_column("pixels", flat).append_column(
            "pixel_shape",
            pa.array([[self.h, self.w, 3]] * batch.num_rows, pa.list_(pa.int32())),
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


def media_table_from_refs(refs: list[str], mime: str = "image/fake") -> pa.Table:
    """Build a media table (media_ref, meta, payload) from opaque refs."""
    return pa.table(
        {
            "media_ref": pa.array(refs, pa.string()),
            "meta": pa.array(
                [
                    {"media_ref": r, "mime": mime, "width": 8, "height": 8, "duration_ms": 0}
                    for r in refs
                ],
                MEDIA_META_TYPE,
            ),
            "payload": pa.array([synth_media_payload(r) for r in refs], pa.binary()),
        }
    )


def decode_pipeline(media_ds, concurrency=(1, 4), batch_size: int = 64,
                    mode: str = "fake"):
    """media table -> decoded + feature-extracted Dataset (actor pools,
    small batches because payloads are large)."""
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).map_batches(
        ImageFeatureExtractor,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
