"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool stages.

Per the brief, the image/audio codec libraries are NOT in this
container, so the codec call itself is stubbed: ``DecodeImage`` (and
friends) either raise ``NotImplementedError`` (strict mode) or run a
deterministic fake decoder that parses our synthetic payload header.
Everything AROUND the codec — the schema contract, actor-pool
signature, batch sizing for MB-scale binary cells, and the output
layout — is real and tested.

Synthetic payload format (deterministic): a 16-byte header
``b"SODIMG" + uint16 width + uint16 height + uint16 channels + 4 pad``
followed by ``width*height*channels`` bytes of seeded noise. The fake
decoder parses the header and returns real numpy arrays, so downstream
stages (resize, feature extraction) run genuinely.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"SODIMG"
HEADER = struct.Struct("<6sHHH4x")

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
    ]
)


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching IMAGE_SCHEMA."""
    rng = np.random.default_rng(seed)
    payloads, ws, hs, cs = [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        c = 3
        body = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        payloads.append(HEADER.pack(MAGIC, w, h, c) + body)
        ws.append(w)
        hs.append(h)
        cs.append(c)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
        }
    )


def fake_decode(payload: bytes) -> np.ndarray:
    """Parse the synthetic header into an (h, w, c) uint8 array."""
    magic, w, h, c = HEADER.unpack_from(payload)
    if magic != MAGIC:
        raise ValueError("not a SODIMG payload")
    body = np.frombuffer(payload, dtype=np.uint8, offset=HEADER.size)
    return body[: w * h * c].reshape(h, w, c)


class DecodeImage:
    """Actor-pool decode stage. ``strict=True`` raises
    NotImplementedError at the codec boundary (no image libs in this
    container); ``strict=False`` uses the deterministic fake decoder.

    Real-deployment notes baked into the signature: small batch_size
    (binary cells are MB-scale — batch × concurrency must fit worker
    heap), decode state in __init__ (a real build would load the codec
    or a GPU context here, once per actor)."""

    def __init__(self, strict: bool = False, out_col: str = "decoded_mean"):
        self.strict = strict
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "run with strict=False for the deterministic fake decoder"
            )
        means, oks = [], []
        for p in batch["payload"].to_pylist():
            try:
                img = fake_decode(p)
                means.append(float(img.mean()))
                oks.append(True)
            except (ValueError, struct.error):
                means.append(float("nan"))
                oks.append(False)
        out = batch.drop_columns(["payload"])  # payload never travels on
        out = out.append_column(self.out_col, pa.array(means, pa.float64()))
        return out.append_column("decode_ok", pa.array(oks, pa.bool_()))


class ResizeImage:
    """Actor-pool resize: fake-decode → nearest-neighbour resize →
    feature row (mean per channel). Demonstrates the decode→transform
    chain with real Ray plumbing."""

    def __init__(self, target: tuple[int, int] = (16, 16)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        feats = []
        for p in batch["payload"].to_pylist():
            img = fake_decode(p)
            h, w, c = img.shape
            yi = (np.arange(th) * h // th).astype(np.int64)
            xi = (np.arange(tw) * w // tw).astype(np.int64)
            small = img[yi][:, xi]
            feats.append(small.mean(axis=(0, 1)).astype(np.float32))
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "channel_means", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


def frame_sample_plan(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan (video stub): indices
    0, every, 2*every, ... < n_frames."""
    return list(range(0, n_frames, max(1, every)))


# ---------------------------------------------------------------------------
# Audio modality (same pattern: opaque binary + typed metadata)
# ---------------------------------------------------------------------------

AUDIO_MAGIC = b"SODAUD"
AUDIO_HEADER = struct.Struct("<6sIH4x")  # magic, sample_rate, channels

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
    ]
)


def synth_audio(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake audio table: int16 PCM-ish noise payloads."""
    rng = np.random.default_rng(seed)
    payloads, rates, lens = [], [], []
    for _ in range(n):
        sr = int(rng.choice([8000, 16000]))
        ns = int(rng.integers(100, 2000))
        body = rng.integers(-(1 << 15), 1 << 15, size=ns, dtype=np.int16).tobytes()
        payloads.append(AUDIO_HEADER.pack(AUDIO_MAGIC, sr, 1) + body)
        rates.append(sr)
        lens.append(ns)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio"] * n, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int64()),
        }
    )


class AudioFeatures:
    """Actor-pool audio feature stage. ``strict=True`` raises at the
    codec boundary (no audio libs here); otherwise the deterministic
    fake decoder parses the PCM payload and computes RMS energy +
    zero-crossing rate — real numpy work on real plumbing."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio codec not available in this environment; "
                "run with strict=False for the deterministic fake decoder"
            )
        rms, zcr, oks = [], [], []
        for p in batch["payload"].to_pylist():
            magic, sr, ch = AUDIO_HEADER.unpack_from(p)
            if magic != AUDIO_MAGIC:
                rms.append(float("nan"))
                zcr.append(float("nan"))
                oks.append(False)
                continue
            x = np.frombuffer(p, dtype=np.int16, offset=AUDIO_HEADER.size).astype(
                np.float64
            )
            rms.append(float(np.sqrt(np.mean(x * x))) if x.size else 0.0)
            zcr.append(
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if x.size > 1
                else 0.0
            )
            oks.append(True)
        out = batch.drop_columns(["payload"])
        out = out.append_column("rms", pa.array(rms, pa.float64()))
        out = out.append_column("zcr", pa.array(zcr, pa.float64()))
        return out.append_column("decode_ok", pa.array(oks, pa.bool_()))
