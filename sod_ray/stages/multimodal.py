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


# ---------------------------------------------------------------------------
# Real stdlib-decodable codecs: BMP (pure numpy) and WAV (stdlib `wave`).
# These close the strict-mode codec boundary for the two formats that
# need no third-party libraries; every other format still raises
# NotImplementedError at exactly the codec call.
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed (BI_RGB) BMP writer for an
    (h, w, 3) uint8 RGB array — bottom-up rows, 4-byte row padding."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp wants (h, w, 3) uint8 RGB")
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    off = 14 + 40
    file_size = off + len(data)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for 24-bit uncompressed (BI_RGB) BMP →
    (h, w, 3) uint8 RGB. Supports the bottom-up and top-down (negative
    height) row orders; anything else raises ValueError."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8, offset=off,
                         count=h * row_bytes)
    rows = body.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up storage
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """Stdlib `wave` writer: int16 PCM samples → RIFF/WAVE bytes."""
    import io
    import wave

    if samples.dtype != np.int16:
        raise ValueError("encode_wav wants int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Stdlib `wave` decoder: RIFF/WAVE bytes → ((n, channels) int16
    array, sample_rate). 16-bit PCM only (the `wave` module's lane)."""
    import io
    import wave

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n = wf.getnframes()
        raw = wf.readframes(n)
        x = np.frombuffer(raw, dtype=np.int16).reshape(-1, wf.getnchannels())
        return x, wf.getframerate()


def synth_bmp_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REAL BMP files
    (IMAGE_SCHEMA, media_type='image/bmp')."""
    rng = np.random.default_rng(seed)
    payloads, ws, hs = [], [], []
    for _ in range(n):
        w = int(rng.integers(5, 40))
        h = int(rng.integers(5, 40))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(encode_bmp(img))
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/bmp"] * n, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "channels": pa.array([3] * n, pa.int32()),
        }
    )


def synth_wav_audio(n: int, seed: int = 42) -> pa.Table:
    """Deterministic audio table whose payloads are REAL WAV files
    (AUDIO_SCHEMA, media_type='audio/wav')."""
    rng = np.random.default_rng(seed)
    payloads, rates, lens = [], [], []
    for _ in range(n):
        sr = int(rng.choice([8000, 16000]))
        ns = int(rng.integers(100, 2000))
        x = rng.integers(-(1 << 15), 1 << 15, size=ns, dtype=np.int16)
        payloads.append(encode_wav(x, sr, 1))
        rates.append(sr)
        lens.append(ns)
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["audio/wav"] * n, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int64()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage. ``strict=True`` decodes REAL formats:
    BMP (24-bit BI_RGB, pure-numpy parser — no third-party libs) works
    end to end; any other real format (JPEG/PNG/...) raises
    NotImplementedError at exactly the codec call, since those codec
    libraries are not in this container. ``strict=False`` additionally
    accepts the deterministic SODIMG fake payloads (and BMP).

    Real-deployment notes baked into the signature: small batch_size
    (binary cells are MB-scale — batch × concurrency must fit worker
    heap), decode state in __init__ (a real build would load the codec
    or a GPU context here, once per actor)."""

    def __init__(self, strict: bool = False, out_col: str = "decoded_mean"):
        self.strict = strict
        self.out_col = out_col

    def _decode(self, p: bytes) -> np.ndarray:
        if p[:2] == b"BM":
            return decode_bmp(p)  # real stdlib-free codec path
        if self.strict:
            raise NotImplementedError(
                "no codec for this image format in this environment "
                "(only BMP decodes without third-party libs); run with "
                "strict=False for the deterministic fake decoder"
            )
        return fake_decode(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, oks = [], []
        for p in batch["payload"].to_pylist():
            try:
                img = self._decode(p)
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
    """Actor-pool audio feature stage. ``strict=True`` decodes REAL
    WAV payloads with the stdlib ``wave`` module (16-bit PCM) — the
    codec boundary is genuinely closed for that format; any other real
    format (MP3/FLAC/...) raises NotImplementedError at exactly the
    codec call. ``strict=False`` additionally accepts the SODAUD fake
    payloads. Features: RMS energy + zero-crossing rate (mono-mixed)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _samples(self, p: bytes) -> np.ndarray | None:
        """Decode one payload to float64 mono samples (None = bad)."""
        if p[:4] == b"RIFF":
            x, _sr = decode_wav(p)  # real stdlib codec path
            return x.astype(np.float64).mean(axis=1)
        if self.strict:
            raise NotImplementedError(
                "no codec for this audio format in this environment "
                "(only WAV decodes via the stdlib); run with "
                "strict=False for the deterministic fake decoder"
            )
        magic, _sr, _ch = AUDIO_HEADER.unpack_from(p)
        if magic != AUDIO_MAGIC:
            return None
        return np.frombuffer(
            p, dtype=np.int16, offset=AUDIO_HEADER.size
        ).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr, oks = [], [], []
        for p in batch["payload"].to_pylist():
            try:
                x = self._samples(p)
            except (ValueError, struct.error, EOFError):
                x = None
            if x is None:
                rms.append(float("nan"))
                zcr.append(float("nan"))
                oks.append(False)
                continue
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
