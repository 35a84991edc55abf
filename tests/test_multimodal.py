"""Multimodal plumbing: schema, fake decode, resize, strict stub."""

import numpy as np
import pytest

from sod_ray.stages.multimodal import (
    IMAGE_SCHEMA,
    DecodeImage,
    ResizeImage,
    fake_decode,
    frame_sample_plan,
    synth_media,
)


def test_synth_schema_and_decode():
    t = synth_media(20, seed=42)
    assert t.schema.equals(IMAGE_SCHEMA)
    img = fake_decode(t["payload"][0].as_py())
    assert img.shape == (
        t["height"][0].as_py(),
        t["width"][0].as_py(),
        t["channels"][0].as_py(),
    )
    # deterministic
    t2 = synth_media(20, seed=42)
    assert t["payload"][3].as_py() == t2["payload"][3].as_py()


def test_decode_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_media(50))
    out = ds.map_batches(
        DecodeImage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    assert out["decode_ok"].all()
    assert "payload" not in out.columns  # payload projected away post-decode
    assert out["decoded_mean"].between(0, 255).all()


def test_decode_strict_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_media(5))
    with pytest.raises(Exception) as e:
        ds.map_batches(
            DecodeImage,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            concurrency=1,
        ).materialize()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)


def test_resize_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_media(20))
    out = ds.map_batches(
        ResizeImage, batch_format="pyarrow", batch_size=8, concurrency=2
    ).to_pandas()
    means = np.stack(out["channel_means"].to_numpy())
    assert means.shape == (20, 3)
    assert ((means > 0) & (means < 255)).all()


def test_frame_plan():
    assert frame_sample_plan(10, 3) == [0, 3, 6, 9]
    assert frame_sample_plan(2, 0) == [0, 1]


def test_bmp_roundtrip():
    """Real codec: encode_bmp → decode_bmp is exact, padding included."""
    from sod_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (2, 5), (3, 4), (17, 9), (32, 32)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    with pytest.raises(ValueError):
        decode_bmp(b"not a bmp at all, padded to length 54 ......" + b"\0" * 20)


def test_wav_roundtrip():
    """Real codec: encode_wav → decode_wav is exact (16-bit PCM)."""
    from sod_ray.stages.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    x = rng.integers(-(1 << 15), 1 << 15, size=777, dtype=np.int16)
    got, sr = decode_wav(encode_wav(x, 16000, 1))
    assert sr == 16000 and (got[:, 0] == x).all()
    # stereo
    x2 = rng.integers(-(1 << 15), 1 << 15, size=(100, 2), dtype=np.int16)
    got2, _ = decode_wav(encode_wav(x2.reshape(-1), 8000, 2))
    assert (got2 == x2).all()


def test_decode_strict_real_bmp(ray_session):
    """strict=True genuinely decodes BMP payloads end to end — the
    codec boundary is closed for the stdlib-decodable format."""
    import ray.data as rd

    from sod_ray.stages.multimodal import decode_bmp, synth_bmp_media

    t = synth_bmp_media(30, seed=11)
    assert t.schema.equals(IMAGE_SCHEMA)
    out = (
        rd.from_arrow(t)
        .map_batches(
            DecodeImage,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert out["decode_ok"].all()
    want = [float(decode_bmp(p.as_py()).mean()) for p in t["payload"]]
    assert np.allclose(out["decoded_mean"].to_numpy(), want)


def test_audio_strict_real_wav(ray_session):
    """strict=True genuinely decodes WAV payloads via stdlib `wave`."""
    import ray.data as rd

    from sod_ray.stages.multimodal import (
        AUDIO_SCHEMA,
        AudioFeatures,
        synth_wav_audio,
    )

    t = synth_wav_audio(25, seed=12)
    assert t.schema.equals(AUDIO_SCHEMA)
    out = (
        rd.from_arrow(t)
        .map_batches(
            AudioFeatures,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
    )
    assert out["decode_ok"].all()
    assert (out["rms"] > 0).all()
    assert out["zcr"].between(0, 1).all()


def test_audio_stage(ray_session):
    import ray.data as rd

    from sod_ray.stages.multimodal import AUDIO_SCHEMA, AudioFeatures, synth_audio

    t = synth_audio(30, seed=42)
    assert t.schema.equals(AUDIO_SCHEMA)
    out = (
        rd.from_arrow(t)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    assert out["decode_ok"].all()
    assert (out["rms"] > 0).all()
    assert out["zcr"].between(0, 1).all()
    assert "payload" not in out.columns
