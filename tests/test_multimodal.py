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
