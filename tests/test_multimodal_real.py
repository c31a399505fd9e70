"""Real (non-stub) multimodal decode pins — round-5 verdict item #4.

The container has neither Pillow nor soundfile, so these tests exercise the
stdlib media_codec fallback that the real branch now routes through: exact
pixel bytes for PNG (all five filter types), exact float32 samples for WAV,
and the actor-pool stage end-to-end on real payloads."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pytimetk_ray.stages.media_codec import (
    png_decode, png_encode, wav_decode, wav_encode)
from pytimetk_ray.stages.multimodal import (
    AudioFrameSampler, ImageDecoder, decode_images)


def _img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    # each PNG filter type decodes back to ground-truth pixels exactly
    arr = _img(13, 17, 3, seed=filter_type)
    payload = png_encode(arr, filter_type=filter_type)
    got = png_decode(payload)
    np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_color_types(channels):
    arr = _img(9, 11, channels, seed=channels)
    np.testing.assert_array_equal(png_decode(png_encode(arr)), arr)


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")


def test_image_decoder_real_branch_exact_pixels():
    # 32x32 RGB at target size: real branch must produce EXACTLY arr/255
    arr = _img(32, 32, 3, seed=7)
    dec = ImageDecoder(32, 32, 3, use_fake_decode=False)
    got = dec._decode_one(png_encode(arr, filter_type=4))
    want = (arr.astype(np.float32) / np.float32(255.0)).reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_image_decoder_real_branch_conversions():
    dec_l = ImageDecoder(8, 8, 1, use_fake_decode=False)
    rgb = _img(8, 8, 3, seed=3)
    got = dec_l._decode_one(png_encode(rgb))
    luma = ((rgb[:, :, 0].astype(np.int64) * 299
             + rgb[:, :, 1].astype(np.int64) * 587
             + rgb[:, :, 2].astype(np.int64) * 114) // 1000)
    np.testing.assert_array_equal(
        got, (luma.astype(np.float32) / np.float32(255.0)).reshape(-1))

    # gray source -> RGB target replicates; RGBA drops alpha
    dec_rgb = ImageDecoder(8, 8, 3, use_fake_decode=False)
    gray = _img(8, 8, 1, seed=4)
    got = dec_rgb._decode_one(png_encode(gray))
    np.testing.assert_array_equal(
        got.reshape(8, 8, 3),
        np.repeat(gray, 3, axis=2).astype(np.float32) / np.float32(255.0))
    rgba = _img(8, 8, 4, seed=5)
    got = dec_rgb._decode_one(png_encode(rgba))
    np.testing.assert_array_equal(
        got.reshape(8, 8, 3),
        rgba[:, :, :3].astype(np.float32) / np.float32(255.0))


def test_image_decoder_real_branch_resize_nearest():
    arr = _img(16, 16, 3, seed=6)
    dec = ImageDecoder(8, 8, 3, use_fake_decode=False)
    got = dec._decode_one(png_encode(arr)).reshape(8, 8, 3)
    idx = (np.arange(8) * 16) // 8
    want = arr[idx][:, idx].astype(np.float32) / np.float32(255.0)
    np.testing.assert_array_equal(got, want)


def test_image_decoder_real_branch_non_png_raises():
    dec = ImageDecoder(8, 8, 3, use_fake_decode=False)
    with pytest.raises(ValueError, match="Pillow"):
        dec._decode_one(b"\xff\xd8\xff\xe0 jpeg-ish bytes")


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(11)
    # int16-exact samples survive the PCM16 round-trip bit-for-bit
    pcm = rng.integers(-32768, 32768, size=2048, dtype=np.int64)
    s = (pcm / 32768.0).astype(np.float32)
    data, sr = wav_decode(wav_encode(s, sample_rate=8000))
    assert sr == 8000
    np.testing.assert_array_equal(data, s)
    # stereo keeps channel shape
    st = np.stack([s[:100], -s[:100]], axis=1)
    data2, _ = wav_decode(wav_encode(st))
    np.testing.assert_array_equal(data2, st)


def test_audio_sampler_real_branch_rms():
    rng = np.random.default_rng(12)
    pcm = rng.integers(-32768, 32768, size=1600, dtype=np.int64)
    s = (pcm / 32768.0).astype(np.float32)
    samp = AudioFrameSampler(n_frames=4, use_fake_decode=False)
    got = samp._energies_one(wav_encode(s))
    want = np.array([np.sqrt(np.mean(ch * ch))
                     for ch in np.array_split(s, 4)], dtype=np.float32)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="soundfile"):
        samp._energies_one(b"OggS not a wav")


def test_decode_images_stage_real_payloads(ray_session):
    # the actor-pool stage end-to-end through the REAL branch
    imgs = [_img(32, 32, 3, seed=i) for i in range(6)]
    df = pd.DataFrame({
        "media_id": np.arange(6, dtype=np.int64),
        "payload": pd.Series([png_encode(a) for a in imgs], dtype=object),
    })
    out = decode_images(rd.from_pandas(df), concurrency=2, batch_size=2,
                        use_fake_decode=False).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    assert len(out) == 6 and (out["height"] == 32).all()
    for i in range(6):
        want = imgs[i].astype(np.float32).reshape(-1) / np.float32(255.0)
        np.testing.assert_array_equal(
            np.asarray(out["pixels"].iloc[i], dtype=np.float32), want)
