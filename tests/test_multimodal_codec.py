"""Real multimodal decode: BMP/WAV codec kernels (round-trip +
format-edge pins), nearest-neighbor resize semantics, analytic audio
checks, and the end-to-end binary-column pipelines."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ----------------------------------------------------------------- codecs
def test_bmp_roundtrip_various_widths():
    from kgray.kernels.codec import decode_bmp, encode_bmp

    rng = np.random.default_rng(1)
    # widths chosen to hit every row-padding residue (w*3 mod 4)
    for h, w in ((1, 1), (5, 2), (7, 3), (16, 4), (3, 5), (24, 33)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)


def test_bmp_rejects_non_bmp_and_wrong_depth():
    from kgray.kernels.codec import decode_bmp, encode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG....not a bmp......................................")
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((4, 4), dtype=np.uint8))        # no channels


def test_wav_roundtrip_and_analytic_zero_crossings():
    from kgray.kernels.codec import decode_wav, encode_wav

    rate, freq, dur = 8000, 440.0, 0.5
    n = int(rate * dur)
    t = np.arange(n) / rate
    s = (np.sin(2 * np.pi * freq * t) * 30000).astype(np.int16)
    r, out = decode_wav(encode_wav(s, rate))
    assert r == rate and np.array_equal(out[:, 0], s)
    zc = ((out[:-1, 0] < 0) != (out[1:, 0] < 0)).sum()
    # a pure sine crosses zero ~2·freq·dur times
    assert abs(int(zc) - int(2 * freq * dur)) <= 2


def test_resize_nearest_exact_semantics():
    from kgray.kernels.codec import resize_nearest

    a = np.arange(4, dtype=np.uint8).reshape(2, 2, 1)
    up = resize_nearest(a, 4, 4)[:, :, 0]
    assert np.array_equal(up, np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                                        [2, 2, 3, 3], [2, 2, 3, 3]],
                                       dtype=np.uint8))
    # downscale picks the floor-strided source pixel
    big = np.arange(36, dtype=np.uint8).reshape(6, 6, 1)
    down = resize_nearest(big, 2, 2)[:, :, 0]
    assert np.array_equal(down, np.array([[0, 3], [18, 21]], dtype=np.uint8))


# -------------------------------------------------------------- pipelines
def _docs_dir(tmp_path, n=40):
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": ["x"] * n})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_image_features_pipeline_matches_serial(ray_session, tmp_path):
    from kgray.kernels.codec import decode_bmp, resize_nearest
    from kgray.pipelines.multimodal import image_features, synth_bmp_payload

    sf = _docs_dir(tmp_path)
    got = (image_features(sf, concurrency=2).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert len(got) == 40
    for _, row in got.iloc[:8].iterrows():
        img = decode_bmp(synth_bmp_payload(int(row.doc_id)))
        assert (row.height, row.width) == img.shape[:2]
        sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert (row.sum_r, row.sum_g, row.sum_b) == tuple(sums)
        assert row.thumb_sum == int(resize_nearest(img, 8, 8)
                                    .sum(dtype=np.int64))


def test_audio_features_pipeline_matches_serial(ray_session, tmp_path):
    from kgray.kernels.codec import decode_wav
    from kgray.pipelines.multimodal import audio_features, synth_wav_payload

    sf = _docs_dir(tmp_path)
    got = (audio_features(sf, concurrency=2).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert len(got) == 40
    assert (got["sample_rate"] == 8000).all()
    for _, row in got.iloc[:8].iterrows():
        rate, samples = decode_wav(synth_wav_payload(int(row.doc_id)))
        s = samples[:, 0].astype(np.int64)
        assert row.n_samples == len(s)
        assert row.energy == int((s * s).sum())
        assert row.zero_crossings == int(((s[:-1] < 0) != (s[1:] < 0)).sum())


# ------------------------------------------------------------------ video
def test_video_container_roundtrip_and_seek():
    from kgray.kernels.codec import (decode_video_frames, encode_bmp,
                                     encode_video)

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
              for _ in range(7)]
    payload = encode_video(frames)
    # stride 1: all frames, exact round-trip
    out = list(decode_video_frames(payload, stride=1))
    assert [i for i, _ in out] == list(range(7))
    for (_, got), src in zip(out, frames):
        assert np.array_equal(got, src)
    # stride 3 samples frames 0, 3, 6
    idx = [i for i, _ in decode_video_frames(payload, stride=3)]
    assert idx == [0, 3, 6]
    with pytest.raises(ValueError):
        list(decode_video_frames(b"nope" + payload[4:]))


def test_video_features_pipeline_matches_serial(ray_session, tmp_path):
    from kgray.kernels.codec import decode_video_frames
    from kgray.pipelines.multimodal import (synth_video_payload,
                                            video_features)

    sf = _docs_dir(tmp_path)
    got = (video_features(sf, concurrency=2, stride=2).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert len(got) == 40
    for _, row in got.iloc[:6].iterrows():
        payload = synth_video_payload(int(row.doc_id))
        sampled = list(decode_video_frames(payload, stride=2))
        assert row.n_sampled == len(sampled)
        s_rgb = sum(int(img.astype(np.int64).sum()) for _, img in sampled)
        assert row.sum_rgb == s_rgb
        motion = 0
        prev = None
        for _, img in sampled:
            a = img.astype(np.int64)
            if prev is not None:
                motion += int(np.abs(a - prev).sum())
            prev = a
        assert row.motion == motion
        assert row.motion > 0                  # frames really move
