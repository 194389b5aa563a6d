"""Unit tests for ops/adpcm.py — scalar-reference parity, clamping,
container handling, decode_audio routing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    decode_ima_wav,
    encode_ima_wav,
)


def scalar_decode(pred, idx, nibbles):
    """Straight-line scalar reference (the published algorithm verbatim)."""
    out = [int(np.int16(pred))]
    idx = max(0, min(88, idx))
    for n in nibbles:
        step = int(IMA_STEP_TABLE[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(IMA_INDEX_TABLE[n])))
        out.append(pred)
    return out


def test_roundtrip_matches_scalar_reference():
    rng = np.random.default_rng(9)
    headers = rng.integers(-512, 512, 4)
    idxs = rng.integers(0, 89, 4)
    nibs = rng.integers(0, 16, (4, 64))
    payload = encode_ima_wav(headers, idxs, nibs, rate=8000)
    samples, rate = decode_ima_wav(payload)
    assert rate == 8000
    exp = []
    for b in range(4):
        exp.extend(scalar_decode(int(headers[b]), int(idxs[b]), nibs[b]))
    assert samples.tolist() == exp


def test_clamping_extremes():
    # all-7 nibbles (max positive diff) from near the top must clamp at
    # 32767; all-15 (max negative) from the bottom clamps at -32768.
    up = encode_ima_wav(np.array([32000]), np.array([88]), np.full((1, 64), 7))
    s, _ = decode_ima_wav(up)
    assert s.max() == 32767
    down = encode_ima_wav(np.array([-32000]), np.array([88]), np.full((1, 64), 15))
    s, _ = decode_ima_wav(down)
    assert s.min() == -32768


def test_nibble_order_low_first():
    # one data byte 0x51 -> nibbles (1, 5): sample1 uses nibble 1.
    p1 = encode_ima_wav(np.array([0]), np.array([0]), np.array([[1, 5]]))
    s1, _ = decode_ima_wav(p1)
    assert s1.tolist() == scalar_decode(0, 0, [1, 5])


def test_unknown_tag_falls_to_wave():
    import io
    import wave as wave_mod

    from pdf_extractor_ray.ops.multimodal import decode_audio

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([1, -2, 3], "<i2").tobytes())
    samples, rate = decode_audio(buf.getvalue())
    assert samples.tolist() == [1, -2, 3] and rate == 8000


def test_decode_audio_routes_adpcm():
    from pdf_extractor_ray.ops.multimodal import decode_audio

    payload = encode_ima_wav(np.array([100]), np.array([3]), np.full((1, 32), 2))
    samples, _ = decode_audio(payload)
    assert samples.tolist() == scalar_decode(100, 3, [2] * 32)


def test_bad_container_raises():
    with pytest.raises(ValueError):
        decode_ima_wav(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        decode_ima_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data


class TestResize:
    def test_nearest_identity_and_down_up(self):
        from pdf_extractor_ray.ops.multimodal import resize_nearest

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        assert np.array_equal(resize_nearest(img, 4, 4), img)
        down = resize_nearest(img, 2, 2)
        assert np.array_equal(down, img[np.ix_([0, 2], [0, 2])])
        up = resize_nearest(img, 8, 8)
        assert up.shape == (8, 8)
        # each src pixel repeated 2x2 under floor mapping
        assert np.array_equal(up[0:2, 0:2], np.full((2, 2), img[0, 0]))

    def test_box_floor_mean_and_factor_check(self):
        import pytest

        from pdf_extractor_ray.ops.multimodal import downsample_box

        img = np.array([[1, 2], [3, 5]], dtype=np.uint8)
        assert downsample_box(img, 2, 2)[0, 0] == (1 + 2 + 3 + 5) // 4
        with pytest.raises(ValueError):
            downsample_box(np.zeros((3, 4), np.uint8), 2, 2)

    def test_resize_stage_round_trip(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.multimodal import encode_png, resize_pipeline

        y, x = np.mgrid[0:4, 0:4]
        img = ((y * 10 + x) % 256).astype(np.uint8)
        tbl = pa.table(
            {"media_id": pa.array([7], pa.int64()),
             "payload": pa.array([encode_png(img)], pa.binary())}
        )
        rows = resize_pipeline(
            rd.from_arrow(tbl), modes={"n2": ("nearest", 2, 2)}
        ).take_all()
        got = {(r["y"], r["x"]): r["v"] for r in rows}
        assert got == {(0, 0): 0, (0, 1): 2, (1, 0): 20, (1, 1): 22}


class TestG711:
    def test_spec_points(self):
        from pdf_extractor_ray.ops.g711 import decode_alaw, decode_mulaw

        # Classic reference values: mu-law 0xFF/0x7F decode to +0/-0;
        # 0x00 is the negative rail (-32124 in the 16-bit convention).
        mu = decode_mulaw(np.array([0xFF, 0x7F, 0x00, 0x80], np.uint8))
        assert mu.tolist() == [0, 0, -32124, 32124]
        # A-law 0x55 -> -8 (quietest negative), 0xD5 -> +8, 0x2A -> -32256 rail
        al = decode_alaw(np.array([0x55, 0xD5, 0x2A, 0xAA], np.uint8))
        assert al.tolist() == [-8, 8, -32256, 32256]

    def test_sign_symmetry_all_bytes(self):
        from pdf_extractor_ray.ops.g711 import decode_alaw, decode_mulaw

        b = np.arange(256, dtype=np.uint8)
        mu = decode_mulaw(b)
        assert np.array_equal(decode_mulaw(b ^ 0x80), -mu)
        al = decode_alaw(b)
        assert np.array_equal(decode_alaw(b ^ 0x80), -al)

    def test_wav_container_and_routing(self):
        from pdf_extractor_ray.ops.g711 import (
            decode_g711_wav,
            decode_mulaw,
            encode_g711_wav,
        )
        from pdf_extractor_ray.ops.multimodal import decode_audio

        stream = np.arange(64, dtype=np.uint8)
        payload = encode_g711_wav(stream, "mulaw", rate=8000)
        s1, rate = decode_g711_wav(payload)
        assert rate == 8000 and np.array_equal(s1, decode_mulaw(stream))
        s2, _ = decode_audio(payload)  # routes through the RIFF sniffer
        assert np.array_equal(s2, s1)


class TestAudioFingerprint:
    """ops/multimodal.py audio fingerprint dedup: cross-codec identity,
    brute-force bits, empty-signal edge."""

    def test_cross_codec_identity(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.flac import encode_flac
        from pdf_extractor_ray.ops.multimodal import (
            audio_fingerprint_dedup, encode_wav,
        )

        sig = ((np.arange(1024) * 13 + 37) % 2048 - 1024).astype(np.int16)
        other = ((np.arange(1024) * 29 + 5) % 4096 - 2048).astype(np.int16)
        rows = [
            {"media_id": 0, "payload": encode_wav(sig)},
            {"media_id": 1, "payload": encode_flac(sig.reshape(-1, 1))},
            {"media_id": 2, "payload": encode_flac(
                np.stack([sig, sig], axis=1), mid_side=True)},
            {"media_id": 3, "payload": encode_wav(other)},
        ]
        out = (
            audio_fingerprint_dedup(rd.from_items(rows).repartition(2))
            .to_pandas().sort_values("media_id").reset_index(drop=True)
        )
        # same signal through three codecs -> one cluster with rep 0
        assert out.loc[:2, "rep_id"].tolist() == [0, 0, 0]
        assert out.loc[:2, "cluster_size"].tolist() == [3, 3, 3]
        assert out.loc[3, "cluster_size"] == 1
        # brute-force the fingerprint bits
        w = np.abs(sig.astype(np.int64)).reshape(32, 32).sum(axis=1)
        fp = int(sum(1 << (i - 1) for i in range(1, 32) if w[i] > w[i - 1]))
        assert out.loc[0, "fingerprint"] == fp


class TestSpectralProbes:
    def test_pure_tones_land_in_their_bins(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import (
            encode_wav,
            spectral_pipeline,
        )

        n = 128
        t = np.arange(n)
        dc = np.full(n, 100, np.int16)  # all energy at k=0
        ny = (100 * ((-1) ** t)).astype(np.int16)  # k = N/2
        quarter = np.zeros(n, np.int16)  # cos(pi n / 2): k = N/4
        quarter[t % 4 == 0] = 100
        quarter[t % 4 == 2] = -100
        tab = pa.Table.from_arrays(
            [
                pa.array([0, 1, 2], pa.int64()),
                pa.array(
                    [encode_wav(dc), encode_wav(ny), encode_wav(quarter)],
                    pa.binary(),
                ),
            ],
            names=["media_id", "payload"],
        )
        df = (
            spectral_pipeline(ray.data.from_arrow(tab), n_windows=1)
            .to_pandas()
            .sort_values("media_id")
        )
        s = 100 * n  # Σ|basis·x| per aligned bin
        assert df["e_dc"].tolist() == [s * s, 0, 0]
        assert df["e_ny"].tolist() == [0, s * s, 0]
        # quarter tone: Σ x·cos = 100·(n/2) on the n/2 nonzero positions
        cq = 100 * (n // 2)
        assert df["e_q"].tolist() == [0, 0, cq * cq]

    def test_matches_numpy_fft(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import (
            encode_wav,
            spectral_pipeline,
        )

        rng = np.random.RandomState(5)
        sig = rng.randint(-1000, 1000, 128).astype(np.int16)
        tab = pa.Table.from_arrays(
            [pa.array([9], pa.int64()), pa.array([encode_wav(sig)], pa.binary())],
            names=["media_id", "payload"],
        )
        df = spectral_pipeline(ray.data.from_arrow(tab), n_windows=1).to_pandas()
        spec = np.fft.rfft(sig.astype(np.float64))
        assert df["e_dc"][0] == pytest.approx(abs(spec[0]) ** 2)
        assert df["e_q"][0] == pytest.approx(abs(spec[32]) ** 2)
        assert df["e_ny"][0] == pytest.approx(abs(spec[64]) ** 2)

    def test_short_tail_window(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import (
            encode_wav,
            spectral_pipeline,
        )

        sig = np.full(130, 7, np.int16)  # 1 full window + 2-sample tail
        tab = pa.Table.from_arrays(
            [pa.array([3], pa.int64()), pa.array([encode_wav(sig)], pa.binary())],
            names=["media_id", "payload"],
        )
        df = (
            spectral_pipeline(ray.data.from_arrow(tab), n_windows=8)
            .to_pandas()
            .sort_values("win")
        )
        assert df["win"].tolist() == [0, 1]
        assert df["e_dc"].tolist() == [(7 * 128) ** 2, (7 * 2) ** 2]
