"""Tests for the from-scratch video container codecs (Y4M + uncompressed
AVI): exact frame round-trips, colourspace variants, frame sampling,
hostile inputs, declared-unsupported compression."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_extractor_ray.ops.video import (
    VideoError,
    decode_video,
    encode_avi,
    encode_y4m,
    video_frame_sample,
)


def _frames(n=6, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(n)]


class TestY4M:
    @pytest.mark.parametrize("cs", ["420jpeg", "420", "444", "mono"])
    def test_roundtrip(self, cs):
        frames = _frames()
        dec, fps = decode_video(encode_y4m(frames, fps=(30, 1), colorspace=cs))
        assert fps == 30.0
        assert len(dec) == 6
        for a, b in zip(dec, frames):
            assert np.array_equal(a, b)

    def test_odd_fps_ratio(self):
        dec, fps = decode_video(encode_y4m(_frames(2), fps=(30000, 1001)))
        assert abs(fps - 29.97) < 0.01

    def test_truncated(self):
        enc = encode_y4m(_frames(3))
        with pytest.raises(VideoError):
            decode_video(enc[: len(enc) - 10])

    def test_unsupported_colourspace(self):
        enc = encode_y4m(_frames(1)).replace(b"C420jpeg", b"C420p10 ")
        with pytest.raises(VideoError, match="C420p10"):
            decode_video(enc)


class TestAvi:
    def test_roundtrip(self):
        frames = _frames(5, seed=3)
        dec, fps = decode_video(encode_avi(frames, fps=25))
        assert fps == 25.0
        assert len(dec) == 5
        for a, b in zip(dec, frames):
            # B=G=R encoding makes integer luma the identity
            assert np.array_equal(a, b)

    def test_odd_width_padding(self):
        frames = [np.arange(15 * 7, dtype=np.uint8).reshape(7, 15) % 256]
        dec, _ = decode_video(encode_avi(frames))
        assert np.array_equal(dec[0], frames[0])

    def test_compressed_declared(self):
        # MJPG is now a REAL decode path (see TestMJPEG); H.264 stays a
        # declared-unsupported codec.
        enc = bytearray(encode_avi(_frames(1)))
        i = enc.index(b"strf") + 8 + 16  # biCompression field
        enc[i : i + 4] = b"H264"
        with pytest.raises(VideoError, match="unsupported"):
            decode_video(bytes(enc))

    def test_not_video(self):
        with pytest.raises(VideoError):
            decode_video(b"\x00" * 64)
        with pytest.raises(VideoError):
            decode_video(b"RIFF\x10\x00\x00\x00WAVEdata")


class TestSampling:
    def test_uniform_sample(self):
        frames = _frames(10, seed=1)
        got = video_frame_sample(encode_y4m(frames), n_frames=4)
        # indices floor(i*10/4) = 0, 2, 5, 7
        for g, idx in zip(got, (0, 2, 5, 7)):
            assert np.array_equal(g, frames[idx])

    def test_short_clip_returns_all(self):
        frames = _frames(2, seed=2)
        got = video_frame_sample(encode_avi(frames), n_frames=4)
        assert len(got) == 2


class TestStage:
    def test_video_pipeline_stage(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from pdf_extractor_ray.ops.multimodal import video_pipeline

        frames = [np.full((8, 8), f * 10, np.uint8) for f in range(6)]
        tbl = pa.Table.from_arrays(
            [
                pa.array([1, 2], pa.int64()),
                pa.array([encode_y4m(frames), encode_avi(frames)], pa.binary()),
            ],
            names=["media_id", "payload"],
        )
        out = video_pipeline(rd.from_arrow(tbl)).to_pandas()
        assert len(out) == 6  # 3 sampled frames × 2 clips
        # frames 0, 2, 4 → luma sums 0, 20*64, 40*64 on both container paths
        for mid in (1, 2):
            sub = out[out.media_id == mid].sort_values("frame_no")
            assert sub.frame_no.tolist() == [0, 2, 4]
            assert sub.luma_sum.tolist() == [0, 20 * 64, 40 * 64]


class TestMJPEG:
    def test_mjpeg_avi_roundtrip_exact(self, ray_session):
        import numpy as np

        from pdf_extractor_ray.ops.jpeg import encode_jpeg_gray
        from pdf_extractor_ray.ops.video import decode_video, encode_mjpeg_avi

        frames = []
        for f in range(3):
            vals = np.array([10 + f, 100, 200, 250 - f], np.uint8).reshape(2, 2)
            frames.append(np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1))
        payload = encode_mjpeg_avi(
            [encode_jpeg_gray(fr, quant_value=8) for fr in frames], 16, 16, fps=10
        )
        got, fps = decode_video(payload)
        assert fps == 10.0
        assert len(got) == 3
        for g, e in zip(got, frames):
            assert np.array_equal(g, e)  # constant blocks round-trip exactly

    def test_unknown_compression_still_rejected(self):
        import struct

        import numpy as np
        import pytest

        from pdf_extractor_ray.ops.video import VideoError, encode_mjpeg_avi, decode_video

        payload = bytearray(encode_mjpeg_avi([b"\xff\xd8junk"], 8, 8))
        idx = payload.index(b"strf") + 8 + 16  # biCompression field
        payload[idx : idx + 4] = b"H264"
        with pytest.raises(VideoError, match="unsupported"):
            decode_video(bytes(payload))


class TestSceneCuts:
    def test_sad_and_cut_flags_y4m(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import scene_cut_pipeline
        from pdf_extractor_ray.ops.video import encode_y4m

        frames = [
            np.full((4, 4), v, np.uint8) for v in (10, 10, 200, 200, 205)
        ]
        tab = pa.Table.from_arrays(
            [
                pa.array([1], pa.int64()),
                pa.array([encode_y4m(frames)], pa.binary()),
            ],
            names=["media_id", "payload"],
        )
        df = (
            scene_cut_pipeline(ray.data.from_arrow(tab))
            .to_pandas()
            .sort_values("frame_no")
        )
        assert df["sad"].tolist() == [0, 16 * 190, 0, 16 * 5]
        # mean diff per pixel: 0, 190, 0, 5 → cut only at frame 2
        assert df["is_cut"].tolist() == [False, True, False, False]

    def test_threshold_boundary_is_strict(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import scene_cut_pipeline
        from pdf_extractor_ray.ops.video import encode_y4m

        # mean diff exactly == threshold must NOT flag (strict >)
        frames = [np.full((4, 4), 0, np.uint8), np.full((4, 4), 8, np.uint8)]
        tab = pa.Table.from_arrays(
            [
                pa.array([1], pa.int64()),
                pa.array([encode_y4m(frames)], pa.binary()),
            ],
            names=["media_id", "payload"],
        )
        df = scene_cut_pipeline(ray.data.from_arrow(tab)).to_pandas()
        assert df["sad"].tolist() == [16 * 8]
        assert df["is_cut"].tolist() == [False]

    def test_avi_container_path(self, ray_session):
        import ray

        from pdf_extractor_ray.ops.multimodal import scene_cut_pipeline
        from pdf_extractor_ray.ops.video import encode_avi

        frames = [np.full((8, 8), 0, np.uint8), np.full((8, 8), 255, np.uint8)]
        tab = pa.Table.from_arrays(
            [
                pa.array([7], pa.int64()),
                pa.array([encode_avi(frames)], pa.binary()),
            ],
            names=["media_id", "payload"],
        )
        df = scene_cut_pipeline(ray.data.from_arrow(tab)).to_pandas()
        assert df["sad"].tolist() == [64 * 255]
        assert df["is_cut"].tolist() == [True]
