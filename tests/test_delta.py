"""ops/delta.py: diff/apply roundtrip identity, compression wins, the
Dataset operator over changed snapshot pairs."""

import numpy as np
import pyarrow as pa

from pdf_extractor_ray.ops.delta import apply_delta, delta_size, diff_bytes


class TestDiffBytes:
    def test_roundtrip_random(self):
        rng = np.random.Generator(np.random.Philox(7))
        for trial in range(200):
            n = int(rng.integers(0, 400))
            old = bytes(rng.integers(0, 8, size=n, dtype=np.uint8))
            # new: mutated copy (slices moved, bytes flipped, inserts)
            new = bytearray(old)
            for _ in range(int(rng.integers(0, 6))):
                if len(new) and rng.integers(0, 2):
                    new[int(rng.integers(0, len(new)))] = int(rng.integers(0, 8))
                else:
                    pos = int(rng.integers(0, len(new) + 1))
                    new[pos:pos] = bytes(rng.integers(0, 8, size=3, dtype=np.uint8))
            new = bytes(new)
            ops = diff_bytes(old, new)
            assert apply_delta(old, ops) == new, trial

    def test_identical_is_one_copy(self):
        old = bytes(range(200)) * 3
        ops = diff_bytes(old, old)
        assert ops == [("c", 0, len(old))]
        assert delta_size(ops) == 9

    def test_empty_edges(self):
        assert diff_bytes(b"", b"abc") == [("l", b"abc")]
        assert apply_delta(b"", [("l", b"abc")]) == b"abc"
        assert diff_bytes(b"abc", b"") == []
        assert apply_delta(b"abc", []) == b""

    def test_compression_win_on_small_edit(self):
        old = (b"the quick brown fox jumps over the lazy dog. " * 40)
        new = old[:500] + b"EDITED" + old[500:]
        ops = diff_bytes(old, new)
        assert apply_delta(old, ops) == new
        assert delta_size(ops) < len(new) // 10


class TestSnapshotDelta:
    def test_changed_pairs_reconstruct(self, ray_session):
        import ray.data as rd

        from pdf_extractor_ray.ops.delta import snapshot_delta

        base = "lorem ipsum dolor sit amet " * 30
        old = rd.from_items(
            [
                {"url": "a", "text": base},
                {"url": "b", "text": "same"},
                {"url": "c", "text": base},
            ]
        ).repartition(2)
        new = rd.from_items(
            [
                {"url": "a", "text": base[:100] + "XX" + base[100:]},
                {"url": "b", "text": "same"},
                {"url": "c", "text": base.replace("dolor", "d0lor")},
            ]
        ).repartition(3)
        out = (
            snapshot_delta(old, new)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        assert out["url"].tolist() == ["a", "c"]  # 'b' unchanged
        assert out.loc[0, "reconstructed"] == base[:100] + "XX" + base[100:]
        assert out.loc[1, "reconstructed"] == base.replace("dolor", "d0lor")
        assert (out["delta_bytes"] < out["bytes_new"]).all()

    def test_regimes_agree(self, ray_session):
        """broadcast_cap=0 forces the sorted-lookup pairing — identical
        rows to the broadcast regime."""
        import ray.data as rd

        from pdf_extractor_ray.ops.delta import snapshot_delta

        old = rd.from_items(
            [{"url": f"u{i}", "text": f"body {i} " * 20} for i in range(20)]
        ).repartition(3)
        new = rd.from_items(
            [
                {"url": f"u{i}",
                 "text": (f"body {i} " * 20) + ("X" if i % 3 == 0 else "")}
                for i in range(20)
            ]
        ).repartition(4)
        a = (
            snapshot_delta(old, new)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        b = (
            snapshot_delta(old, new, broadcast_cap=0)
            .to_pandas().sort_values("url").reset_index(drop=True)
        )
        assert a.equals(b)
        assert len(a) == 7  # i % 3 == 0 for i in 0..19
