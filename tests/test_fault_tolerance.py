"""Task-level fault tolerance: a worker process dying mid-batch must be
recovered by Ray's lineage re-execution with byte-identical output (UDFs
are idempotent and deterministic, so retries are safe by construction)."""

import os

import pyarrow as pa

from pdf_extractor_ray.pipelines.extract import extraction_pipeline


class TestFaultTolerance:
    def test_worker_death_recovers_byte_identical(
        self, ray_session, small_pages, golden_small, tmp_path
    ):
        import ray.data as rd

        marker = str(tmp_path / "crashed_once")

        # Defined inline so cloudpickle ships it by value — a REPLACEMENT
        # worker (spawned after the crash) cannot import the test module.
        def poison_crash(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    return batch
                os._exit(1)  # hard kill — simulates worker/node loss
            return batch

        ds = rd.from_arrow(small_pages).repartition(8)
        poisoned = ds.map_batches(poison_crash, batch_format="pyarrow")
        out = pa.concat_tables(
            extraction_pipeline(poisoned).iter_batches(batch_format="pyarrow")
        )
        assert os.path.exists(marker), "the poison batch never executed"
        result = dict(zip(out["url"].to_pylist(), out["extracted_text"].to_pylist()))
        assert result == golden_small, "output after worker death must be byte-identical"


class TestDedupFaultTolerance:
    def test_worker_death_mid_minhash_identical_clusters(self, ray_session, tmp_path):
        """A worker dying inside the minhash signature stage must be
        re-executed by lineage with identical final clustering (every
        dedup stage is deterministic and idempotent)."""
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.dedup import minhash_lsh_dedup

        rng = np.random.Generator(np.random.Philox(41))
        vocab = [f"w{j}" for j in range(3000)]
        texts = [" ".join(rng.choice(vocab, size=80).tolist()) for _ in range(120)]
        rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
        rows += [{"doc_id": 1000 + i, "text": t} for i, t in enumerate(texts[:40])]
        ds = rd.from_items(rows).repartition(6)

        expected = (
            minhash_lsh_dedup(ds, threshold=0.8)
            .select_columns(["doc_id", "cluster_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        marker = str(tmp_path / "dedup_crashed_once")

        def poison_crash(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    return batch
                os._exit(1)
            return batch

        poisoned = ds.map_batches(poison_crash, batch_format="pyarrow")
        got = (
            minhash_lsh_dedup(poisoned, threshold=0.8)
            .select_columns(["doc_id", "cluster_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert os.path.exists(marker), "the poison batch never executed"
        assert got.equals(expected)
        assert int((got["doc_id"] != got["cluster_id"]).sum()) == 40


class TestStatsFaultTolerance:
    def test_worker_death_mid_quantiles_identical_answer(
        self, ray_session, tmp_path
    ):
        """A worker dying inside the quantile histogram pass must be
        re-executed by lineage with the identical exact answer (partials
        are deterministic and idempotent; the streaming driver combine
        only ever sees the successful executions)."""
        import numpy as np
        import ray.data as rd

        from pdf_extractor_ray.ops.quantiles import exact_quantiles

        vals = np.random.default_rng(17).integers(0, 100_000, 30_000)
        tbl = pa.table({"x": pa.array(vals, pa.int64())})
        ds = rd.from_arrow(tbl).repartition(8)
        qs = [0.1, 0.5, 0.9]
        expected = exact_quantiles(ds, "x", qs)

        marker = str(tmp_path / "q_crashed_once")

        def poison_crash(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                try:
                    fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                except FileExistsError:
                    return batch
                os._exit(1)
            return batch

        poisoned = ds.map_batches(poison_crash, batch_format="pyarrow")
        got = exact_quantiles(poisoned, "x", qs)
        assert os.path.exists(marker), "the poison batch never executed"
        assert got == expected
