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
