"""Checkpoint/resume: a partially-completed run resumes, recomputes only
missing partitions, and the final output is byte-identical to an
uninterrupted run (FIXTURES.md §5)."""

import os
import shutil

import pytest

from pdf_extractor_ray.pipelines.checkpoint import (
    completed_partitions,
    read_metrics,
    read_output,
    run_with_checkpoints,
)
from pdf_extractor_ray.pipelines.extract import extraction_pipeline


@pytest.fixture()
def pages_path(tmp_path, small_pages):
    import pyarrow.parquet as pq

    path = tmp_path / "pages.parquet"
    pq.write_table(small_pages, path)
    return str(path)


def _run(pages_path, out_dir):
    import ray.data as rd

    ds = extraction_pipeline(rd.read_parquet(pages_path))
    return run_with_checkpoints(ds, out_dir)


class TestResume:
    def test_resume_recomputes_only_missing(self, ray_session, pages_path, tmp_path):
        out_a = str(tmp_path / "full")
        out_b = str(tmp_path / "resumed")
        _run(pages_path, out_a)

        # Simulate a mid-run kill: complete run, then destroy a subset of
        # committed partitions (marker + data) — the on-disk state of a run
        # that died partway.
        _run(pages_path, out_b)
        all_parts = sorted(completed_partitions(out_b))
        killed = all_parts[::4]
        for k in killed:
            os.remove(os.path.join(out_b, "_manifest", f"part={k}.json"))
            shutil.rmtree(os.path.join(out_b, f"part={k}"))
        survivors = {
            k: os.path.getmtime(os.path.join(out_b, f"part={k}", "data.parquet"))
            for k in all_parts
            if k not in killed
        }

        _run(pages_path, out_b)

        # (a) only missing partitions recomputed: survivors untouched
        for k, mtime in survivors.items():
            assert (
                os.path.getmtime(os.path.join(out_b, f"part={k}", "data.parquet"))
                == mtime
            ), f"partition {k} was rewritten on resume"
        # (b) final output byte-identical to the uninterrupted run
        a, b = read_output(out_a), read_output(out_b)
        da = dict(zip(a["url"].to_pylist(), a["extracted_text"].to_pylist()))
        db = dict(zip(b["url"].to_pylist(), b["extracted_text"].to_pylist()))
        assert da == db
        # (c) per-partition metrics identical
        ma = read_metrics(out_a).set_index("partition_id")
        mb = read_metrics(out_b).set_index("partition_id")
        assert ma.equals(mb)

    def test_injected_failure_then_resume(self, ray_session, pages_path, tmp_path):
        out = str(tmp_path / "failed")
        import ray.data as rd

        with pytest.raises(RuntimeError, match="injected failure"):
            run_with_checkpoints(
                extraction_pipeline(rd.read_parquet(pages_path)),
                out,
                fail_after_partitions=3,
            )
        partial = completed_partitions(out)
        assert partial, "some partitions should have committed before the failure"
        metrics = _run(pages_path, out)
        assert metrics["docs"].sum() == 200


class TestDirectMode:
    def test_shuffle_free_direct_write(self, ray_session, pages_path, tmp_path):
        import glob

        import ray.data as rd

        from pdf_extractor_ray.pipelines.checkpoint import run_direct

        out = str(tmp_path / "direct")
        run_direct(extraction_pipeline(rd.read_parquet(pages_path)), out)
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        files = glob.glob(os.path.join(out, "partition_id=*", "*.parquet"))
        assert files, "hive-partitioned output expected"
        import pyarrow.parquet as pq

        total = sum(pq.read_table(f).num_rows for f in files)
        assert total == 200


class TestMetricsRollup:
    def test_partition_metrics_dataset_rollup(self, ray_session, pages_path):
        import ray.data as rd

        from pdf_extractor_ray.stages.metrics import overall_status, partition_metrics

        out = extraction_pipeline(rd.read_parquet(pages_path))
        metrics = partition_metrics(out).to_pandas().sort_values("partition_id")
        assert metrics["docs"].sum() == 200
        assert (metrics["bytes_in"] > 0).all()
        assert metrics["n_problem_docs"].sum() > 0  # degenerate fixture rows
        status = overall_status(metrics)
        assert status in ("problems_fixed", "warnings", "passed")
        assert status == "problems_fixed"  # repairs happen on this corpus
