"""CLI smoke test through a real subprocess (its own Ray session)."""

import json
import subprocess
import sys


def test_cli_extract_and_metrics(tmp_path, small_pages):
    import pyarrow.parquet as pq

    pages = tmp_path / "pages.parquet"
    pq.write_table(small_pages.slice(0, 60), pages)
    out_dir = tmp_path / "out"

    result = subprocess.run(
        [
            sys.executable, "-m", "pdf_extractor_ray", "extract",
            "--input", str(pages), "--output", str(out_dir), "--num-cpus", "2",
        ],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert result.returncode == 0, result.stderr[-2000:]
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 60

    metrics = subprocess.run(
        [sys.executable, "-m", "pdf_extractor_ray", "metrics", "--output", str(out_dir)],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert metrics.returncode == 0
    assert "overall_status" in metrics.stdout
