"""WARC-in → extract → WET-out end-to-end (pipelines/crawl.py)."""

from __future__ import annotations

import pyarrow as pa


class TestWarcToWet:
    def test_end_to_end_matches_golden(self, ray_session, tmp_path):
        import ray.data as rd

        from pdf_extractor_ray.fixtures import generate_pages, golden_extract
        from pdf_extractor_ray.pipelines.crawl import warc_to_wet
        from pdf_extractor_ray.sources.warc import read_warc, write_warc

        pages = generate_pages(80, seed=42)
        golden = golden_extract(pages)
        warc_dir = str(tmp_path / "warc")
        write_warc(
            rd.from_arrow(pages.select(["url", "warc_ts", "html"])),
            warc_dir,
            records_per_blob=16,
        )

        wet_dir = str(tmp_path / "wet")
        paths = warc_to_wet(f"{warc_dir}/", wet_dir, records_per_blob=16)
        assert paths and all(p.endswith(".wet.gz") for p in paths)

        back = read_warc(paths).map_batches(
            lambda b: pa.Table.from_arrays(
                [b["url"], b["html"]], names=["url", "wet"]
            ),
            batch_format="pyarrow",
        ).to_pandas()
        # WET payloads must equal the single-process golden extraction
        got = {u: bytes(t).decode() for u, t in zip(back["url"], back["wet"])}
        assert len(got) == len(golden)
        mismatches = [u for u, t in golden.items() if got.get(u) != t]
        assert mismatches == []

    def test_cli_subcommand(self, ray_session, tmp_path):
        import ray.data as rd

        from pdf_extractor_ray.__main__ import main
        from pdf_extractor_ray.fixtures import generate_pages
        from pdf_extractor_ray.sources.warc import write_warc

        pages = generate_pages(20, seed=7)
        warc_dir = str(tmp_path / "w")
        write_warc(
            rd.from_arrow(pages.select(["url", "warc_ts", "html"])),
            warc_dir, records_per_blob=10,
        )
        rc = main([
            "wet", "--input", f"{warc_dir}/*.warc.gz",
            "--output", str(tmp_path / "o"),
        ])
        assert rc == 0
        import glob as g

        assert g.glob(str(tmp_path / "o" / "*.wet.gz"))
