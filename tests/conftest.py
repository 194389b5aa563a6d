"""Session-scoped Ray fixture: init ONCE for the whole pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_pages():
    """sf-small fixture corpus (FIXTURES.md: 200 rows)."""
    from pdf_extractor_ray.fixtures import generate_pages

    return generate_pages(200, seed=42)


@pytest.fixture(scope="session")
def golden_small(small_pages):
    from pdf_extractor_ray.fixtures import golden_extract

    return golden_extract(small_pages)
