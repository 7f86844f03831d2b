"""Session-scoped Ray for the whole test run (driver contract: tests own
the only ray.init in-process; library code never calls it)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_CORRECT = "/root/testdata/sf0.01"
