import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def changelog_dir(tmp_path_factory):
    """Deterministic small change log shared across e2e tests."""
    from sapray.changelog import generate_changelog

    out = str(tmp_path_factory.mktemp("cdc") / "changelog")
    meta = generate_changelog(SF_DIR, out, n_updates=3000, seed=42)
    return out, meta


@pytest.fixture()
def lake_dir(tmp_path):
    return str(tmp_path / "lake")


def pytest_configure(config):
    os.environ.setdefault("RAY_DEDUP_LOGS", "1")
