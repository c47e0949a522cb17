import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_pair(tmp_path_factory):
    """Small corrupted transcript pair (FIXTURES.md F1/F2/F3)."""
    from datapact_ray.datagen import write_fixture_pair

    out = tmp_path_factory.mktemp("transcripts")
    return write_fixture_pair(str(out), n_convs=200, turns_per_conv=8, n_files=3)
