import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from parquet_go_ray.tuning import apply_data_context_tuning

    apply_data_context_tuning()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    # override to mirror the driver's gate scale: GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
