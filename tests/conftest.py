import pytest


@pytest.fixture(scope="session")
def mini_lux_dir(tmp_path_factory):
    from cosmogony_ray.fixtures.synth import write_mini_lux

    d = tmp_path_factory.mktemp("mini_lux")
    write_mini_lux(str(d), n_docs=50)
    return str(d)


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
    yield
    ray.shutdown()
