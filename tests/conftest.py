import pytest


@pytest.fixture(scope="session")
def spark():
    from ngxspark.session import get_spark

    s = get_spark(app="ngxspark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
