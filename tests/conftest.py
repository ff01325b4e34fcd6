import pytest


@pytest.fixture(scope="session")
def spark():
    from sumi_agent_spark.session import get_spark
    s = get_spark(app_name="sumi-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
