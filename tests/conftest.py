import pytest


@pytest.fixture(scope="session")
def spark():
    from lightcrawler_spark.session import get_spark

    # micro-data test session: AQE off (per-stage adaptive replanning adds
    # driver latency that dominates at fixture scale; bench/production
    # sessions keep it on via get_spark defaults)
    s = get_spark(
        "lightcrawler-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
    s.stop()
