import pytest

from data_quality_monitoring_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dqm_tests",
        cores=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
