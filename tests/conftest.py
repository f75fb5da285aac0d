import pytest

from mape_calculation_and_anonymization_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus="*", shuffle_partitions=8)
    yield s
