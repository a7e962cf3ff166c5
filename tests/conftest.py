import pytest


@pytest.fixture(scope="session")
def spark():
    from snips_nlu_spark.spark.session import get_spark
    spark = get_spark("snips-nlu-spark-tests", cpus=4)
    yield spark
    spark.stop()
