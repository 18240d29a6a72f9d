import pytest

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="kiara-spark-tests", master="local[4]",
                        shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def ctx(spark):
    from kiara_spark import KiaraContext

    return KiaraContext(spark=spark)


@pytest.fixture(scope="session")
def tables(ctx):
    return ctx.load_tables(SF_SMOKE)
