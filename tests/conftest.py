import pytest

from securities_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdp-tests", shuffle_partitions=8)
    yield s


def rows(df, *order_cols):
    """Collect to sorted plain tuples for comparison."""
    if order_cols:
        df = df.orderBy(*order_cols)
    return [tuple(r) for r in df.collect()]
