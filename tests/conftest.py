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


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Keep the untested Delta-native branch VISIBLE (VERDICT r4 #8):
    every run reports whether delta-spark was importable and how many
    tests were skipped because it wasn't, so the env-blocked merge path
    stays a known gap instead of a forgotten one."""
    from securities_data_pipeline_spark.load import HAVE_DELTA

    skipped = terminalreporter.stats.get("skipped", [])
    delta_skips = sum(
        1 for s in skipped if "delta" in str(getattr(s, "longrepr", "")).lower()
    )
    terminalreporter.write_line(
        f"delta-spark runtime: {'PRESENT' if HAVE_DELTA else 'ABSENT'} "
        f"(env forbids installs); delta-gated skips: {delta_skips} — "
        "_delta_merge stays covered by the parquet-fallback tests only"
    )
