"""Guard against DuckDB HUGEINT drift in oracle SQL.

Round-3 driver failures (t_pack_sequences, t_sample_stratified,
t_train_split) were caused by ``SUM(integer)`` in DuckDB producing
HUGEINT (int128) output columns, which the driver's type-sensitive
hasher canonicalizes differently from Spark's BIGINT. Every oracle
must therefore cast such sums to BIGINT. This test binds each oracle
against the sf0.001 views (binding only — no execution) and asserts no
output column is HUGEINT.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from securities_data_pipeline_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_returns_hugeint(con):
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # lazy: binds + types, does not execute
        huge = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
        ]
        if huge:
            bad[name] = huge
    assert not bad, (
        "oracles produce HUGEINT columns (driver hash will fail; "
        f"wrap in CAST(... AS BIGINT)): {bad}"
    )


def test_no_oracle_returns_array_or_nested(con):
    """VERDICT r9 item 2: the DRIVER's canonicalizer sorts result
    frames in pandas and dies on array/map/struct cells (``TypeError:
    unhashable type: 'list'`` — how sim_kmeans_train/sim_pq_train
    shipped driver-RED while the in-repo gate passed). Registered
    query outputs are scalar-columns-only by contract; this binds
    every oracle (no execution) and rejects LIST/STRUCT/MAP output
    columns, so reverting the r9 pair's flattening fails HERE instead
    of at the driver. ``tools/check_oracle.py`` enforces the same
    contract on the Spark side at gate time."""
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        nested = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(
                k in str(t).upper() for k in ("[]", "LIST", "STRUCT", "MAP")
            )
        ]
        if nested:
            bad[name] = nested
    assert not bad, (
        "oracles produce array/nested columns (the driver canonicalizer "
        f"cannot sort them — flatten to scalar rows): {bad}"
    )
