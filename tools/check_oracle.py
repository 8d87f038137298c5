"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def canon(rows, cols):
    """Canonicalize result rows: sort columns by name, normalize cells."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def type_family(t: str) -> str:
    """Collapse an engine type name to a comparison family.

    The driver's hasher is type-sensitive: DuckDB ``HUGEINT`` (int128,
    from SUM over integers) canonicalizes differently from Spark's
    BIGINT even when the values are equal (round-3 driver failures
    t_pack_sequences / t_sample_stratified / t_train_split). HUGEINT
    is therefore its own family so the local gate reproduces the
    driver's strictness; int widths below 64 bits are equivalent.
    """
    t = t.lower().strip()
    if t.startswith(("decimal", "numeric")):
        return "decimal"
    if "hugeint" in t or "int128" in t:
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "short", "byte", "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("varchar", "string", "text", "char"):
        return "str"
    if t in ("bool", "boolean"):
        return "bool"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t.startswith(("array", "list", "integer[]", "bigint[]", "varchar[]", "double[]", "float[]")) or t.endswith("[]"):
        return "array"
    if t.startswith(("struct", "row", "map")):
        return "nested"
    if t in ("binary", "blob", "bytea"):
        return "binary"
    return t


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from securities_data_pipeline_spark.session import get_spark
    from securities_data_pipeline_spark.sources.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(get_spark("oracle-check"), sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(srows)}")
            continue
        try:
            res = con.sql(sql)
            ocols = [c for c in res.columns]
            otypes = [str(t) for t in res.types]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            continue
        stypes = dict(sdf.dtypes)
        # DRIVER CONTRACT (VERDICT r9 item 1): the driver's
        # canonicalizer sorts result frames in pandas, which raises
        # ``TypeError: unhashable type`` on array/map/struct cells —
        # sim_kmeans_train/sim_pq_train shipped driver-RED in r9
        # because this gate stringified cells and passed them. A
        # registered query output must therefore be scalar columns
        # only; reject here so the divergence is caught in-repo.
        nonscalar = [
            (c, t)
            for c, t in list(stypes.items()) + list(zip(ocols, otypes))
            if type_family(t) in ("array", "nested")
        ]
        if nonscalar:
            failures.append(name)
            print(
                f"FAIL {name}: non-scalar output columns {nonscalar} — "
                "the driver canonicalizer cannot sort array/map/struct "
                "cells (flatten or stringify them)"
            )
            continue
        tmism = [
            (c, stypes[c], ot)
            for c, ot in zip(ocols, otypes)
            if type_family(stypes[c]) != type_family(ot)
        ]
        if tmism:
            failures.append(name)
            print(f"FAIL {name}: type-family mismatch (driver hasher is type-sensitive): {tmism}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(srows)} != {len(orows)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(cs, co)) if a != b)
            print(f"FAIL {name}: values differ, first at sorted-row {bad}:")
            print(f"  spark:  {cs[bad]}")
            print(f"  oracle: {co[bad]}")
            continue
        print(f"PASS {name} rows={len(srows)} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
