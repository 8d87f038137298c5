"""Partition-count invariance sweep: the distribution-independence gate.

The oracle gate (check_oracle.py) proves Spark matches DuckDB at ONE
fixed session config. This tool proves a different axis of the 100 TB
claim: every query's VALUES must be independent of how the data happens
to be partitioned — because on a real cluster the partition count is a
function of cluster size, AQE decisions, and file layout, none of which
a correct query may observe. Each query runs twice in one session:

- baseline: the session defaults (shuffle.partitions=32 on the test rig,
  128 MB input splits);
- perturbed: ``spark.sql.shuffle.partitions=7`` and
  ``spark.sql.files.maxPartitionBytes=1MB`` (forces many input splits,
  different scan partitioning, different reduce fan-in).

Both are runtime confs, so no session restart is needed. Results are
canonicalized exactly like the oracle gate (column-name-sorted, rows
sorted, floats to 9 significant digits — so this certifies invariance
at the driver's own equality standard) and compared.

What this catches that the oracle gate structurally cannot:
summation-order-dependent float aggregates (partial sums merge in a
different order under a different reduce fan-in), partition-id-derived
values leaking into results, per-partition LIMIT/head nondeterminism,
and window ties broken by physical row order instead of a key.

Streaming queries are included — their AvailableNow micro-batch plans
re-execute from scratch per call with fresh checkpoints.

Usage: python tools/check_invariance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from tools.check_oracle import canon  # noqa: E402  (same equality standard)

PERTURB = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(1 << 20),
    # AQE off: results must not depend on runtime re-planning (coalesced
    # partitions, demoted broadcasts, skew splits) any more than on the
    # static partition count
    "spark.sql.adaptive.enabled": "false",
}


def main() -> int:
    import __spark_entry__ as e
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("sdp-invariance")
    baseline = {k: spark.conf.get(k) for k in PERTURB}
    qs = e.queries()
    failures, errors = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            for k, v in baseline.items():
                spark.conf.set(k, v)
            df = fn(spark, sf_dir)
            a = canon(df.collect(), df.columns)
            for k, v in PERTURB.items():
                spark.conf.set(k, v)
            df2 = fn(spark, sf_dir)
            b = canon(df2.collect(), df2.columns)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            errors.append(name)
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")
            continue
        finally:
            for k, v in baseline.items():
                spark.conf.set(k, v)
        if a == b:
            print(f"PASS {name} rows={len(a)} ({time.time() - t0:.1f}s)")
        else:
            failures.append(name)
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
            print(
                f"FAIL {name}: rows {len(a)} vs {len(b)}, "
                f"first diffs at {diff[:3]}"
            )
            for i in diff[:2]:
                print(f"  base: {a[i]}")
                print(f"  pert: {b[i]}")
    print(f"\n{len(failures)} invariance failures, {len(errors)} errors")
    if failures:
        print("failed:", failures)
    return 1 if failures or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
