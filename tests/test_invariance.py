"""Standing partition-invariance gate: a representative slice of the
registry must produce identical values under a perturbed physical
config (7 shuffle partitions, 1 MB input splits, AQE off). The full
183-query sweep runs via ``tools/check_invariance.py``; this test keeps
the property from silently rotting between sweeps.

The slice covers each failure mode the sweep exists to catch:
- decimal-discipline aggregates (q1) — float sums would drift with
  reduce fan-in;
- window ties (w3) — must break on keys, not physical row order;
- hash-derived sampling/shuffling (t_global_shuffle, t_sample_weighted)
  — must not observe partition ids;
- salted skew aggregation (agg_salted_sum) — salts must cancel;
- LSH bucket expansion (dedup_minhash_pairs) — bucket contents must
  not depend on how rows were co-located;
- sketch contracts (a9_approx_percentile) — G-K merge must stay within
  its tolerance under any merge order.
"""

import sys

sys.path.insert(0, ".")

import pytest

from tools.check_invariance import PERTURB
from tools.check_oracle import canon

SF = "/root/testdata/sf0.001"

SLICE = [
    "q1_pricing_summary",
    "w3_topn_per_group",
    "t_global_shuffle",
    "t_sample_weighted",
    "agg_salted_sum",
    "dedup_minhash_pairs",
    "a9_approx_percentile",
]


@pytest.mark.parametrize("name", SLICE)
def test_values_invariant_under_physical_perturbation(spark, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    baseline = {k: spark.conf.get(k) for k in PERTURB}
    try:
        df = fn(spark, SF)
        a = canon(df.collect(), df.columns)
        for k, v in PERTURB.items():
            spark.conf.set(k, v)
        df2 = fn(spark, SF)
        b = canon(df2.collect(), df2.columns)
    finally:
        for k, v in baseline.items():
            spark.conf.set(k, v)
    assert a == b
