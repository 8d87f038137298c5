"""The drift canary (bench.py) must stay frozen and runnable."""

import statistics


def test_canary_refs_cover_all_canaries():
    import bench

    assert set(bench._CANARY_REF) == set(bench._CANARIES)
    assert all(v > 0 for v in bench._CANARY_REF.values())


def test_canaries_run_and_produce_rows(spark):
    import bench

    for name, fn in bench._CANARIES.items():
        assert fn(spark, "/root/testdata/sf0.001").count() > 0, name


def test_canary_ratio_math(spark, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "CANARY_REPEATS", 1)
    timings, ratio = bench._run_canaries(spark, "/root/testdata/sf0.001", 0.1)
    assert set(timings) == set(bench._CANARY_REF)
    expect = statistics.median(
        timings[k] / bench._CANARY_REF[k] for k in timings
    )
    assert abs(ratio - expect) < 0.01
    # at a non-reference SF the ratio is undefined, timings still emit
    t2, r2 = bench._run_canaries(spark, "/root/testdata/sf0.001", 0.001)
    assert r2 is None and set(t2) == set(bench._CANARY_REF)
