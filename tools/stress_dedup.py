"""Scale-stress the dedup family beyond the largest driver SF.

The sf-scaling table (SCALE.md) shows the dedup family as the repo's
steepest curve (~2.8x wall-time over 100x data). This harness pushes
one step further: it materializes an Nx-amplified ``documents`` table
(each replica re-keyed and, for non-zero replicas, content-perturbed so
near-dup structure grows realistically instead of collapsing into
exact clusters), then times the candidate-generation queries against
it and reports pair counts vs wall time.

The amplified table lives under ``<scratch_root>/sdp_dedup_stress``
(root defaults to /tmp; only that harness-owned subdirectory is ever
deleted) — the driver-provided testdata is never modified. Usage::

    python tools/stress_dedup.py [sf_dir] [factor] [scratch_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def amplify_documents(spark, sf_dir: str, factor: int, out_dir: str) -> str:
    """Write a factor-x documents table: replica 0 is the original
    corpus; replicas 1..factor-1 get distinct doc_ids and a per-replica
    token appended to the text — so every original near-dup pair gains
    factor^2 near-dup descendants while exact-dup collisions stay rare,
    matching how a growing crawl behaves."""
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    amplified = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n_docs * 10))
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string"))
            ),
        )
        .drop("rep")
    )
    path = os.path.join(out_dir, "documents.parquet")
    amplified.write.mode("overwrite").parquet(path)
    return path


def _extra_stress_queries():
    """Round-6 additions: the ingest-shaped asymmetric join and the
    binary block-sketch tier (rows counted = matches / pairs)."""
    from securities_data_pipeline_spark.operators.curation import t_quality_logreg
    from securities_data_pipeline_spark.operators.dedup import (
        dedup_banding_curve,
        dedup_incremental,
        dedup_link_prediction,
        dedup_link_prediction_capped,
        dedup_simhash_wide_capped,
    )
    from securities_data_pipeline_spark.operators.multimodal import (
        mm_near_dedup,
        mm_near_dedup_capped,
    )
    from securities_data_pipeline_spark.operators.sampling import t_split_leakage_free
    from securities_data_pipeline_spark.operators.textops import t_bm25_topk

    return [
        ("dedup_incremental", dedup_incremental),
        ("mm_near_dedup", mm_near_dedup),
        # r7: the dup-burst-robust tier — the 20x stress measured the
        # uncapped tier at 95x wall on 20x docs (16-bit sketch = 256
        # keys/band, buckets grow O(n)); the cap must hold wall ~linear
        ("mm_near_dedup_capped", mm_near_dedup_capped),
        # round-6 continued-session additions (documents-only surface):
        # retrieval scorer, graph link prediction, component-keyed
        # split, distributed GD training
        ("t_bm25_topk", t_bm25_topk),
        ("dedup_link_prediction", dedup_link_prediction),
        # r8 (VERDICT item 3): the capped twin — per-node neighbor
        # lists truncated to top-8 by minhash agreement BEFORE the
        # wedge join, so wedge volume is ≤ C(8,2) per center and wall
        # must stay ~linear where the uncapped tier grew 7.5x
        ("dedup_link_prediction_capped", dedup_link_prediction_capped),
        ("t_split_leakage_free", t_split_leakage_free),
        ("t_quality_logreg", t_quality_logreg),
        # r7 (VERDICT item 8): the banding-curve sweep re-runs the
        # signature build once per (bands, rows) config — wall must
        # stay ~linear in corpus and per-config, never quadratic
        ("dedup_banding_curve", dedup_banding_curve),
        # r7: the production simhash configuration (wide keys + cap) —
        # the uncapped wide tier OOMs at 20x (single-row m^2 pair
        # array), the capped demo tier keeps 0 pairs (saturation);
        # this one must stay ~linear AND keep real pairs
        ("dedup_simhash_wide_capped", dedup_simhash_wide_capped),
    ]


def main() -> int:
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # work strictly inside a harness-owned subdirectory of the given
    # scratch root — the cleanup rmtree below must never touch a
    # user-supplied directory's other contents (passing /tmp as the
    # root would otherwise delete all of /tmp at the end)
    scratch_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
    scratch = os.path.join(scratch_root, "sdp_dedup_stress")

    spark = get_spark("dedup-stress")
    os.makedirs(scratch, exist_ok=True)
    t0 = time.time()
    amp_path = amplify_documents(spark, sf_dir, factor, scratch)
    # the harness reads tables by sf_dir convention, so the scratch dir
    # doubles as an sf_dir containing only documents.parquet; the
    # stressed queries touch no other table
    prep_s = time.time() - t0

    from securities_data_pipeline_spark.operators.dedup import (
        dedup_minhash_pairs,
        dedup_minhash_pairs_capped,
        dedup_minhash_pairs_wide,
        dedup_ngram_jaccard_capped,
        dedup_resolve,
    )

    n_docs = spark.read.parquet(amp_path).count()
    results = {"sf_dir": sf_dir, "factor": factor, "n_docs": n_docs,
               "prep_sec": round(prep_s, 2), "queries": {}}
    for name, fn in [
        ("dedup_minhash_pairs", dedup_minhash_pairs),
        ("dedup_minhash_pairs_wide", dedup_minhash_pairs_wide),
        ("dedup_minhash_pairs_capped", dedup_minhash_pairs_capped),
        ("dedup_ngram_jaccard_capped", dedup_ngram_jaccard_capped),
        # the ITERATIVE path: LSH pairs → star contraction → survivors.
        # Round counts must stay O(log² n) as the amplified cliques fatten;
        # "pairs" here = surviving representatives, not candidate pairs
        ("dedup_resolve", dedup_resolve),
    ] + _extra_stress_queries():
        t = time.time()
        n_pairs = fn(spark, scratch).count()
        results["queries"][name] = {
            "pairs": n_pairs,
            "sec": round(time.time() - t, 2),
        }
        print(f"{name}: {n_pairs} pairs in {results['queries'][name]['sec']}s",
              file=sys.stderr)
    # triangle census: the wedge self-join is the quadratic-prone step —
    # record the counts, not just wall, so superlinear candidate growth
    # is visible even when wall still looks tame
    from securities_data_pipeline_spark.operators.dedup import dedup_triangle_stats

    t = time.time()
    tri = dedup_triangle_stats(spark, scratch).collect()[0]
    results["queries"]["dedup_triangle_stats"] = {
        "n_wedges": int(tri.n_wedges),
        "n_triangles": int(tri.n_triangles),
        "sec": round(time.time() - t, 2),
    }
    print(
        f"dedup_triangle_stats: {tri.n_wedges} wedges, "
        f"{tri.n_triangles} triangles in "
        f"{results['queries']['dedup_triangle_stats']['sec']}s",
        file=sys.stderr,
    )
    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
