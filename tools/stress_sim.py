"""Scale-stress the similarity/ANN family beyond the largest driver SF.

Counterpart of ``tools/stress_dedup.py`` for SCALE.md §6: amplify the
sf0.1 embeddings table N× (re-keyed replicas with a small deterministic
per-replica perturbation on one dimension, so vectors stay near their
original neighborhoods without exact duplication), then time each ANN
tier and record candidate/row counts vs wall time. Queries stay the
fixed vec_id<5 set; centroid/donor strides pick up proportionally more
centroids, so this also exercises the probe-fraction behavior the
sim_ivf_recall floor documents.

Works strictly inside ``<scratch_root>/sdp_sim_stress`` (root defaults
to /tmp; only that harness-owned subdirectory is ever deleted). Usage::

    python tools/stress_sim.py [sf_dir] [factor] [scratch_root] [query ...]

Trailing query names restrict the sweep to that subset (used by the
r11 retrain-certificate scale rows, where the rest of the family
already has recorded 10×/20× rows).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def amplify_embeddings(spark, sf_dir: str, factor: int, out_dir: str) -> str:
    from pyspark.sql import functions as F

    from securities_data_pipeline_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    reps = spark.range(factor).withColumnRenamed("id", "rep")
    amplified = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn(
            "embedding",
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                # nudge dim 0 by rep/1000 — keeps replicas near (not on)
                # the original, so neighborhoods densify realistically
                F.concat(
                    F.array(
                        (F.col("embedding")[0] + F.col("rep") / F.lit(1000.0)).cast(
                            "float"
                        )
                    ),
                    F.slice(F.col("embedding"), 2, 63),
                )
            ),
        )
        .withColumn(
            "vec_id",
            F.when(F.col("rep") == 0, F.col("vec_id")).otherwise(
                F.col("vec_id") + F.col("rep") * F.lit(n * 10)
            ),
        )
        .drop("rep")
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    amplified.write.mode("overwrite").parquet(path)
    return path


def main() -> int:
    from securities_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    scratch_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp"
    only = set(sys.argv[4:])
    scratch = os.path.join(scratch_root, "sdp_sim_stress")

    spark = get_spark("sim-stress")
    os.makedirs(scratch, exist_ok=True)
    t0 = time.time()
    amp_path = amplify_embeddings(spark, sf_dir, factor, scratch)
    prep_s = time.time() - t0

    from securities_data_pipeline_spark.operators.similarity import (
        dedup_embedding_cosine,
        sim_ivf_retrain_recall,
        sim_ivf_topk,
        sim_kmeans_train,
        sim_lsh_topk,
        sim_pq_rerank_topk,
        sim_pq_retrain_recall,
    )
    from securities_data_pipeline_spark.operators.curation import (
        dedup_semdedup,
        dedup_semdedup_capped,
    )
    from securities_data_pipeline_spark.operators.similarity_ivfpq import (
        sim_ivfpq_rerank_topk,
    )

    n_vecs = spark.read.parquet(amp_path).count()
    results = {"sf_dir": sf_dir, "factor": factor, "n_vecs": n_vecs,
               "prep_sec": round(prep_s, 2), "queries": {}}
    for name, fn in [
        ("sim_ivf_topk", sim_ivf_topk),
        ("sim_kmeans_train", sim_kmeans_train),
        ("sim_lsh_topk", sim_lsh_topk),
        ("sim_pq_rerank_topk", sim_pq_rerank_topk),
        ("sim_ivfpq_rerank_topk", sim_ivfpq_rerank_topk),
        ("dedup_embedding_cosine", dedup_embedding_cosine),
        # fixed K=8 is the oracle demo geometry: cluster sizes grow with
        # the corpus, so the within-cluster pair volume is quadratic BY
        # DESIGN here — the stress row documents the decay the K dial
        # (K ~ n/target_cluster_size in production) exists to prevent
        ("dedup_semdedup", dedup_semdedup),
        ("dedup_semdedup_capped", dedup_semdedup_capped),
        # r11: the two retrain certificates — the claim under test is
        # "exact ground truth computes ONCE, assignment/encode passes
        # are linear in the corpus", so wall growth should track the
        # amplification factor ~linearly
        ("sim_ivf_retrain_recall", sim_ivf_retrain_recall),
        ("sim_pq_retrain_recall", sim_pq_retrain_recall),
    ]:
        if only and name not in only:
            continue
        t = time.time()
        rows = fn(spark, scratch).count()
        results["queries"][name] = {"rows": rows, "sec": round(time.time() - t, 2)}
        print(f"{name}: {rows} rows in {results['queries'][name]['sec']}s",
              file=sys.stderr)
    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
