"""Round-6 measurement harness (bench.py is FROZEN; extra evidence here).

Modes:
  python bench_extra.py queries [sf_dir] [reps]  - per-headline-query times
      (count() exactly like the frozen bench, plus a noop-sink run) on
      local[$SPARK_GRAFT_CPUS]; prints one JSON line.
  python bench_extra.py plans <outdir> [sf_dir]  - dump explain("formatted")
      for every headline query into <outdir>/<name>.txt.

Methodology per spark_optimization_guide.md §1: warm session, per-query
min over reps (host noise is additive), jobs labelled for the UI.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

HEADLINE_QUERIES = [
    "tpch_q1",
    "ts_reduce_stats",
    "ts_grid_gapfill_day",
    "ts_asof_zipper",
    "ts_regularize_first",
    "ts_cascade_1h_1d",
    "ts_rolling_focal",
    "ts_bayts_change",
    "join_dim_rollup",
    "doc_dedup_exact",
    "doc_text_quality",
    "emb_knn_cosine",
    "emb_ann_lsh_topk",
    "ts_dtw_change",
    "emb_mixture_nnls",
    "doc_minhash_lsh",
]


def _session():
    from sits_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)


def cmd_queries(sf_dir: str, reps: int) -> None:
    from sits_spark.queries import REGISTRY

    spark = _session()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out: dict[str, dict] = {}
    for name in HEADLINE_QUERIES:
        builder, _sql = REGISTRY[name]
        counts, noops = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: count")
            t0 = time.time()
            builder(spark, sf_dir).count()
            counts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "count_min": min(counts),
            "noop_min": min(noops),
            "count_all": counts,
            "noop_all": noops,
        }
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))


def cmd_plans(outdir: str, sf_dir: str) -> None:
    from sits_spark.queries import REGISTRY

    os.makedirs(outdir, exist_ok=True)
    spark = _session()
    for name in HEADLINE_QUERIES:
        builder, _sql = REGISTRY[name]
        df = builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
    spark.stop()
    print(f"plans written to {outdir}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        cmd_queries(sf_dir, reps)
    elif mode == "plans":
        outdir = sys.argv[2]
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf1.0"
        cmd_plans(outdir, sf_dir)
    else:
        raise SystemExit(f"unknown mode {mode}")
