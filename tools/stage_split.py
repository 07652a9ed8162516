"""Per-stage 8-vs-32 wall split of the rollup pipeline (VERDICT r2 #2).

Runs the pipeline once per level in one JVM each, then pulls stage-level
metrics from the local Spark UI REST API and aggregates wall/task-time by
stage name. Usage: python tools/stage_split.py [cpus...]
"""
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int) -> list[dict]:
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    os.environ["SPARK_GRAFT_UI"] = "1"
    from sits_spark.pipeline import RollupPipeline
    from sits_spark.session import get_spark
    from pyspark.sql import SparkSession

    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = (
        get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16))
    )
    if spark.sparkContext.uiWebUrl is None:
        spark.stop()
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.ui.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    try:
        pass
        ui = spark.sparkContext.uiWebUrl; app_id = spark.sparkContext.applicationId
        data = os.path.join(REPO, ".data", "bench_transcripts_v2")
        for warm in (True, False):
            wh = tempfile.mkdtemp(prefix=f"ss_{cpus}_", dir="/dev/shm")
            t0 = time.time()
            RollupPipeline(spark, wh).run(data, run_id=f"ss-{warm}", resume=False)
            wall = time.time() - t0
            if warm:
                with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
                    warm_ids = {s["stageId"] for s in json.load(r)}
            else:
                with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
                    stages = [s for s in json.load(r) if s["stageId"] not in warm_ids]
            shutil.rmtree(wh, ignore_errors=True)
        out = []
        for s in stages:
            out.append({
                "stage": s["stageId"], "name": s["name"].split("\n")[0][:70],
                "tasks": s["numCompleteTasks"],
                "wall_s": round((s.get("completionTime_epoch", 0) or 0), 1),
                "task_time_s": round(s["executorRunTime"] / 1000.0, 1),
                "submit": s.get("submissionTime"), "complete": s.get("completionTime"),
            })
        print(json.dumps({"cpus": cpus, "wall": round(wall, 2), "stages": out}))
        return out
    finally:
        spark.stop()


if __name__ == "__main__":
    for c in [int(x) for x in (sys.argv[1:] or ["8", "32"])]:
        run_level(c)
