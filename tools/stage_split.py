"""Per-stage wall/CPU split of the rollup pipeline (BENCH/BASELINE.md).

Runs the pipeline warm (one warm-up + one measured run) per parallelism
level in the TUNED get_spark session (SPARK_GRAFT_UI=1 turns the Spark UI
on so stage metrics are readable), then prints each measured-run stage's
task-time and wall (parsed from the REST API's submission/completion
timestamps). Usage: python tools/stage_split.py [cpus...]
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["SPARK_GRAFT_UI"] = "1"
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")


def _ts(s: str | None) -> float | None:
    if not s:
        return None
    return datetime.datetime.strptime(
        s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
    ).timestamp()


def run_level(cpus: int) -> None:
    from sits_spark.pipeline import RollupPipeline
    from sits_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus * 2, 16))
    try:
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        data = os.path.join(REPO, ".data", "bench_transcripts_v2")

        def stages() -> list[dict]:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            ) as r:
                return json.load(r)

        def host_counters() -> dict:
            """/proc/vmstat page faults + /proc/stat cpu jiffies: the
            split that distinguishes 'more work' from 'kernel fault
            service' from 'bandwidth-stalled user time'."""
            vm = {}
            with open("/proc/vmstat") as f:
                for line in f:
                    k, _, v = line.partition(" ")
                    if k in ("pgfault", "pgmajfault"):
                        vm[k] = int(v)
            with open("/proc/stat") as f:
                parts = f.readline().split()
            # user nice system idle iowait irq softirq steal ...
            vm["cpu_user_s"] = (int(parts[1]) + int(parts[2])) / 100.0
            vm["cpu_system_s"] = int(parts[3]) / 100.0
            vm["cpu_steal_s"] = int(parts[8]) / 100.0 if len(parts) > 8 else 0.0
            return vm

        wall = 0.0
        host = {}
        for warm in (True, False):
            wh = tempfile.mkdtemp(prefix=f"ss_{cpus}_", dir="/dev/shm")
            if warm:
                RollupPipeline(spark, wh).run(data, run_id="ss-w", resume=False)
                warm_ids = {s["stageId"] for s in stages()}
            else:
                h0 = host_counters()
                t0 = time.time()
                RollupPipeline(spark, wh).run(data, run_id="ss-m", resume=False)
                wall = time.time() - t0
                h1 = host_counters()
                host = {k: round(h1[k] - h0[k], 2) for k in h0}
                measured = [s for s in stages() if s["stageId"] not in warm_ids]
            shutil.rmtree(wh, ignore_errors=True)

        out = []
        for s in sorted(measured, key=lambda s: s["stageId"]):
            sub, comp = _ts(s.get("submissionTime")), _ts(s.get("completionTime"))
            out.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "task_time_s": round(s["executorRunTime"] / 1000.0, 1),
                    # on-CPU ns vs the wall-clock runTime above: the gap
                    # is descheduled time (hypervisor steal / runqueue)
                    "task_cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                    "wall_s": round(comp - sub, 2) if sub and comp else None,
                }
            )
        print(
            json.dumps(
                {"cpus": cpus, "wall": round(wall, 2), "host": host, "stages": out}
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    for c in [int(x) for x in (sys.argv[1:] or ["8", "32"])]:
        run_level(c)
