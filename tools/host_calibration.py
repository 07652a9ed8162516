"""Pure-CPU host scaling ceiling: repeated SHA-256 over spark.range —
no Python workers, no shuffle, no I/O, cache-resident. What this VM can
physically deliver from N to 4N cores bounds ANY workload's scaling
efficiency; BENCH/BASELINE.md reports the rollup efficiency alongside
this ceiling measured in the SAME session/phase.

Usage: python tools/host_calibration.py [lo hi rounds]  (default 2 8 3)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cpus: int, reps: int) -> None:
    sys.path.insert(0, REPO)
    from sits_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    try:
        walls = []
        for i in range(reps + 1):  # first = warm-up
            t0 = time.time()
            # 64 partitions of hash chains: cache-resident JVM codegen work
            spark.sql(
                "SELECT max(x) FROM ("
                " SELECT sha2(cast(id + rep AS string), 256) AS x"
                " FROM range(0, 6000000, 1, 64)"
                " CROSS JOIN (SELECT explode(sequence(1, 4)) AS rep))"
            ).collect()
            if i:
                walls.append(round(time.time() - t0, 2))
        print(json.dumps({"walls": walls}))
    finally:
        spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    lo, hi, rounds = 2, 8, 3
    if len(sys.argv) > 3:
        lo, hi, rounds = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    t = {lo: [], hi: []}
    for _ in range(rounds):
        for cpus in (hi, lo):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(cpus), "2"],
                capture_output=True, text=True, cwd=REPO, timeout=1200,
            )
            if out.returncode != 0:
                raise RuntimeError(out.stderr[-1500:])
            t[cpus] += json.loads(out.stdout.strip().splitlines()[-1])["walls"]
    b_lo, b_hi = min(t[lo]), min(t[hi])
    print(json.dumps({
        "lo": lo, "hi": hi, "wall_lo": b_lo, "wall_hi": b_hi,
        "ceiling": round(b_lo / b_hi / (hi / lo), 3),
        "all_lo": t[lo], "all_hi": t[hi],
    }))


if __name__ == "__main__":
    main()
