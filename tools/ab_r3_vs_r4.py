"""Same-session interleaved A/B: r3 pipeline (worktree .ab_r3 @ bee6891)
vs HEAD, identical input, local[8].  Each arm runs its OWN checkout's
bench.py --pipeline-worker (workers are identical between the tags —
verified by diff; only comments changed), so the measured window is the
same.  Arms are interleaved within each round so a host noise phase hits
both arms equally.  Optional extra arms isolate suspects via env knobs
that only exist at HEAD (compression).
"""
import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
R3 = os.path.join(REPO, ".ab_r3")
DATA = os.path.join(REPO, ".data", "bench_transcripts_v2")
CPUS = sys.argv[1] if len(sys.argv) > 1 else "8"
REPS = sys.argv[2] if len(sys.argv) > 2 else "2"
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

ARMS = [
    ("r4", REPO, {}),
    ("r3", R3, {}),
    ("r4-zstd", REPO, {"SPARK_GRAFT_COMPRESSION": "zstd"}),
]
if len(sys.argv) > 4 and sys.argv[4] == "noz":
    ARMS = ARMS[:2]

results = {name: [] for name, _, _ in ARMS}
for rnd in range(ROUNDS):
    for name, cwd, env_extra in ARMS:
        env = dict(os.environ, **env_extra)
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.join(cwd, "bench.py"),
             "--pipeline-worker", CPUS, DATA, REPS],
            capture_output=True, text=True, cwd=cwd, timeout=3600, env=env,
        )
        if out.returncode != 0:
            print(f"ARM {name} FAILED:\n{out.stderr[-3000:]}", flush=True)
            sys.exit(1)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        results[name].append(r["elapsed"])
        print(json.dumps({"round": rnd, "arm": name, "elapsed": r["elapsed"],
                          "points": r["points"],
                          "session_wall": round(time.time() - t0, 1)}),
              flush=True)

summary = {
    name: {"min": min(x for xs in results[name] for x in xs),
           "all": [x for xs in results[name] for x in xs]}
    for name in results
}
print("SUMMARY " + json.dumps(summary), flush=True)
