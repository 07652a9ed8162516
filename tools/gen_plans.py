"""Generate BENCH/PLANS.md: physical-plan audit of headline operators.

Shows per query the operator chain (scan -> result), pushed filters, and
the asserted plan properties — pushed filters reach the scan, partial
aggregation, broadcast of small sides, Python only at Arrow seams.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHECKS = {
    "tpch_q1": ["PushedFilters", "HashAggregate"],
    "ts_regularize_first": ["partial_min_by"],
    "ts_grid_gapfill_day": ["Window"],
    "join_dim_rollup": ["BroadcastHashJoin"],
    "emb_ann_lsh_topk": ["BroadcastHashJoin"],
    # round-6: the band self-join was replaced by ONE groupBy (band, key)
    # with in-bucket pair generation — no join node at all, single scan
    "doc_minhash_lsh": ["HashAggregate", "Generate"],
    "ts_dtw_change": ["ArrowEvalPython", "Window"],
    "emb_mixture_nnls": [],
    "ts_bayts_change": ["Window"],
    # round-5: seed distances are literal expressions over the scan (no
    # join at all), aggregation partial; assignment is a window argmin
    "emb_cluster_dendro": ["HashAggregate", "Window"],
}

_SKIP = {
    "Input", "Output", "Arguments", "Functions", "Keys", "Results",
    "Condition", "Join", "Batched", "Location", "ReadSchema",
    "PushedFilters", "DataFilters", "PartitionFilters", "Format",
}


def main() -> None:
    from sits_spark.queries import REGISTRY
    from sits_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    sf = "/root/testdata/sf0.01"
    out = [
        "# Physical-plan audit (generated; `python tools/gen_plans.py`)",
        "",
        "Key plan properties per headline operator at sf0.01 — what to look",
        "for: pushed filters reach the scan, aggregations are partial",
        "(map-side combine), small sides broadcast, no cartesian outside the",
        "labeled yardstick, Python appears only at Arrow-batched seams.",
        "",
    ]
    for name, want in CHECKS.items():
        b, _ = REGISTRY[name]
        plan = b(spark, sf)._jdf.queryExecution().executedPlan().toString()
        ops = []
        for line in plan.splitlines():
            m = re.search(r"[+*:\- ]*\(?(\d+)?\)? ?([A-Za-z]+[A-Za-z0-9]*)", line)
            if m and m.group(2) not in _SKIP:
                ops.append(m.group(2))
        seq: list[str] = []
        for op in reversed(ops):
            if not seq or seq[-1] != op:
                seq.append(op)
        out.append(f"## {name}")
        out.append("")
        out.append("- operator chain (scan -> result): `" + " -> ".join(seq[:14]) + "`")
        if "PushedFilters: [" in plan:
            pf = plan.split("PushedFilters: [")[1].split("]")[0][:60]
            if pf:
                out.append(f"- pushed filters: `{pf}`")
        if want:
            flags = [f"{w}={'yes' if w in plan else 'MISSING'}" for w in want]
            out.append("- asserted properties: " + ", ".join(flags))
        out.append("")
    spark.stop()
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/PLANS.md")


if __name__ == "__main__":
    main()
