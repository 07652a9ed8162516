"""spark-submit entry point for the rollup pipeline (north-rule
deployment shape: ``spark-submit --py-files sits_spark.zip -m`` or
``python -m sits_spark`` locally).

Uses ``SparkSession.builder.getOrCreate()`` so cluster managers'
spark-submit configuration (master, executors, memory) applies verbatim;
only engine-required settings (UTC session time, Arrow) are layered on
top. Exit code 0 iff every planned bucket committed.

Example::

    spark-submit --py-files sits_spark.zip \
        $(python -c 'import sits_spark, os; print(os.path.join(os.path.dirname(sits_spark.__file__), "__main__.py"))') \
        --input s3://bucket/transcripts --warehouse s3://bucket/tiers \
        --run-id nightly-2025-01-30
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sits_spark", description=__doc__)
    p.add_argument("--input", required=True, help="transcript table path")
    p.add_argument("--warehouse", required=True, help="tier output root")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--no-resume", action="store_true",
                   help="recompute every bucket (default: resume from manifest)")
    p.add_argument("--tiers", default="1h,1d", help="comma list of agg tiers")
    p.add_argument("--no-pack", action="store_true", help="skip Gorilla blocks")
    p.add_argument("--checkpoint-groups", type=int, default=1)
    p.add_argument("--giant-span-chunks", type=int, default=2,
                   help="split convs spanning more than N 8-day chunks "
                        "across tasks; -1 disables")
    p.add_argument("--from-observed", action="store_true",
                   help="input is a pre-aggregated observed-slot table "
                        "(streaming sink layout); compact it instead")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from .pipeline import RollupPipeline

    spark = (
        SparkSession.builder.appName("sits-spark-rollup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    gsc = None if args.giant_span_chunks < 0 else args.giant_span_chunks
    pipe = RollupPipeline(spark, args.warehouse, giant_span_chunks=gsc)
    tiers = tuple(t.strip() for t in args.tiers.split(",") if t.strip())
    if args.from_observed:
        out = pipe.run_from_observed(
            args.input, run_id=args.run_id, resume=not args.no_resume,
            tiers=tiers, with_pack=not args.no_pack,
        )
    else:
        out = pipe.run(
            args.input, run_id=args.run_id, resume=not args.no_resume,
            tiers=tiers, with_pack=not args.no_pack,
            checkpoint_groups=args.checkpoint_groups,
        )
    import json

    from .manifest import input_fingerprint

    fp = input_fingerprint(args.input)
    remaining = {
        t: pipe.store.plan_missing(t, fp, pipe.n_buckets) for t in out
    }
    print(json.dumps({"outputs": out, "missing_buckets": remaining}))
    return 0 if not any(remaining.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
