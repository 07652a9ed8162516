"""Checkpoint/lineage manifests + resume.

Re-expresses the reference's resume-from-partial-output pattern — skip jobs
whose outputs already exist, recompute only the missing set
(`.gc_missing_tiles` convergence loop, /root/reference/R/api_gdalcubes.R:506-660;
recovery checks /root/reference/R/api_regularize.R:134-144,
R/api_apply.R:64-79) — without the directory-rescan loop: each completed
unit of work commits one manifest row, and a restarted job anti-joins its
planned units against committed rows.

Unit of work = one conv_id hash **bucket** (the Spark analog of a sits
tile): a conversation's whole series lives in exactly one bucket, so
recomputing a bucket is self-contained (smoothing never crosses buckets).
Output files are additionally laid out by day for partition pruning, but
the day axis is not a resume unit (a conv's grid spans days).

Manifest row: (tier, bucket, input_fingerprint, row_count, run_id).
``input_fingerprint`` stands in for an Iceberg snapshot-id in the parquet
fallback layout (SURVEY.md §7 hard part 3): a hash of the input file
listing (names + sizes), so a changed input invalidates old checkpoints
without scanning data.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "tier string, bucket int, input_fingerprint string, row_count long, run_id string"

N_BUCKETS = 16


def bucket_expr(conv_col: str = "conv_id", n_buckets: int = N_BUCKETS):
    """Deterministic conv bucket — Iceberg-style bucket(conv_id) stand-in."""
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


def input_fingerprint(path: str) -> str:
    """Metadata-only input identity: md5 over the sorted (relpath, size)
    listing. The parquet-mode stand-in for an Iceberg snapshot-id."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            entries.append(f"{os.path.relpath(full, path)}:{os.path.getsize(full)}")
    digest = hashlib.md5("\n".join(sorted(entries)).encode()).hexdigest()
    return digest


class ManifestStore:
    """Append-only manifest table under ``<warehouse>/_manifest``."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.path = os.path.join(warehouse, "_manifest")

    def committed_buckets(self, tier: str, fingerprint: str) -> set[int]:
        if not os.path.isdir(self.path):
            return set()
        df = self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        rows = (
            df.where((F.col("tier") == tier) & (F.col("input_fingerprint") == fingerprint))
            .select("bucket")
            .distinct()
            .collect()
        )
        return {r.bucket for r in rows}

    def commit(self, rows: list[tuple[str, int, str, int, str]]) -> None:
        if not rows:
            return
        df = self.spark.createDataFrame(rows, MANIFEST_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def plan_missing(
        self, tier: str, fingerprint: str, n_buckets: int = N_BUCKETS
    ) -> list[int]:
        """Planned buckets minus committed ones (the anti-join)."""
        done = self.committed_buckets(tier, fingerprint)
        return [b for b in range(n_buckets) if b not in done]


def write_tier(
    df: DataFrame,
    tier_path: str,
    day_col: str,
) -> DataFrame:
    """Write one tier partitioned by (bucket, day) — the parquet-compatible
    analog of Iceberg ``bucket(conv_id), days(ts)`` (BASELINE.md input
    shape). Dynamic partition overwrite keeps bucket rewrites idempotent."""
    out = df.withColumn("bucket", bucket_expr()).withColumn(
        "day", F.to_date(F.col(day_col))
    )
    # shuffle onto the partition keys so each (bucket, day) directory is
    # written by exactly one task — one file per partition instead of
    # one-per-task-per-partition (small-file explosion at scale)
    out = out.repartition(F.col("bucket"), F.col("day"))
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket", "day")
        .parquet(tier_path)
    )
    return out
