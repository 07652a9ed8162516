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

MANIFEST_SCHEMA = (
    "tier string, bucket int, input_fingerprint string, row_count long, "
    "run_id string, seq long, gen string"
)

# Resume/commit granularity (Iceberg bucket(conv_id) stand-in). Since the
# fused single-write pipeline, write parallelism is the range-partition
# count — NOT tied to the bucket count — so buckets only size the resume
# unit and the directory fan-out. 64 keeps the sandbox's per-(bucket,day)
# files non-tiny; a 100 TB deployment would raise this (256-1024) via the
# RollupPipeline(n_buckets=...) parameter for finer-grained recovery.
N_BUCKETS = 64


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
    """Append-only manifest table under ``<warehouse>/_manifest``.

    Manifest rows are driver-side metadata (one row per committed conv
    bucket), so reads/writes go through pyarrow directly — zero Spark
    jobs. The layout stays plain parquet, readable by Spark/DuckDB.

    Writer discipline: ONE writer per warehouse at a time (the driver of
    the running pipeline). Concurrent readers are always safe (files are
    immutable once published); concurrent WRITERS from separate store
    instances can allocate the same seq (scan-then-increment is not
    locked), which the equal-seq tie-breaker below resolves
    deterministically by preferring the tombstone — conservative: the
    bucket reads as missing and gets recomputed rather than serving
    possibly-mixed output."""

    def __init__(self, spark: SparkSession, warehouse: str, storage=None):
        from .storage import LocalFsStorage

        self.spark = spark
        self.storage = storage or LocalFsStorage()
        self.path = os.path.join(warehouse, "_manifest")
        # incremental max-seq cache: only files not yet seen are read on
        # the next commit, so sequences stay correct even when ANOTHER
        # store instance wrote to the same warehouse in between (e.g. a
        # second pipeline object), at amortized O(new files) cost
        self._max_seq = 0
        self._seen_files: set[str] = set()

    def _read_all(self):
        import pyarrow.parquet as pq

        if not os.path.isdir(self.path):
            return []
        tables = []
        for f in sorted(os.listdir(self.path)):
            if f.endswith(".parquet") and not f.startswith("."):
                tables.append(pq.read_table(os.path.join(self.path, f)))
        return tables

    def committed_buckets(self, tier: str, fingerprint: str) -> set[int]:
        """Buckets whose LATEST manifest row (max seq) is a live commit.

        A tombstone (row_count == -1) written by ``invalidate`` before a
        bucket is rewritten supersedes earlier commits, so a run killed
        between the invalidate and the re-commit leaves the bucket
        visibly missing instead of silently claiming a half-written
        generation. Equal seq (possible only under the unsupported
        concurrent-writer case) resolves to the tombstone."""
        return {
            b
            for b, (_sq, rc, _gen) in self._latest(tier, fingerprint).items()
            if rc >= 0
        }

    def _latest(
        self, tier: str, fingerprint: str | None
    ) -> dict[int, tuple[int, int, str]]:
        """Latest (seq, row_count, gen) per bucket for a tier; with
        ``fingerprint=None`` rows of every fingerprint compete (the read
        path: newest commit wins regardless of input version)."""
        latest: dict[int, tuple[int, int, str]] = {}
        for t in self._read_all():
            d = t.to_pydict()
            n = len(d["tier"])
            seqs = d.get("seq") or [0] * n
            gens = d.get("gen") or [""] * n
            for tt, b, fpv, rc, sq, gen in zip(
                d["tier"], d["bucket"], d["input_fingerprint"], d["row_count"],
                seqs, gens,
            ):
                if tt != tier:
                    continue
                if fingerprint is not None and fpv != fingerprint:
                    continue
                sq = sq or 0
                cur = latest.get(b)
                if (
                    cur is None
                    or sq > cur[0]
                    # equal-seq tie: tombstone wins, deterministically
                    or (sq == cur[0] and rc < 0)
                ):
                    latest[b] = (sq, rc, gen or "")
        return latest

    def live_generations(self, tier: str) -> dict[int, str]:
        """bucket -> generation token of its newest LIVE commit (any
        fingerprint) — what the manifest-driven read path serves. A ""
        generation (pre-gen manifests) means "every file in the bucket
        directory belongs"."""
        return {
            b: gen
            for b, (_sq, rc, gen) in self._latest(tier, None).items()
            if rc >= 0
        }

    def _next_seq(self) -> int:
        """Next commit sequence = 1 + max over all manifest files, with
        per-file results cached: each file's seq column is read once per
        store instance, so repeated commits don't re-scan the directory
        but concurrent-instance commits are still observed."""
        import pyarrow.parquet as pq

        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if (
                    f.endswith(".parquet")
                    and not f.startswith(".")
                    and f not in self._seen_files
                ):
                    self._seen_files.add(f)
                    try:
                        col = pq.read_table(
                            os.path.join(self.path, f), columns=["seq"]
                        )["seq"].to_pylist()
                    except Exception:
                        col = []  # pre-seq manifest file -> seq 0
                    if col:
                        self._max_seq = max(
                            self._max_seq, max(s or 0 for s in col)
                        )
        self._max_seq += 1
        return self._max_seq

    def commit(
        self,
        rows: list[tuple[str, int, str, int, str]],
        seq: int | None = None,
        gen: str = "",
    ) -> None:
        self._write_rows(rows, seq, gen)

    def _write_rows(
        self,
        rows: list[tuple[str, int, str, int, str]],
        seq: int | None = None,
        gen: str = "",
    ) -> None:
        if not rows:
            return
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        if seq is None:
            seq = self._next_seq()
        table = pa.table(
            {
                "tier": [r[0] for r in rows],
                "bucket": pa.array([r[1] for r in rows], pa.int32()),
                "input_fingerprint": [r[2] for r in rows],
                "row_count": pa.array([r[3] for r in rows], pa.int64()),
                "run_id": [r[4] for r in rows],
                "seq": pa.array([seq] * len(rows), pa.int64()),
                "gen": [gen] * len(rows),
            }
        )
        sink = pa.BufferOutputStream()
        pq.write_table(table, sink)
        # atomic single-object publish (PUT semantics): readers never see
        # a partial manifest file on any backend
        name = f"commit-{uuid.uuid4().hex}.parquet"
        self.storage.put_atomic(
            os.path.join(self.path, name), sink.getvalue().to_pybytes()
        )
        # our own file needs no re-read on the next _next_seq scan
        self._seen_files.add(name)
        self._max_seq = max(self._max_seq, seq)

    def invalidate(
        self, tiers: list[str], buckets: list[int], fingerprint: str, run_id: str
    ) -> None:
        """Tombstone (tier, bucket) rows under ``fingerprint`` BEFORE they
        are rewritten (row_count = -1, superseding seq)."""
        self._write_rows(
            [(t, b, fingerprint, -1, run_id) for t in tiers for b in buckets]
        )

    def plan_missing(
        self, tier: str, fingerprint: str, n_buckets: int = N_BUCKETS
    ) -> list[int]:
        """Planned buckets minus committed ones (the anti-join)."""
        done = self.committed_buckets(tier, fingerprint)
        return [b for b in range(n_buckets) if b not in done]


def footer_counts(tier_path: str) -> dict[int, int]:
    """Per-bucket row counts from parquet FOOTERS only (no Spark job, no
    data scan) — the metadata-only stand-in for Iceberg's per-partition
    statistics. Serial ``pq.read_metadata`` is ~0.05 ms/file; a thread
    pool is measurably SLOWER here (GIL contention on tmpfs metadata)."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    for root, _dirs, files in os.walk(tier_path):
        bucket = None
        for part in root.split(os.sep):
            if part.startswith("bucket="):
                bucket = int(part.split("=", 1)[1])
        if bucket is None:
            continue
        for f in files:
            if f.endswith(".parquet"):
                n = pq.read_metadata(os.path.join(root, f)).num_rows
                counts[bucket] = counts.get(bucket, 0) + n
    return counts


def write_tier(
    df: DataFrame,
    tier_path: str,
    day_col: str,
) -> DataFrame:
    """Write ONE standalone tier partitioned by (bucket, day) — the
    parquet-compatible analog of Iceberg ``bucket(conv_id), days(ts)``
    (BASELINE.md input shape). Dynamic partition overwrite keeps bucket
    rewrites idempotent.

    The main pipeline no longer uses this (it writes all tiers in one
    fused pass, sits_spark.pipeline); kept for standalone tier exports."""
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
