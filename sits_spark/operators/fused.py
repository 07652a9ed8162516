"""Fused single-pass tier computation: observed slots -> {1m grid, 1h/1d
aggregates, packed blocks} in ONE mapInArrow stage.

At 10^12-turn scale the dominant cost is touching the series data; once a
conversation's grid is materialized in memory, the rollup and packing of
that same grid are marginal. This operator therefore computes every tier
in a single conv-batched pass — the Spark analog of the reference
computing every requested band in one chunk traversal
(/root/reference/R/api_apply.R:114-138 block loop).

Two sinks over the same kernel stream:

- ``fused_tiers``: a UNION-schema DataFrame (``row_kind`` in
  {slot, agg, pack}) for downstream DataFrame composition.
- ``fused_write``: an Arrow-native partitioned-table writer — each task
  writes its (row_kind, bucket, day) parquet files directly via pyarrow
  and returns only per-partition row-count stats. This is the
  DataSourceV2-writer pattern realized at the operator level: the input
  is already range-clustered by (bucket, conv_id), so the write needs no
  repartition exchange and no partition sort, each tier's files carry its
  OWN narrow schema (no union nulls), and the 3-tier fan-out costs one
  action instead of three. Idempotent under task retry: file names are
  deterministic per (partition dir, task partition id) and content is a
  pure function of the input split. Atomicity/visibility is owned by the
  pipeline's manifest commit (sits_spark.manifest), exactly as Iceberg
  writers hand visibility to the catalog commit.

Per-conv math is identical to operators.regularize/rollup (shared
engine_core kernels), so byte-exactness vs the oracle is unchanged —
asserted in tests/test_spark_pipeline.py.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from .. import engine_core
from ..batching import arrow_conv_batches, conv_bounds, record_batch, schema_of
from .regularize import _INT_COLS, _OBS_COLS, TIER_1M_SCHEMA
from .rollup import PACK_SCHEMA, ROLLUP_SCHEMA

FUSED_SCHEMA = (
    "row_kind string, conv_id string, slot_start timestamp, present boolean, "
    "n_turns long, tokens_user long, tokens_assistant long, tokens_tool long, "
    "tool_calls long, alen double, fill_flag string, alen_filled double, "
    "alen_sg double, alen_whit double, "
    "tier string, window_start timestamp, n_slots long, "
    "turn_rate double, tool_call_rate double, alen_mean double, "
    "alen_min double, alen_max double, alen_median double, alen_std double, "
    "n int, first_ts long, first_val double, ts_d2 binary, vals_gorilla binary, "
    "bucket int, day date"
)
_FUSED_PA = schema_of(FUSED_SCHEMA)

TIER_1M_COLS = [f.split(" ")[0] for f in TIER_1M_SCHEMA.split(", ")]
ROLLUP_COLS = [f.split(" ")[0] for f in ROLLUP_SCHEMA.split(", ")]
PACK_COLS = [f.split(" ")[0] for f in PACK_SCHEMA.split(", ")]

# per-kind on-disk file schema (partition cols bucket/day live in the path)
_KIND_PA = {
    "slot": schema_of(TIER_1M_SCHEMA),
    "agg": schema_of(ROLLUP_SCHEMA),
    "pack": schema_of(PACK_SCHEMA),
}
_KIND_TS = {"slot": "slot_start", "agg": "window_start", "pack": "window_start"}
TIER_OF_KIND = {"slot": "tier_1m", "agg": "agg", "pack": "packed_1h"}

STATS_SCHEMA = "tier string, bucket int, rows long"
_STATS_PA = schema_of(STATS_SCHEMA)


def require_no_speculation(spark) -> None:
    """Every PartitionedWriter-based job writes deterministic file names
    with no output-commit coordinator — safe under sequential task retry,
    unsafe under concurrent attempts of one task (speculation)."""
    if spark.conf.get("spark.speculation", "false").lower() == "true":
        raise RuntimeError(
            "direct tier writes require spark.speculation=false: concurrent "
            "task attempts would write the same deterministic file names. "
            "Use manifest.write_tier (Spark-committed) or disable speculation."
        )


def _tier_stream(
    it: Iterator[pa.RecordBatch], tiers: tuple[str, ...], with_pack: bool
):
    """Kernel core: yields (kind, columns, n_rows) per conv-batch, where
    ``columns`` maps each output column (timestamps as int64 epoch-µs,
    plus ``bucket`` int32 and ``day`` int32 epoch-days) to a numpy array."""
    for tbl in arrow_conv_batches(it):
        cid = tbl["conv_id"]
        slot = tbl["slot_s"]
        bkt = tbl["bucket"]
        starts, bounds = conv_bounds(cid)
        n_convs = len(starts)

        # --- dense grids + band pipeline, flat across the whole batch ---
        grid, gb = engine_core.scatter_grid_flat(
            slot, bounds, {c: tbl[c] for c in _OBS_COLS}
        )
        filled, sg, whit, flags = engine_core.band_pipeline_flat(
            grid["alen"], gb, grid["slot_start_s"][gb[:-1]] // 60
        )

        # --- slot rows ---
        lens = np.diff(gb)
        n_slot = int(gb[-1])
        slot_s_all = grid["slot_start_s"]
        slot_data: dict[str, np.ndarray] = {
            "conv_id": np.repeat(cid[starts], lens),
            "slot_start": slot_s_all * 1_000_000,
            "bucket": np.repeat(bkt[starts], lens),
            "day": (slot_s_all // 86400).astype(np.int32),
            "alen": grid["alen"],
            "fill_flag": flags,
            "alen_filled": filled,
            "alen_sg": sg,
            "alen_whit": whit,
        }
        for k in _INT_COLS:
            slot_data[k] = grid[k]
        yield "slot", slot_data, n_slot

        # --- agg + pack over the already-flat grid columns (one
        # vectorized pass per tier across ALL convs in the batch) ---
        flat = {
            "slot_start_s": slot_s_all,
            "alen_whit": slot_data["alen_whit"],
        }
        for k in engine_core._SUM_COLS:
            flat[k] = slot_data[k]
        gb = np.zeros(n_convs + 1, dtype=np.int64)
        np.cumsum(lens, out=gb[1:])
        conv_arr = cid[starts]
        bkt_arr = bkt[starts].astype(np.int32)

        parts = [
            (tier, *engine_core.rollup_flat(flat, gb, engine_core.TIER_SECONDS[tier]))
            for tier in tiers
        ]
        n_agg = sum(len(cw) for _t, _c, cw in parts)
        agg_win = np.concatenate([c["window_start_s"] for _t, c, _w in parts])
        agg_data = {
            "conv_id": np.concatenate([conv_arr[cw] for _t, _c, cw in parts]),
            "bucket": np.concatenate([bkt_arr[cw] for _t, _c, cw in parts]),
            "tier": np.concatenate(
                [np.full(len(cw), t, dtype=object) for t, _c, cw in parts]
            ),
            "window_start": agg_win * 1_000_000,
            "day": (agg_win // 86400).astype(np.int32),
        }
        for k in engine_core.ROLLUP_COLS:
            if k != "window_start_s":
                agg_data[k] = np.concatenate([c[k] for _t, c, _w in parts])
        yield "agg", agg_data, n_agg

        if with_pack:
            pcols, pcw = engine_core.pack_flat(flat, gb, 3600)
            pk_win = pcols["window_start_s"]
            pack_data = {
                "conv_id": conv_arr[pcw],
                "bucket": bkt_arr[pcw],
                "window_start": pk_win * 1_000_000,
                "day": (pk_win // 86400).astype(np.int32),
                "n": pcols["n"],
                "first_ts": pcols["first_ts"],
                "first_val": pcols["first_val"],
                "ts_d2": np.array(pcols["ts_d2"], dtype=object),
                "vals_gorilla": np.array(pcols["vals_gorilla"], dtype=object),
            }
            yield "pack", pack_data, len(pcw)


def _fused_iter(tiers: tuple[str, ...], with_pack: bool = True):
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for kind, data, n in _tier_stream(it, tiers, with_pack):
            data = dict(data)
            data["row_kind"] = np.full(n, kind, dtype=object)
            yield record_batch(data, _FUSED_PA, n)

    return fn


def _cluster(observed: DataFrame, partitions: int | None) -> DataFrame:
    """Range-cluster by (bucket, conv_id) and sort — a conversation stays
    whole inside one task and each task's output covers few buckets, so a
    (bucket, day)-partitioned write needs no further exchange."""
    from .. import manifest as mf

    n = partitions or int(
        observed.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        observed.withColumn("bucket", mf.bucket_expr())
        .repartitionByRange(n, "bucket", "conv_id")
        .sortWithinPartitions("bucket", "conv_id", "slot_s")
    )


def fused_tiers(
    observed: DataFrame,
    tiers: tuple[str, ...] = ("1h", "1d"),
    partitions: int | None = None,
    with_pack: bool = True,
) -> DataFrame:
    """Observed 1-minute slots -> union-schema stream of all tiers."""
    return _cluster(observed, partitions).mapInArrow(
        _fused_iter(tiers, with_pack), FUSED_SCHEMA
    )


# flush thresholds per row_kind: bound task memory to ~flush-size per kind
# regardless of how much data the task's key range holds (a skewed range
# at 100x otherwise buffers its whole multi-GB output before writing).
# Both limits apply — rows for the narrow tiers, bytes for blob-carrying
# pack rows whose size per row is unbounded. Env-overridable so the
# bench can A/B writer knobs without code churn.
FLUSH_ROWS = int(os.environ.get("SPARK_GRAFT_FLUSH_ROWS", 1 << 18))
FLUSH_BYTES = int(os.environ.get("SPARK_GRAFT_FLUSH_BYTES", 64 << 20))
# lz4 over zstd for the tier files: the fused kernel+write stage is the
# scaling bottleneck (its total CPU inflates ~40% from 2 -> 8 cores under
# memory-bandwidth contention), and the parquet encoder's CPU is a big
# share of it. Measured interleaved at local[8] on the bench table:
# lz4 min 29.7 s vs zstd 33.9 s (-12% wall), and the 2 -> 8 scaling
# ratio improves because the saved CPU is concentrated in the parallel
# stage. The tier floats are smoothed doubles (high entropy), so zstd's
# better ratio bought little on the dominant columns anyway; the packed
# blob tier is already Gorilla-compressed before parquet sees it.
WRITE_COMPRESSION = os.environ.get("SPARK_GRAFT_COMPRESSION", "lz4")

# Dictionary-encode ONLY the low-cardinality string columns (round 6,
# guide §6 file layout): pyarrow dictionary-encodes every column by
# default, and on the dominant high-entropy columns (smoothed doubles,
# exact int sums, Gorilla blobs) the dictionary build is pure CPU with a
# guaranteed fallback — measured 0.71 s -> 0.30 s per 1M-row flush
# (2.4x) on tier-shaped data at equal file size (51.7 vs 52.2 MB).
_DICT_COLS = {
    "slot": ["conv_id", "fill_flag"],
    "agg": ["conv_id", "tier"],
    "pack": ["conv_id"],
}

# Column statistics likewise only where a reader can use them for
# row-group skipping — the partition/series keys and the time axis
# (read_tier filters conv_id and slot/window ranges; read_agg filters
# tier). Stats on the measure and blob columns are encoder CPU nobody
# reads: min/max of smoothed doubles or Gorilla blobs prune nothing.
# Measured on tier-shaped data: 0.31 -> 0.26 s per 1M-row flush.
_STAT_COLS = {
    "slot": ["conv_id", "fill_flag", "slot_start"],
    "agg": ["conv_id", "tier", "window_start"],
    "pack": ["conv_id", "window_start", "first_ts"],
}

_PART_SCHEMA = pa.schema([("bucket", pa.int32()), ("day", pa.date32())])


class PartitionedWriter:
    """Incremental Arrow-native (bucket, day)-partitioned writer.

    Accumulates kernel output per row_kind and flushes to
    ``pads.write_dataset`` every FLUSH_ROWS rows — each flush gets a
    deterministic basename (task partition id + flush index + ``label``),
    so a sequential task retry overwrites the same files with the same
    content (the input split and kernel stream are deterministic).
    ``label`` disambiguates independent write jobs targeting the same
    table (e.g. the normal and giant-conv passes); ``gen`` is the write
    action's generation token — unique per action, fixed at plan build,
    so names are unique ACROSS actions (no cross-run overwrite; stale
    generations stay invisible to manifest-driven readers and are
    reclaimed by vacuum) yet deterministic WITHIN one (retry-safe).

    Writer-backend note (measured, round 4): an alternative that keeps
    one persistent ``pq.ParquetWriter`` per (bucket, day) and appends a
    row group per flush was tried and REVERTED — per-task cProfile at
    local[32] showed 13k ~1k-row ``write_table`` calls costing 116
    CPU-s vs ``write_dataset``'s 48 CPU-s for the same data;
    write_dataset's single C++ pass groups and encodes all partitions of
    a flush at ~0.4 ms each, which Python-side per-partition calls
    cannot match. The fused stage's residual 8->32 CPU inflation is
    host memory bandwidth (BENCH/BASELINE.md calibration), not writer
    overhead."""

    def __init__(
        self,
        table_path: str,
        pid: int,
        label: str = "n",
        flush_rows: int | None = None,
        flush_bytes: int | None = None,
        gen: str = "",
    ):
        import pyarrow.dataset as pads

        self._pads = pads
        self.table_path = table_path
        self.pid = pid
        self.label = f"g{gen}-{label}" if gen else label
        self.flush_rows = flush_rows or FLUSH_ROWS
        self.flush_bytes = flush_bytes or FLUSH_BYTES
        self._acc: dict[str, list[pa.RecordBatch]] = {}
        self._acc_rows: dict[str, int] = {}
        self._acc_bytes: dict[str, int] = {}
        self._flush_idx: dict[str, int] = {}
        self._counts: dict[str, np.ndarray] = {}
        self._opts = {
            kind: pads.ParquetFileFormat().make_write_options(
                compression=WRITE_COMPRESSION,
                use_dictionary=cols,
                write_statistics=_STAT_COLS[kind],
            )
            for kind, cols in _DICT_COLS.items()
        }

    def add(self, kind: str, data: dict[str, np.ndarray], n: int) -> None:
        if not n:
            return
        schema = _KIND_PA[kind]
        full = pa.schema(
            list(schema)
            + [pa.field("bucket", pa.int32()), pa.field("day", pa.date32())]
        )
        rb = record_batch(data, full, n)
        self._acc.setdefault(kind, []).append(rb)
        self._acc_rows[kind] = self._acc_rows.get(kind, 0) + n
        self._acc_bytes[kind] = self._acc_bytes.get(kind, 0) + rb.nbytes
        c = self._counts.get(kind)
        bc = np.bincount(data["bucket"], minlength=len(c) if c is not None else 0)
        self._counts[kind] = bc if c is None else (
            bc + np.pad(c, (0, len(bc) - len(c))) if len(bc) >= len(c)
            else c + np.pad(bc, (0, len(c) - len(bc)))
        )
        if (
            self._acc_rows[kind] >= self.flush_rows
            or self._acc_bytes[kind] >= self.flush_bytes
        ):
            self._flush(kind)

    def _flush(self, kind: str) -> None:
        rbs = self._acc.pop(kind, None)
        if not rbs:
            return
        self._acc_rows[kind] = 0
        self._acc_bytes[kind] = 0
        fi = self._flush_idx.get(kind, 0)
        self._flush_idx[kind] = fi + 1
        # Arrow C++ groups rows by (bucket, day) and writes the hive
        # layout directly — order inside each file is preserved
        self._pads.write_dataset(
            pa.Table.from_batches(rbs),
            os.path.join(self.table_path, f"row_kind={kind}"),
            format="parquet",
            partitioning=self._pads.partitioning(_PART_SCHEMA, flavor="hive"),
            basename_template=f"part-{self.label}{self.pid:05d}-{fi:04d}-{{i}}.parquet",
            file_options=self._opts[kind],
            existing_data_behavior="overwrite_or_ignore",
            max_partitions=1 << 20,
            max_open_files=4096,
        )

    def stats_batch(self) -> pa.RecordBatch:
        """Flush everything and return the per-(tier, bucket) row counts."""
        for kind in list(self._acc):
            self._flush(kind)
        tiers_out: list[str] = []
        buckets_out: list[int] = []
        rows_out: list[int] = []
        for kind, bc in self._counts.items():
            for b in np.flatnonzero(bc):
                tiers_out.append(TIER_OF_KIND[kind])
                buckets_out.append(int(b))
                rows_out.append(int(bc[b]))
        return record_batch(
            {
                "tier": np.array(tiers_out, dtype=object),
                "bucket": np.array(buckets_out, dtype=np.int32),
                "rows": np.array(rows_out, dtype=np.int64),
            },
            _STATS_PA,
            len(tiers_out),
        )


def _write_iter(
    table_path: str,
    tiers: tuple[str, ...],
    with_pack: bool,
    flush_rows: int | None = None,
    flush_bytes: int | None = None,
    gen: str = "",
):
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        writer = PartitionedWriter(
            table_path, pid, flush_rows=flush_rows, flush_bytes=flush_bytes,
            gen=gen,
        )
        prof_dir = os.environ.get("SPARK_GRAFT_TASK_PROFILE_DIR")
        prof = None
        if prof_dir:
            import cProfile

            prof = cProfile.Profile()
            prof.enable()
        for kind, data, n in _tier_stream(it, tiers, with_pack):
            writer.add(kind, data, n)
        out = writer.stats_batch()
        if prof is not None:
            prof.disable()
            prof.dump_stats(os.path.join(prof_dir, f"task-{pid:05d}.prof"))
        yield out

    return fn


def fused_write(
    observed: DataFrame,
    table_path: str,
    tiers: tuple[str, ...] = ("1h", "1d"),
    partitions: int | None = None,
    with_pack: bool = True,
    flush_rows: int | None = None,
    flush_bytes: int | None = None,
    gen: str = "",
) -> DataFrame:
    """Observed 1-minute slots -> partitioned tier table on disk.

    Returns the (lazy) per-(tier, bucket) row-count stats DataFrame; the
    caller's action on it IS the write job.

    Constraint: tasks write deterministic file names with no output-commit
    coordinator, which is only safe when a task attempt cannot run twice
    concurrently — i.e. speculation off. Idempotent under sequential task
    RETRY (same name, same content); enforced here rather than assumed."""
    require_no_speculation(observed.sparkSession)
    return _cluster(observed, partitions).mapInArrow(
        _write_iter(table_path, tiers, with_pack, flush_rows, flush_bytes, gen),
        STATS_SCHEMA,
    )


def slot_tier(fused: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return fused.where(F.col("row_kind") == "slot").select(*TIER_1M_COLS)


def agg_tier(fused: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return fused.where(F.col("row_kind") == "agg").select(*ROLLUP_COLS)


def pack_tier(fused: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return fused.where(F.col("row_kind") == "pack").select(*PACK_COLS)
