"""End-to-end rollup pipeline: raw transcripts -> 1m -> {1h, 1d, packed}.

The Spark re-expression of the reference's chunked physical pipeline
(/root/reference/R/api_classify.R:32-246 skeleton; regularize entry
R/sits_regularize.R:170-246): Catalyst handles scan + pruning + the slot
aggregation, Arrow-batched kernels handle the per-series math, manifests
handle resume, and tier outputs land partitioned by
(bucket(conv_id), day) — the parquet-compatible Iceberg layout.

Job budget per run — exactly THREE Spark actions:
  1. tier_1m write: scan -> slot agg (1 exchange, map-side partial) ->
     range-partition+sort by conv (1 exchange) -> grid/fill/smooth
     (mapInArrow) -> persist -> (bucket, day) exchange -> parquet
  2. agg write:  cached clustered 1m tier -> rollup mapInArrow (both
     tiers, zero new shuffles before the write exchange)
  3. pack write: cached clustered 1m tier -> Gorilla mapInArrow
Row counts come from parquet footers and manifest commits go through
pyarrow — all driver-side metadata, zero extra Spark jobs; each stage
commits its manifest rows as soon as its write lands (per-stage
checkpointing, so a kill between stages resumes exactly there). Hot-conversation
skew is pre-reduced by the slot aggregation; the integer re-aggregation
path additionally has the salted two-phase variant
(operators.rollup.rollup_sums_catalyst).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as mf
from .operators import fused, regularize, rollup


class RollupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        n_buckets: int = mf.N_BUCKETS,
        range_partitions: int | None = None,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.n_buckets = n_buckets
        self.range_partitions = range_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        self.store = mf.ManifestStore(spark, warehouse)

    def tier_path(self, tier: str) -> str:
        return os.path.join(self.warehouse, tier)

    def run(
        self,
        input_path: str,
        run_id: str = "run-0",
        resume: bool = True,
        tiers: tuple[str, ...] = ("1h", "1d"),
        with_pack: bool = True,
    ) -> dict[str, str]:
        """Run (or resume) the full pipeline over a transcript table on disk.

        Returns {tier_name: output_path}. With ``resume=True``, conv
        buckets already committed for this input fingerprint are skipped —
        the anti-join resume pattern (sits' `.gc_missing_tiles`,
        /root/reference/R/api_gdalcubes.R:713-760).
        """
        fp = mf.input_fingerprint(input_path)
        raw = self.spark.read.parquet(input_path)

        def plan(tier: str) -> list[int]:
            if not resume:
                return list(range(self.n_buckets))
            return self.store.plan_missing(tier, fp, self.n_buckets)

        def bucket_filter(df: DataFrame, buckets: list[int]) -> DataFrame:
            if len(buckets) == self.n_buckets:
                return df
            return df.where(mf.bucket_expr().isin(buckets))

        out: dict[str, str] = {}

        t1m_buckets = plan("tier_1m")
        agg_buckets = plan("agg")
        pack_buckets = plan("packed_1h") if with_pack else t1m_buckets

        def commit_tier(tier: str, path: str, buckets: list[int]) -> None:
            counts = mf.footer_counts(path)
            self.store.commit(
                [(tier, b, fp, counts.get(b, 0), run_id) for b in buckets]
            )

        # ---- fused fast path: every pending stage needs the same conv
        # buckets, so compute ALL tiers in one kernel pass over the data
        # and derive each tier write by filter+projection from the cache
        if (
            t1m_buckets
            and set(t1m_buckets) == set(agg_buckets)
            and (not with_pack or set(pack_buckets) == set(t1m_buckets))
        ):
            observed = regularize.observed_slots(bucket_filter(raw, t1m_buckets))
            f = fused.fused_tiers(observed, tiers, self.range_partitions).persist()
            mf.write_tier(fused.slot_tier(f), self.tier_path("tier_1m"), "slot_start")
            commit_tier("tier_1m", self.tier_path("tier_1m"), t1m_buckets)
            mf.write_tier(fused.agg_tier(f), self.tier_path("agg"), "window_start")
            commit_tier("agg", self.tier_path("agg"), agg_buckets)
            out["tier_1m"] = self.tier_path("tier_1m")
            out["agg"] = self.tier_path("agg")
            if with_pack:
                mf.write_tier(
                    fused.pack_tier(f), self.tier_path("packed_1h"), "window_start"
                )
                commit_tier("packed_1h", self.tier_path("packed_1h"), pack_buckets)
                out["packed_1h"] = self.tier_path("packed_1h")
            f.unpersist()
            return out

        # ---- staged path (partial resume): recompute only missing stages
        clustered: DataFrame | None = None
        if t1m_buckets:
            t1m = regularize.tier_1m(
                bucket_filter(raw, t1m_buckets), self.range_partitions
            )
            clustered = rollup.cluster_by_conv(t1m, self.range_partitions).persist()
            mf.write_tier(clustered, self.tier_path("tier_1m"), "slot_start")
            counts = mf.footer_counts(self.tier_path("tier_1m"))
            self.store.commit(
                [("tier_1m", b, fp, counts.get(b, 0), run_id) for b in t1m_buckets]
            )
        out["tier_1m"] = self.tier_path("tier_1m")

        # the in-memory clustered tier only covers the buckets stage 1
        # computed; a partially-resumed run must fall back to disk
        if clustered is not None and len(t1m_buckets) != self.n_buckets:
            clustered.unpersist()
            clustered = None

        def clustered_1m(buckets: list[int]) -> DataFrame:
            nonlocal clustered
            if clustered is None:
                # resumed run: tier_1m already on disk; cluster it once
                t1m = self.spark.read.parquet(self.tier_path("tier_1m"))
                clustered = rollup.cluster_by_conv(
                    t1m, self.range_partitions
                ).persist()
            return bucket_filter(clustered, buckets)

        # ---- stage 2: both agg tiers in one pass (one action) ----
        if agg_buckets:
            agg = rollup.rollup_tiers(
                clustered_1m(agg_buckets), tiers, pre_clustered=True
            )
            mf.write_tier(agg, self.tier_path("agg"), "window_start")
            counts = mf.footer_counts(self.tier_path("agg"))
            self.store.commit(
                [("agg", b, fp, counts.get(b, 0), run_id) for b in agg_buckets]
            )
        out["agg"] = self.tier_path("agg")

        # ---- stage 3: packed blocks (one action) ----
        if with_pack:
            if pack_buckets:
                pk = rollup.pack_blocks(
                    clustered_1m(pack_buckets), pre_clustered=True
                )
                mf.write_tier(pk, self.tier_path("packed_1h"), "window_start")
                counts = mf.footer_counts(self.tier_path("packed_1h"))
                self.store.commit(
                    [
                        ("packed_1h", b, fp, counts.get(b, 0), run_id)
                        for b in pack_buckets
                    ]
                )
            out["packed_1h"] = self.tier_path("packed_1h")

        if clustered is not None:
            clustered.unpersist()
        return out

    # -- readers ---------------------------------------------------------

    def read_tier(self, tier: str) -> DataFrame:
        return self.spark.read.parquet(self.tier_path(tier))

    def read_agg(self, tier: str) -> DataFrame:
        return self.read_tier("agg").where(F.col("tier") == tier)
