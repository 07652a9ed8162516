"""End-to-end rollup pipeline: raw transcripts -> 1m -> {1h, 1d, packed}.

The Spark re-expression of the reference's chunked physical pipeline
(/root/reference/R/api_classify.R:32-246 skeleton; regularize entry
R/sits_regularize.R:170-246): Catalyst handles scan + pruning + the slot
aggregation, grouped pandas UDFs handle the per-series kernels, manifests
handle resume, and tier outputs land partitioned by
(bucket(conv_id), day) — the parquet-compatible Iceberg layout.

Shuffle budget per run (see .explain() in tests):
  raw -> observed slots      1 exchange (partial agg map-side first)
  observed -> per-conv UDF   1 exchange (hash on conv_id)
  1m -> rollup UDF           1 exchange on the (much smaller) 1m tier,
                             computing BOTH 1h and 1d in a single pass
  1m -> pack UDF             1 exchange (same width)
An explicit repartitionByRange(conv_id) before the grouped stages keeps
hot conversations spread by range boundaries (north rule); integer-sum
re-aggregation additionally has the salted Catalyst path in
operators.rollup.rollup_sums_catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import manifest as mf
from .operators import regularize, rollup


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

    # -- stage runners --------------------------------------------------

    def _run_buckets(
        self,
        tier: str,
        fingerprint: str,
        buckets: list[int],
        build: "callable",
        day_col: str,
        run_id: str,
    ) -> None:
        """Compute + commit one tier for the given conv buckets."""
        if not buckets:
            return
        df = build(buckets)
        out_path = self.tier_path(tier)
        mf.write_tier(df, out_path, day_col)
        written = self.spark.read.parquet(out_path).where(
            F.col("bucket").isin(buckets)
        )
        counts = {
            r["bucket"]: r["cnt"]
            for r in written.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        self.store.commit(
            [(tier, b, fingerprint, counts.get(b, 0), run_id) for b in buckets]
        )

    def run(
        self,
        input_path: str,
        run_id: str = "run-0",
        resume: bool = True,
        tiers: tuple[str, ...] = ("1h", "1d"),
        with_pack: bool = True,
    ) -> dict[str, str]:
        """Run (or resume) the full pipeline over a transcript table on disk.

        Returns {tier_name: output_path}. With ``resume=True``, buckets
        already committed for this input fingerprint are skipped — the
        anti-join resume pattern (sits' `.gc_missing_tiles`,
        /root/reference/R/api_gdalcubes.R:713-760).
        """
        spark = self.spark
        fp = mf.input_fingerprint(input_path)
        raw = spark.read.parquet(input_path)

        def bucket_filter(df: DataFrame, buckets: list[int]) -> DataFrame:
            if len(buckets) == self.n_buckets:
                return df
            return df.where(mf.bucket_expr().isin(buckets))

        # ---- tier_1m: raw -> dense smoothed minute grid ----
        t1m_buckets = (
            self.store.plan_missing("tier_1m", fp, self.n_buckets)
            if resume
            else list(range(self.n_buckets))
        )

        def build_t1m(buckets: list[int]) -> DataFrame:
            df = bucket_filter(raw, buckets).repartitionByRange(
                self.range_partitions, "conv_id"
            )
            return regularize.tier_1m(df)

        self._run_buckets("tier_1m", fp, t1m_buckets, build_t1m, "slot_start", run_id)

        t1m = spark.read.parquet(self.tier_path("tier_1m"))
        out = {"tier_1m": self.tier_path("tier_1m")}

        # ---- agg tiers: both in one grouped pass over the 1m tier ----
        agg_buckets = (
            self.store.plan_missing("agg", fp, self.n_buckets)
            if resume
            else list(range(self.n_buckets))
        )
        if agg_buckets:
            agg = rollup.rollup_tiers(
                bucket_filter(t1m, agg_buckets).repartitionByRange(
                    self.range_partitions, "conv_id"
                ),
                tiers,
            )
            agg_path = self.tier_path("agg")
            mf.write_tier(agg, agg_path, "window_start")
            written = self.spark.read.parquet(agg_path).where(
                F.col("bucket").isin(agg_buckets)
            )
            counts = {
                r["bucket"]: r["cnt"]
                for r in written.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
            }
            self.store.commit(
                [("agg", b, fp, counts.get(b, 0), run_id) for b in agg_buckets]
            )
        out["agg"] = self.tier_path("agg")

        # ---- packed blocks ----
        if with_pack:
            pack_buckets = (
                self.store.plan_missing("packed_1h", fp, self.n_buckets)
                if resume
                else list(range(self.n_buckets))
            )

            def build_pack(buckets: list[int]) -> DataFrame:
                return rollup.pack_blocks(
                    bucket_filter(t1m, buckets).repartitionByRange(
                        self.range_partitions, "conv_id"
                    )
                )

            self._run_buckets(
                "packed_1h", fp, pack_buckets, build_pack, "window_start", run_id
            )
            out["packed_1h"] = self.tier_path("packed_1h")
        return out

    # -- readers ---------------------------------------------------------

    def read_tier(self, tier: str) -> DataFrame:
        df = self.spark.read.parquet(self.tier_path(tier))
        return df

    def read_agg(self, tier: str) -> DataFrame:
        return self.read_tier("agg").where(F.col("tier") == tier)
