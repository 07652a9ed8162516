"""Transcript-engine queries for the driver contract (rows-only checks).

These run the actual rollup engine on the deterministic synthetic
transcript table (BASELINE.json input_hint — generated in-process, seeded;
the driver's sf tables are not transcript-shaped). They are not
SQL-expressible (grouped pandas-UDF kernels: gap fill, Savitzky-Golay,
Whittaker, Gorilla packing), so no oracle_sql entries exist — pytest
byte-matches them against the single-node oracle instead
(tests/test_spark_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .operators import regularize, rollup

_N_CONVS = 150
_SEED = 42


def _transcripts(spark: SparkSession) -> DataFrame:
    pdf = fixtures.gen_transcripts(_N_CONVS, seed=_SEED, hot_turns=1500)
    return spark.createDataFrame(pdf)


def transcript_tier_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw turns -> dense gap-filled smoothed 1-minute tier."""
    return regularize.tier_1m(_transcripts(spark))


def transcript_agg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1m tier -> 1h continuous aggregates."""
    t1m = regularize.tier_1m(_transcripts(spark))
    return rollup.rollup_tiers(t1m, ("1h",)).where(F.col("tier") == "1h").drop("tier")


def transcript_agg_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1m tier -> 1d continuous aggregates."""
    t1m = regularize.tier_1m(_transcripts(spark))
    return rollup.rollup_tiers(t1m, ("1d",)).where(F.col("tier") == "1d").drop("tier")


def transcript_packed_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla-packed (conv, hour) blocks of the smoothed band."""
    t1m = regularize.tier_1m(_transcripts(spark))
    return rollup.pack_blocks(t1m)


TRANSCRIPT_QUERIES = {
    "transcript_tier_1m": transcript_tier_1m,
    "transcript_agg_1h": transcript_agg_1h,
    "transcript_agg_1d": transcript_agg_1d,
    "transcript_packed_1h": transcript_packed_1h,
}
