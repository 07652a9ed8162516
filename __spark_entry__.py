"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship grouped time-series reduction on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (registry in sits_spark.queries, one DuckDB oracle per
SQL-expressible query) plus the transcript rollup engine itself:

- ``transcript_ev_*`` — the engine kernels over a transcript table
  derived deterministically from the driver's ``events`` view; oracle
  SQL references ONLY registered views (sandbox-safe), hash-checked.
- ``transcript_*_ints``/``transcript_pack_meta`` — the same engine path
  over the deterministic fixture (oracle reads the fixture parquet;
  needs external file access).
- ``transcript_tier_1m``/``_agg_*``/``_packed_1h`` — full tiers incl.
  smoothed floats/Gorilla blobs: rows-only here, byte-matched against
  the single-node oracle in pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sits_spark.facade_queries import FACADE_REGISTRY
from sits_spark.queries import REGISTRY, ts_reduce_stats
from sits_spark.transcript_queries import (
    TRANSCRIPT_ORACLES,
    TRANSCRIPT_QUERIES,
    ensure_fixture,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full temporal-reduce
    statistics per series key (sits_reduce kernel family,
    /root/reference/src/reduce_fns.cpp:12-92)."""
    return ts_reduce_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: builder for name, (builder, _sql) in REGISTRY.items()
    }
    out.update({name: builder for name, (builder, _sql) in FACADE_REGISTRY.items()})
    out.update(TRANSCRIPT_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    # the fixture-based transcript oracles read the deterministic fixture
    # parquet by absolute path — make sure it exists before DuckDB runs.
    # Never let fixture materialization failure (read-only checkout,
    # sandboxed FS) take down the whole oracle dict: the events-derived
    # transcript_ev_* oracles need no files at all.
    try:
        ensure_fixture()
    except OSError:
        pass
    out = {name: sql for name, (_builder, sql) in REGISTRY.items()}
    out.update({name: sql for name, (_builder, sql) in FACADE_REGISTRY.items()})
    out.update(TRANSCRIPT_ORACLES)
    return out
