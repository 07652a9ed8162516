"""Export sinks: CSV (and delimited-text) extraction of tiers and results.

The Spark analog of the reference's CSV exports — ``sits_to_csv``
(samples -> csv, /root/reference/R/sits_csv.R:35-48) and
``sits_timeseries_to_csv`` (time-series wide table,
/root/reference/R/sits_csv.R:85-99): deterministic ordering, explicit
header, ISO timestamps. Binary tier columns (Gorilla blobs) are hex-coded
so the export stays valid text.

Spark-first notes: the write is a plain distributed ``df.write.csv`` when
``single_file=False`` (one part per partition — the 100 TB path), and a
coalesce(1) only for the explicitly-requested single-file convenience
export (driver-side bottleneck by design, intended for samples/summaries,
exactly the reference's use case)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _textify(df: DataFrame) -> DataFrame:
    """Make every column CSV-safe: binary -> hex, timestamp -> ISO-8601."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.BinaryType):
            c = F.hex(c).alias(f.name)
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            c = F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss").alias(f.name)
        elif isinstance(f.dataType, T.ArrayType):
            c = F.to_json(c).alias(f.name)
        else:
            c = c.alias(f.name)
        cols.append(c)
    return df.select(*cols)


def export_csv(
    df: DataFrame,
    path: str,
    order_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Write a DataFrame as CSV with header. ``order_by`` gives a
    deterministic row order (global sort); ``single_file`` coalesces to
    one part file (convenience export for small results)."""
    out = _textify(df)
    if order_by:
        out = out.orderBy(*order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", "true").csv(path)


def export_tier_csv(pipe, tier: str, path: str, single_file: bool = False) -> None:
    """Export one retention tier (sits_timeseries_to_csv analog)."""
    key = {"tier_1m": "slot_start", "agg": "window_start", "packed_1h": "window_start"}[tier]
    export_csv(pipe.read_tier(tier), path, order_by=["conv_id", key], single_file=single_file)
