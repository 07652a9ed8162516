"""sits_spark — a PySpark-native time-series rollup + downsample +
retention engine over conversation/agent transcript tables.

Re-expresses the reference pipeline of e-sensing/sits (regularize ->
impute -> smooth -> temporal reduce; see SURVEY.md) as idiomatic Spark:
DataFrame/Catalyst plans for grids, joins and integer aggregates, and
Arrow-batched grouped pandas UDFs for the smoothing kernels. No per-row
Python anywhere.
"""

__version__ = "0.1.0"
