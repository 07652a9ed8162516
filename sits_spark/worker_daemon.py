"""Pre-warmed PySpark worker daemon (``spark.python.daemon.module``).

The stock daemon forks a bare interpreter per worker; each worker then
imports numpy/pyarrow/pandas + the engine's kernel modules on its first
task (~0.5 s CPU and tens of MB of fresh pages per worker). Importing them
ONCE here, in the daemon process, lets every forked worker inherit the
already-initialized modules as shared copy-on-write pages — N workers pay
the import cost zero times instead of N times. This matters doubly on
hosts where fresh-page faults are a globally serialized resource (see
sits_spark.session).

The reference's analog is worker pools inheriting the loaded package
state through ``parallel::makeCluster`` forks (R/api_parallel.R).
"""

# heavyweight third-party imports first (largest CoW win)
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.parquet  # noqa: F401

# engine kernel modules used inside mapInArrow/pandas UDFs
from sits_spark import batching, codec, engine_core, kernels  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
