"""SparkSession factory (reference entry point 1, /root/reference/src/lib.rs:9-16).

The reference initializes MPI + a per-rank logger; our equivalent is a
SparkSession tuned for iterative graph dataflow:

- AQE on (runtime coalescing + skew-join splitting replace the reference's
  counts-first buffer sizing, messagemanager.rs:191-235)
- Arrow on (all pandas-UDF paths are vectorized; BASELINE.json:15 forbids
  per-row Python)
- shuffle partitions sized to the machine, not the 200 default
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graftlouvain",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    On a real cluster this is a no-op: spark-submit supplies the master and
    the builder only layers SQL confs on top.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime bloom-filter injection is pathological for iterative
        # multi-join plans over checkpointed RDDs (sizeInBytes defaults to
        # Long.MaxValue per leaf; InjectRuntimeFilter's size-estimate products
        # degenerate into unbounded BigInteger math burning minutes of driver
        # CPU per superstep plan). Our superstep joins are full-table joins
        # with no selective filter side, so runtime filters cannot help them.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
