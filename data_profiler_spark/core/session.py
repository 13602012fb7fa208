"""SparkSession factory.

Mirrors the intent of the reference's ``get_or_create_spark_application``
(/root/reference/src/data_profiler/core/util.py:549-608) but tuned for an
analytics engine: AQE on, Arrow on, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    # guide §3.1/§9: let the planner pick shuffled-hash over sort-merge
    # when a build side fits per-partition (no sort, no spill for the
    # mid-size dims this engine joins); sort-merge still chosen when
    # neither side fits.
    "spark.sql.join.preferSortMergeJoin": "false",
    # guide §3.1: 10 MB default is sized for ~1 GB executors; dims that
    # this engine broadcasts (probe indexes, centroid tables, store
    # slices) are safe well above it on any modern executor. Env-tunable
    # for small-memory clusters.
    "spark.sql.autoBroadcastJoinThreshold": os.environ.get(
        "SPARK_GRAFT_AUTOBC", "64m"
    ),
}


def get_spark_session(
    app_name: str = "data_profiler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    ``shuffle_partitions`` defaults to the local core count — the default 200
    over-parallelizes local mode and under-parallelizes a real cluster; on a
    cluster leave AQE to coalesce.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = os.cpu_count() or 8 if n == "*" else int(n)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf["spark.default.parallelism"] = str(shuffle_partitions)
    # File scans bin-pack by COMPRESSED bytes; highly compressible text
    # (source code) otherwise collapses to 1-2 scan partitions and serializes
    # every aggregate. Force at least one split per core.
    conf["spark.sql.files.minPartitionNum"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_SESSION_WARM", "1") == "1":
        _warm_session(spark)
    return spark


_WARMED: set[str] = set()


def _warm_session(spark: SparkSession) -> None:
    """One-time, data-independent session initialization (~1-2 s).

    First use of each executor facility pays a class-load + codegen +
    worker-spawn tax that otherwise lands on whichever QUERY happens to
    touch it first (measured: ~2 s on the first parquet aggregate, ~5 s on
    the first Python-worker stage of a session while every worker imports
    pandas/numpy concurrently). Real clusters front-load this with
    executor preload / warm pools; locally we run three tiny synthetic
    jobs at session build: a parquet write+read+aggregate over /tmp (scan
    + HashAggregate + codegen paths), a rank window (sort exchange +
    WindowGroupLimit), and a trivial mapInPandas over one batch per core
    (spawns the Python worker pool and imports pandas/pyarrow once,
    amortized for every later Arrow stage). Synthetic inputs only — no
    engine table is touched, nothing is cached or reused by queries."""
    key = spark.sparkContext.applicationId
    if key in _WARMED:
        return
    _WARMED.add(key)
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        sc = spark.sparkContext
        cores = sc.defaultParallelism
        tmp = tempfile.mkdtemp(prefix="dps_warm_")
        try:
            path = os.path.join(tmp, "w.parquet")
            spark.range(1000).selectExpr(
                "id", "id % 7 AS k", "CAST(id AS DOUBLE) AS x"
            ).write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
            df.groupBy("k").agg(
                F.count(F.lit(1)), F.sum("x"), F.min("x"), F.max("x"),
                F.count_distinct("id"),
            ).collect()
            from pyspark.sql import Window

            w = Window.partitionBy("k").orderBy(F.desc("x"))
            df.withColumn("r", F.row_number().over(w)).where("r <= 2").count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        def _touch(batches):
            for b in batches:
                yield b

        spark.range(cores).repartition(cores).mapInPandas(
            _touch, "id long"
        ).count()
    except Exception:
        pass  # warm-up is best-effort; never block session creation
