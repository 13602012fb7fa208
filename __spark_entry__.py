"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship single-pass fused profile on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text /
multimodal) — see data_profiler_spark/queries.py for the builders and the
portability rules (decimal-exact sums, rounded floats, md5-based hashes)
that make the DuckDB comparison bit-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_profiler_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the fused profile pass."""
    return _q.q_profile_lineitem(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
