"""North-rule constraint classes on the synthetic code table: exact counts
of injected violations (FIXTURES.md §1) + per-row sha256 fidelity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.sources.code_table import generate_code_files
from data_profiler_spark.validator import Validator, add_partition_column


@pytest.fixture(scope="module")
def injected_counts(code_tables):
    files, commits = code_tables
    dup_rows = (
        files.groupBy("repo", "path", "commit")
        .count().where("count > 1")
        .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("n")).first()["n"]
    )
    orphan_rows = files.join(
        commits.select("repo", "commit"), ["repo", "commit"], "left_anti"
    ).count()
    null_rows = files.where(F.col("content").isNull()).count()
    return {"dups": int(dup_rows), "orphans": int(orphan_rows), "nulls": int(null_rows)}


def test_generator_determinism(spark, code_tables):
    from data_profiler_spark.sources.code_table import generate_code_files

    files, _ = code_tables
    again = generate_code_files(spark, 5000, seed=42, partitions=4)  # different parallelism
    assert again.count() == files.count()
    hsum = F.sum(
        F.xxhash64("repo", "path", "commit", "lang", "content").cast("decimal(38,0)")
    ).alias("h")
    h1 = files.agg(hsum).first()["h"]
    h2 = again.agg(hsum).first()["h"]
    assert h1 == h2


def test_uniqueness_exact_count(code_tables, injected_counts):
    files, _ = code_tables
    r = Validator(files).expect(
        "expect_compound_columns_to_be_unique", column_list=["repo", "path", "commit"]
    )
    assert r.unexpected_count == injected_counts["dups"]
    assert injected_counts["dups"] > 0
    assert r.success is False


def test_referential_exact_count(code_tables, injected_counts):
    files, commits = code_tables
    r = Validator(files, tables={"commits": commits}).expect(
        "expect_compound_columns_to_exist_in_table",
        column_list=["repo", "commit"],
        other_table_name="commits",
    )
    assert r.unexpected_count == injected_counts["orphans"]
    assert injected_counts["orphans"] > 0


def test_null_fraction(code_tables, injected_counts):
    files, _ = code_tables
    r = Validator(files).expect(
        "expect_column_values_to_not_be_null", column="content", mostly=0.99
    )
    assert r.unexpected_count == injected_counts["nulls"]
    assert r.success is True  # ~0.3% nulls < 1%


def test_duplicate_rows_have_identical_sha(code_tables):
    """Per-row fidelity invariant (BASELINE.json): duplicated rows carry
    identical content, so sha256(content) matches within a dup group."""
    files, _ = code_tables
    dup_groups = (
        files.withColumn("sha", F.sha2(F.coalesce(F.col("content"), F.lit("")), 256))
        .groupBy("repo", "path", "commit")
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("sha").alias("shas"))
        .where("n > 1")
    )
    bad = dup_groups.where("shas > 1").count()
    assert dup_groups.count() > 0
    assert bad == 0


def test_per_partition_verdicts(code_tables, injected_counts):
    files, commits = code_tables
    dfp = add_partition_column(files, n_buckets=8, cols=["repo", "path"])
    suite = (
        ConstraintSuite("north")
        .add("expect_column_values_to_not_be_null", column="content", mostly=0.98)
        .add("expect_compound_columns_to_be_unique", column_list=["repo", "path", "commit"])
        .add(
            "expect_compound_columns_to_exist_in_table",
            column_list=["repo", "commit"], other_table_name="commits", mostly=0.99,
        )
    )
    res = Validator(dfp, tables={"commits": commits}).validate(
        suite, group_by=["partition_id"]
    )
    assert len(res.results) == 8 * 3
    # per-partition unexpected counts sum to the global injected counts
    uniq = [r for r in res.results if r.constraint_type == "expect_compound_columns_to_be_unique"]
    assert sum(r.unexpected_count for r in uniq) == injected_counts["dups"]
    ref = [r for r in res.results if r.constraint_type == "expect_compound_columns_to_exist_in_table"]
    assert sum(r.unexpected_count for r in ref) == injected_counts["orphans"]
    nn = [r for r in res.results if r.constraint_type == "expect_column_values_to_not_be_null"]
    assert sum(r.unexpected_count for r in nn) == injected_counts["nulls"]
    assert sum(r.element_count for r in nn) == files.count()


def test_drift_detection_on_drifted_variant(spark, code_tables):
    """drifted=True shifts lang weights -> drift constraint must fail; the
    un-drifted variant against its own baseline must pass."""
    files, _ = code_tables
    base_counts = {
        r["lang"]: r["count"] for r in files.groupBy("lang").count().collect()
    }
    n = sum(base_counts.values())
    values = sorted(base_counts)
    baseline = {
        "values": values,
        "weights": [base_counts[v] / n for v in values],
        "n": n,
    }
    same = Validator(files).expect(
        "expect_column_distribution_to_match_baseline",
        column="lang", baseline=baseline, p=0.05,
    )
    assert same.success is True
    drifted = generate_code_files(spark, 5000, seed=42, drifted=True, partitions=8)
    moved = Validator(drifted).expect(
        "expect_column_distribution_to_match_baseline",
        column="lang", baseline=baseline, p=0.05,
    )
    assert moved.success is False
