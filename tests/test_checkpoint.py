"""Resumability (FIXTURES.md §5): a partially-completed run resumes by
validating only missing partitions, and final verdicts match a from-scratch
run exactly."""

from __future__ import annotations

import pytest

from data_profiler_spark.checkpoint import CheckpointRunner
from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.sources.results_store import ResultsStore
from data_profiler_spark.validator import add_partition_column


@pytest.fixture()
def suite():
    return (
        ConstraintSuite("ckpt")
        .add("expect_column_values_to_not_be_null", column="content", mostly=0.98)
        .add("expect_compound_columns_to_be_unique", column_list=["repo", "path", "commit"])
    )


def _verdict_key(r):
    return (r["partition_id"], r["constraint_id"])


def test_checkpoint_resume(spark, code_tables, suite, tmp_path):
    files, commits = code_tables
    dfp = add_partition_column(files, n_buckets=6, cols=["repo", "path"])

    # from-scratch reference run
    store_a = ResultsStore(spark, str(tmp_path / "a"))
    runner_a = CheckpointRunner(store_a, chunk_size=100)
    rep_a = runner_a.run(dfp, suite, partition_col="partition_id", snapshot_id="s1",
                         violation_key_columns=["repo", "path", "commit"])
    assert rep_a.skipped_partitions == []
    assert len(rep_a.validated_partitions) == 6

    # partial run: chunk_size=2 and a store pre-seeded with 4 done partitions
    store_b = ResultsStore(spark, str(tmp_path / "b"))
    runner_b = CheckpointRunner(store_b, chunk_size=2)
    first_four = sorted(rep_a.validated_partitions)[:4]
    # simulate a previous partial run by running only those partitions
    import pyspark.sql.functions as F

    partial_df = dfp.where(F.col("partition_id").cast("string").isin(first_four))
    rep_partial = runner_b.run(partial_df, suite, partition_col="partition_id", snapshot_id="s1",
                               violation_key_columns=["repo", "path", "commit"])
    assert sorted(rep_partial.validated_partitions) == first_four

    # resume on the FULL table: must skip the 4 done, validate the 2 missing
    rep_resume = runner_b.run(dfp, suite, partition_col="partition_id", snapshot_id="s1",
                              violation_key_columns=["repo", "path", "commit"])
    assert sorted(rep_resume.skipped_partitions) == first_four
    assert len(rep_resume.validated_partitions) == 2

    # final verdicts identical to the from-scratch run (incl. violation samples)
    va = {
        _verdict_key(r): r
        for r in store_a.verdicts(suite.fingerprint, "s1").collect()
    }
    vb = {
        _verdict_key(r): r
        for r in store_b.verdicts(suite.fingerprint, "s1").collect()
    }
    assert set(va) == set(vb)
    for k in va:
        assert va[k]["success"] == vb[k]["success"], k
        assert va[k]["unexpected_count"] == vb[k]["unexpected_count"], k
        assert va[k]["element_count"] == vb[k]["element_count"], k
        assert va[k]["violations_json"] == vb[k]["violations_json"], k


def test_rerun_is_noop(spark, code_tables, suite, tmp_path):
    files, _ = code_tables
    dfp = add_partition_column(files, n_buckets=4, cols=["repo", "path"])
    store = ResultsStore(spark, str(tmp_path / "c"))
    runner = CheckpointRunner(store, chunk_size=100)
    rep1 = runner.run(dfp, suite, partition_col="partition_id", snapshot_id="s2")
    rep2 = runner.run(dfp, suite, partition_col="partition_id", snapshot_id="s2")
    assert len(rep1.validated_partitions) == 4
    assert rep2.validated_partitions == []
    assert sorted(rep2.skipped_partitions) == sorted(rep1.validated_partitions)

    # a NEW snapshot invalidates nothing but requires fresh validation
    rep3 = runner.run(dfp, suite, partition_col="partition_id", snapshot_id="s3")
    assert len(rep3.validated_partitions) == 4


def test_violation_samples_unioned_matches_per_constraint(spark, code_tables, suite):
    """One-job union of all violation samples must carry exactly the same
    rows as the per-constraint DataFrames (VERDICT r3 #8 — the per-job
    fixed cost was a serial scaling term)."""
    from data_profiler_spark.validator import Validator

    files, commits = code_tables
    dfp = add_partition_column(files, n_buckets=6, cols=["repo", "path"])
    v = Validator(dfp, tables={"commits": commits})
    res = v.validate(suite, group_by=["partition_id"])
    keys = ["partition_id", "repo", "path", "commit"]
    per = v.violation_samples(suite, limit=20, only_failed_of=res, key_columns=keys)
    uni = v.violation_samples_unioned(
        suite, limit=20, only_failed_of=res, key_columns=keys
    )
    if not per:
        assert uni is None
        return
    want = {
        (cid, tuple(r)) for cid, sdf in per.items() for r in sdf.collect()
    }
    got = {
        (r["constraint_id"], tuple(r)[1:]) for r in uni.collect()
    }
    assert got == want
    # requires a shared schema
    import pytest as _pytest

    with _pytest.raises(ValueError):
        v.violation_samples_unioned(suite, limit=20)


def test_violation_union_shares_one_cached_scan(spark, code_tables, suite):
    """VERDICT r4 #6: the K-branch union must not re-scan the source K
    times. Pre-persisted source -> every branch feeds from
    InMemoryTableScan (plan check); non-persisted source -> the method
    auto-persists for one eager materialization and unpersists after."""
    from pyspark import StorageLevel
    from data_profiler_spark.validator import Validator

    files, commits = code_tables
    dfp = add_partition_column(files, n_buckets=6, cols=["repo", "path"])
    keys = ["partition_id", "repo", "path", "commit"]

    # caller-persisted chunk (the checkpoint-runner shape): plan check
    dfp_cached = dfp.persist()
    try:
        v = Validator(dfp_cached, tables={"commits": commits})
        res = v.validate(suite, group_by=["partition_id"])
        uni = v.violation_samples_unioned(
            suite, limit=20, only_failed_of=res, key_columns=keys
        )
        if uni is not None:
            plan = uni._jdf.queryExecution().executedPlan().toString()
            assert "InMemoryTableScan" in plan
            rows_cached = {
                (r["constraint_id"], tuple(r)[1:]) for r in uni.collect()
            }
    finally:
        dfp_cached.unpersist()

    # non-persisted source: auto-persist path, unpersisted after the call
    v2 = Validator(dfp, tables={"commits": commits})
    res2 = v2.validate(suite, group_by=["partition_id"])
    uni2 = v2.violation_samples_unioned(
        suite, limit=20, only_failed_of=res2, key_columns=keys
    )
    assert dfp.storageLevel == StorageLevel.NONE
    if uni2 is not None:
        rows_auto = {
            (r["constraint_id"], tuple(r)[1:]) for r in uni2.collect()
        }
        assert rows_auto == rows_cached


def test_violation_samples_prepared_overlap(spark, code_tables, suite):
    """prepare_violation_samples (plan pre-build, overlappable with an
    executor job) + prepared= must yield exactly the rows of the direct
    path, subset to the failed constraints (VERDICT r4 #5 F-shave)."""
    from data_profiler_spark.validator import Validator

    files, commits = code_tables
    dfp = add_partition_column(files, n_buckets=6, cols=["repo", "path"])
    v = Validator(dfp, tables={"commits": commits})
    keys = ["partition_id", "repo", "path", "commit"]
    prepared = v.prepare_violation_samples(suite, limit=20, key_columns=keys)
    res = v.validate(suite, group_by=["partition_id"])
    direct = v.violation_samples_unioned(
        suite, limit=20, only_failed_of=res, key_columns=keys
    )
    via_prep = v.violation_samples_unioned(
        suite, limit=20, only_failed_of=res, key_columns=keys,
        prepared=prepared,
    )
    if direct is None:
        assert via_prep is None
        return
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(via_prep) == as_set(direct)
    # prepared carries ALL violation-capable constraints; the union keeps
    # only the failed subset
    failed = {r.constraint_id for r in res.results if not r.success}
    assert failed <= set(prepared)
    assert {r["constraint_id"] for r in via_prep.collect()} <= failed


def test_evaluation_parameters_from_store(spark, code_tables, tmp_path):
    """The URN flow: run suite A through the checkpoint runner, resolve
    its stored observed values as evaluation parameters, and pin a
    downstream suite's expectation to the prior run via $PARAMETER."""
    files, commits = code_tables
    store = ResultsStore(spark, str(tmp_path / "results"))
    suite_a = ConstraintSuite("upstream").add(
        "expect_table_row_count_to_be_between", min_value=0
    )
    df = add_partition_column(files, n_buckets=4, cols=["repo", "path"])
    CheckpointRunner(store).run(df, suite_a, partition_col="partition_id")

    params = store.evaluation_parameters(suite_a.fingerprint)
    cid = suite_a.constraints[0].id
    # grouped run: one observed row count per partition, keyed by group
    counts = {
        k: v for k, v in params.items()
        if k.startswith(f"urn:validations:{cid}:observed_value")
    }
    assert counts and sum(counts.values()) == files.count()
    assert all(
        params[k.replace(":observed_value", ":success")] for k in counts
    )

    # downstream: expect THIS run's total to equal the stored per-group
    # counts' sum, resolved via $PARAMETER at compile time
    from data_profiler_spark.validator import Validator

    total_key = "prior_total"
    suite_b = ConstraintSuite("downstream").add(
        "expect_table_row_count_to_equal", value={"$PARAMETER": total_key}
    )
    v = Validator(
        files, evaluation_parameters={total_key: sum(counts.values())}
    )
    res = v.validate(suite_b).results[0]
    assert res.success and res.observed_value == files.count()

    # explicit run_id selection returns the same parameters
    run_id = next(iter({
        r["run_id"] for r in store.read().select("run_id").collect()
    }))
    assert store.evaluation_parameters(suite_a.fingerprint, run_id=run_id) == params


def test_arrow_append_matches_spark_write(spark, tmp_path):
    """r7: the driver-side pyarrow store append must read back through
    Spark identically to the repartition(1) Spark write it replaced —
    same values, same schema, NULLs and array<double> included."""
    from data_profiler_spark.operators.profile_diff import PROFILE_SCHEMA
    from data_profiler_spark.sources.results_store import (
        RESULT_SCHEMA,
        arrow_append_rows,
    )

    row = {
        "run_id": "r1", "suite_fingerprint": "f", "snapshot_id": "",
        "partition_id": "all", "constraint_id": "c1",
        "constraint_type": "expect_x", "success": True,
        "element_count": 10, "unexpected_count": None,
        "observed_json": '{"v": 1}', "exception_info": None,
        "group_json": "{}", "violations_json": None,
        "started_at_ms": 123, "finished_at_ms": 456, "duration_ms": 333,
    }
    tuples = [tuple(row.get(f.name) for f in RESULT_SCHEMA.fields)]
    pa_path, sp_path = str(tmp_path / "pa"), str(tmp_path / "sp")
    assert arrow_append_rows(pa_path, tuples, RESULT_SCHEMA, "append")
    spark.createDataFrame(tuples, RESULT_SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(sp_path)
    a = spark.read.parquet(pa_path)
    b = spark.read.parquet(sp_path)
    assert a.schema == b.schema
    assert a.collect() == b.collect()

    prow = ("r1", "s", "", "{}", "col", 5, 0, 4, 1.0, 2.0, 1.5, 0.1,
            [0.1, 0.9], None, [1.0, 2.0], '{"a": 3}')
    assert arrow_append_rows(
        str(tmp_path / "pa2"), [prow], PROFILE_SCHEMA, "overwrite"
    )
    got = spark.read.parquet(str(tmp_path / "pa2")).collect()[0]
    assert got["quantiles"] == [0.1, 0.9] and got["hist_bins"] is None
    assert got["top_k_json"] == '{"a": 3}'
