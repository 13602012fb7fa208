"""LIKE patterns, evaluation parameters, splitter determinism."""

from __future__ import annotations

from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.validator import Validator


def test_like_pattern(typed_small):
    r = Validator(typed_small).expect(
        "expect_column_values_to_match_like_pattern", column="cat", like_pattern="a%"
    )
    assert r.unexpected_count == 18  # b x10 + c x8
    r2 = Validator(typed_small).expect(
        "expect_column_values_to_not_match_like_pattern", column="cat", like_pattern="z%"
    )
    assert r2.success is True


def test_evaluation_parameters(typed_small):
    suite = ConstraintSuite("p").add(
        "expect_table_row_count_to_equal", value={"$PARAMETER": "expected_rows"}
    )
    res = Validator(
        typed_small, evaluation_parameters={"expected_rows": 30}
    ).validate(suite)
    assert res.results[0].success is True

    res2 = Validator(
        typed_small, evaluation_parameters={"expected_rows": 31}
    ).validate(suite)
    assert res2.results[0].success is False

    # unresolved parameter -> captured as exception_info, not a crash
    res3 = Validator(typed_small).validate(suite)
    assert res3.results[0].success is False


def test_mutated_evaluation_parameters_bust_compile_cache(typed_small):
    # the compile memo key must include the RESOLVED parameter values:
    # mutating ctx['evaluation_parameters'] between validate() calls on the
    # SAME validator must not return a stale plan (ADVICE r4)
    suite = ConstraintSuite("p3").add(
        "expect_table_row_count_to_equal", value={"$PARAMETER": "expected_rows"}
    )
    v = Validator(typed_small, evaluation_parameters={"expected_rows": 30})
    assert v.validate(suite).results[0].success is True
    v.ctx["evaluation_parameters"]["expected_rows"] = 31
    assert v.validate(suite).results[0].success is False
    # and an unresolved-parameter failed compile isn't sticky either
    del v.ctx["evaluation_parameters"]["expected_rows"]
    assert v.validate(suite).results[0].success is False
    v.ctx["evaluation_parameters"]["expected_rows"] = 30
    assert v.validate(suite).results[0].success is True


def test_unresolved_parameter_is_failure(typed_small):
    suite = ConstraintSuite("p2").add(
        "expect_column_min_to_be_between",
        column="ints",
        min_value={"$PARAMETER": "nope"},
    )
    res = Validator(typed_small).validate(suite)
    assert res.results[0].success is False


def test_zero_term_constraint_grouped_emits_per_group_verdicts(typed_small):
    """ADVICE r1 (high): constraints with no agg terms (schema checks,
    compile failures) must yield one verdict PER GROUP under grouped
    validation — not zero results / vacuous success."""
    from data_profiler_spark.core.suite import ConstraintSuite
    from data_profiler_spark.validator import Validator

    suite = ConstraintSuite("schema_only").add(
        "expect_table_columns_to_match_ordered_list",
        column_list=["definitely", "wrong", "columns"],
    )
    res = Validator(typed_small).validate(suite, group_by=["cat"])
    assert len(res.results) == 3  # cat in {a, b, c}
    assert all(r.success is False for r in res.results)
    assert res.success is False

    # a misspelled constraint type lowers to a failed-compile verdict per group
    bad = ConstraintSuite("typo").add("expect_column_values_to_be_nul", column="ints")
    res2 = Validator(typed_small).validate(bad, group_by=["cat"])
    assert len(res2.results) == 3
    assert all(not r.success and r.exception_info for r in res2.results)


def test_zscore_grouped_empty_input_is_vacuous(spark):
    """ADVICE r1 (medium): empty grouped input must not crash createDataFrame."""
    from data_profiler_spark.core.suite import ConstraintSuite
    from data_profiler_spark.validator import Validator

    df = spark.createDataFrame([], "cat string, x double").where("1=0")
    suite = ConstraintSuite("z").add(
        "expect_column_value_z_scores_to_be_less_than", column="x", threshold=2.0
    )
    res = Validator(df).validate(suite, group_by=["cat"])
    assert res.success is True  # no groups -> no verdicts -> vacuous
    assert res.results == []


def test_uniqueness_scope_chunk_independent(spark):
    """ADVICE r1 (medium): with scope='group' (default), a group's verdict is
    a pure function of its own rows — identical whether validated alone or
    together with other groups."""
    from data_profiler_spark.core.suite import ConstraintSuite
    from data_profiler_spark.validator import Validator

    rows = [
        ("p0", "k1"), ("p0", "k1"),     # dup within p0
        ("p1", "k2"), ("p2", "k2"),     # cross-group repeat: NOT a group dup
        ("p1", "k3"),
    ]
    df = spark.createDataFrame(rows, ["pid", "key"])
    suite = ConstraintSuite("u").add(
        "expect_column_values_to_be_unique", column="key"
    )
    full = {
        r.group["pid"]: (r.success, r.unexpected_count)
        for r in Validator(df).validate(suite, group_by=["pid"]).results
    }
    assert full["p0"] == (False, 2)
    assert full["p1"] == (True, 0)   # k2 repeats only across groups
    assert full["p2"] == (True, 0)
    # validating a single group in isolation gives the same verdict
    solo = Validator(df.where("pid = 'p1'")).validate(suite, group_by=["pid"])
    assert {
        r.group["pid"]: (r.success, r.unexpected_count) for r in solo.results
    } == {"p1": full["p1"]}
    # table scope restores the old global semantics
    suite_t = ConstraintSuite("ut").add(
        "expect_column_values_to_be_unique", column="key", scope="table"
    )
    tbl = {
        r.group["pid"]: r.unexpected_count
        for r in Validator(df).validate(suite_t, group_by=["pid"]).results
    }
    assert tbl == {"p0": 2, "p1": 1, "p2": 1}


def test_like_pattern_lists(spark):
    """ref core set completion: like-pattern lists (match_on any/all) and
    the deprecated multicolumn-unique / bootstrapped-KS aliases."""
    from data_profiler_spark.validator import Validator

    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("alphabet",), (None,)], ["s"]
    )
    v = Validator(df)
    r = v.expect(
        "expect_column_values_to_match_like_pattern_list",
        column="s", like_pattern_list=["alpha%", "%eta"],
    )
    assert r.unexpected_count == 0 and r.success is True
    r2 = v.expect(
        "expect_column_values_to_match_like_pattern_list",
        column="s", like_pattern_list=["alpha%", "%bet"], match_on="all",
    )
    assert r2.unexpected_count == 2  # only 'alphabet' matches both
    r3 = v.expect(
        "expect_column_values_to_not_match_like_pattern_list",
        column="s", like_pattern_list=["%bet"],
    )
    assert r3.unexpected_count == 1  # alphabet ends with 'bet'


def test_deprecated_aliases(spark, typed_small):
    from data_profiler_spark.validator import Validator

    df = spark.createDataFrame([(1, 2), (3, 3)], ["a", "b"])
    r = Validator(df).expect(
        "expect_multicolumn_values_to_be_unique", column_list=["a", "b"]
    )
    assert r.unexpected_count == 1
    r2 = Validator(typed_small).expect(
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="floats",
        partition_object={"bins": [0.0, 7.5, 15.0, 22.5, 30.0],
                          "weights": [0.25, 0.25, 0.25, 0.25]},
        p=0.05, bootstrap_samples=1000,
    )
    assert r2.success is True


def test_ge_suite_json_interop(spark, tmp_path):
    """A reference-format ExpectationSuite JSON file loads and validates
    unchanged (expectation_suite.py:45-189 schema)."""
    import json

    from data_profiler_spark.core.suite import ConstraintSuite
    from data_profiler_spark.validator import Validator

    ge = {
        "expectation_suite_name": "orders_quality",
        "expectations": [
            {"expectation_type": "expect_column_values_to_not_be_null",
             "kwargs": {"column": "a", "mostly": 0.5}, "meta": {}},
            {"expectation_type": "expect_column_values_to_be_between",
             "kwargs": {"column": "a", "min_value": 0, "max_value": 10}},
            {"expectation_type": "expect_table_row_count_to_equal",
             "kwargs": {"value": 3}},
        ],
        "meta": {"data_profiler_version": "0.0.0"},
        "evaluation_parameters": {"max_a": 10},
    }
    p = tmp_path / "suite.json"
    p.write_text(json.dumps(ge))
    suite = ConstraintSuite.from_ge_json_file(str(p))
    assert suite.name == "orders_quality"
    assert [c.type for c in suite.constraints] == [
        e["expectation_type"] for e in ge["expectations"]
    ]
    df = spark.createDataFrame([(1,), (5,), (None,)], ["a"])
    res = Validator(df).validate(suite)
    assert all(r.success for r in res.results), [
        (r.constraint_type, r.observed_value) for r in res.results if not r.success
    ]
    # round-trip back to the reference shape
    back = suite.to_ge_dict()
    assert back["expectation_suite_name"] == "orders_quality"
    assert back["evaluation_parameters"] == {"max_a": 10}
    assert back["expectations"][0]["kwargs"] == {"column": "a", "mostly": 0.5}


def test_ge_validation_result_format(typed_small):
    """Round-trip: GE suite JSON in -> GE validation-result dict out."""
    import json

    from data_profiler_spark.validator import Validator

    suite = ConstraintSuite("fmt").add(
        "expect_column_values_to_be_in_set",
        column="cat", value_set=["a", "b"],
    )
    res = Validator(typed_small).validate(suite, result_format="SUMMARY")
    ge = res.to_ge_dict()
    json.dumps(ge)  # fully JSON-serializable
    assert ge["success"] is False
    assert ge["statistics"]["evaluated_expectations"] == 1
    (r,) = ge["results"]
    assert r["expectation_config"]["expectation_type"] == "expect_column_values_to_be_in_set"
    assert r["expectation_config"]["kwargs"]["value_set"] == ["a", "b"]
    assert r["success"] is False
    assert r["result"]["unexpected_count"] == 8  # the 'c' values
    assert r["result"]["partial_unexpected_counts"][0]["value"] == "c"
    assert r["exception_info"]["raised_exception"] is False


def test_compile_cache_is_bounded_lru_with_normalized_keys(typed_small):
    """ADVICE r5: per-parameter-dict compiled plans must not accumulate
    unboundedly, and semantically equal parameter values (1 vs 1.0, numpy
    scalars) must hit the same cache entry."""
    import numpy as np

    suite = ConstraintSuite("lru").add(
        "expect_table_row_count_to_equal", value={"$PARAMETER": "expected_rows"}
    )
    v = Validator(typed_small, evaluation_parameters={"expected_rows": 30})

    # int / float / numpy scalar of the same value -> ONE cache entry
    plan_int = v.compile(suite)
    v.ctx["evaluation_parameters"]["expected_rows"] = 30.0
    assert v.compile(suite) is plan_int
    v.ctx["evaluation_parameters"]["expected_rows"] = np.int64(30)
    assert v.compile(suite) is plan_int
    assert len(v._compile_cache) == 1

    # distinct values never collide (bool vs int, big ints beyond 2^53)
    v.ctx["evaluation_parameters"]["expected_rows"] = True
    assert v.compile(suite) is not plan_int
    v.ctx["evaluation_parameters"]["expected_rows"] = 2**60
    p_big = v.compile(suite)
    v.ctx["evaluation_parameters"]["expected_rows"] = 2**60 + 1
    assert v.compile(suite) is not p_big

    # the cache stays bounded under a per-call parameter churn
    for i in range(2 * Validator._COMPILE_CACHE_MAX):
        v.ctx["evaluation_parameters"]["expected_rows"] = 1000 + i
        v.compile(suite)
    assert len(v._compile_cache) <= Validator._COMPILE_CACHE_MAX

    # LRU: a fresh hit survives the next eviction wave
    v.ctx["evaluation_parameters"]["expected_rows"] = 30
    plan_int2 = v.compile(suite)  # re-insert (old entry was evicted)
    v.ctx["evaluation_parameters"]["expected_rows"] = 30.0
    assert v.compile(suite) is plan_int2


def test_experimental_condition_dsl_translation(typed_small):
    """VERDICT r5 #8: GE suites with condition_parser=
    data_profiler__experimental__ (ref row_conditions.py:27-96) run
    unchanged — the three DSL forms translate to Spark SQL; everything
    else fails with a clear ConditionParserError."""
    import pytest

    from data_profiler_spark.operators.map_constraints import (
        ConditionParserError,
        translate_experimental_condition,
    )

    assert translate_experimental_condition('col("x") > 5') == "`x` > 5"
    assert translate_experimental_condition('col("x") >= -1.5e3') == "`x` >= -1.5e3"
    assert (
        translate_experimental_condition('col("a.b") == "lit"') == "`a.b` = 'lit'"
    )
    assert (
        translate_experimental_condition("col(\"x\") == '4.2'") == "`x` = '4.2'"
    )
    assert (
        translate_experimental_condition('col("x").notnull()')
        == "`x` IS NOT NULL"
    )
    with pytest.raises(ConditionParserError, match="unable to parse"):
        translate_experimental_condition('col("x") in (1, 2)')
    with pytest.raises(ConditionParserError, match="Invalid operator"):
        translate_experimental_condition('col("x") > "str"')

    # end to end: a DSL-conditioned suite equals its SQL-conditioned twin
    dsl = ConstraintSuite.from_ge_dict(
        {
            "expectation_suite_name": "dsl",
            "expectations": [
                {
                    "expectation_type": "expect_column_values_to_be_between",
                    "kwargs": {
                        "column": "ints",
                        "min_value": 3,
                        "max_value": 8,
                        "row_condition": 'col("pair_a") > 1',
                        "condition_parser": "data_profiler__experimental__",
                    },
                }
            ],
        }
    )
    sql = ConstraintSuite("sql").add(
        "expect_column_values_to_be_between",
        column="ints", min_value=3, max_value=8, row_condition="pair_a > 1",
    )
    r_dsl = Validator(typed_small).validate(dsl).results[0]
    r_sql = Validator(typed_small).validate(sql).results[0]
    assert (r_dsl.element_count, r_dsl.unexpected_count, r_dsl.success) == (
        r_sql.element_count, r_sql.unexpected_count, r_sql.success,
    )
    assert r_dsl.element_count > 0

    # unsupported parser -> failed-compile verdict with the clear message
    pandas_suite = ConstraintSuite("p").add(
        "expect_column_values_to_not_be_null",
        column="ints", row_condition="pair_a > 1", condition_parser="pandas",
    )
    r = Validator(typed_small).validate(pandas_suite).results[0]
    assert not r.success and "condition_parser" in (r.exception_info or "")
