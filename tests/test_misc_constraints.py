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


def test_unresolved_parameter_is_failure(typed_small):
    suite = ConstraintSuite("p2").add(
        "expect_column_min_to_be_between",
        column="ints",
        min_value={"$PARAMETER": "nope"},
    )
    res = Validator(typed_small).validate(suite)
    assert res.results[0].success is False
