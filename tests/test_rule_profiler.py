from __future__ import annotations

import pytest

from data_profiler_spark.operators.rule_profiler import (
    ColumnDomainBuilder,
    ProfilerConfigurationError,
    ProfilerExecutionError,
    RuleBasedProfiler,
    SemanticTypeColumnDomainBuilder,
    TableDomainBuilder,
    semantic_type_of,
)
from data_profiler_spark.validator import Validator


NUMERIC_RULE_CONFIG = {
    "variables": {"false_positive_rate": 0.01},
    "rules": {
        "numeric_range_rule": {
            "domain_builder": {
                "class_name": "SemanticTypeColumnDomainBuilder",
                "semantic_types": ["numeric"],
            },
            "parameter_builders": [
                {
                    "class_name": "MetricParameterBuilder",
                    "parameter_name": "my_min",
                    "metric_name": "column.min",
                    "enforce_numeric_metric": True,
                },
                {
                    "class_name": "MetricParameterBuilder",
                    "parameter_name": "my_max",
                    "metric_name": "column.max",
                    "enforce_numeric_metric": True,
                },
            ],
            "expectation_configuration_builders": [
                {
                    "expectation_type": "expect_column_values_to_be_between",
                    "column": "$domain.domain_kwargs.column",
                    "min_value": "$parameter.my_min.value",
                    "max_value": "$parameter.my_max.value",
                    "meta": {"profiler_details": "$parameter.my_min.details"},
                }
            ],
        },
        "row_count_rule": {
            "domain_builder": {"class_name": "TableDomainBuilder"},
            "parameter_builders": [
                {
                    "parameter_name": "n",
                    "metric_name": "table.row_count",
                }
            ],
            "expectation_configuration_builders": [
                {
                    "expectation_type": "expect_table_row_count_to_equal",
                    "value": "$parameter.n.value",
                }
            ],
        },
    },
}


def test_domain_builders(spark, typed_small):
    assert [d.domain_type for d in TableDomainBuilder().get_domains(
        typed_small, {}
    )] == ["table"]

    cols = [
        d.kwargs["column"]
        for d in ColumnDomainBuilder().get_domains(typed_small, {})
    ]
    assert cols == typed_small.columns

    sub = ColumnDomainBuilder(
        include_columns=["ints", "floats"], exclude_columns=["floats"]
    ).get_domains(typed_small, {})
    assert [d.kwargs["column"] for d in sub] == ["ints"]

    nums = SemanticTypeColumnDomainBuilder(["numeric"]).get_domains(
        typed_small, {}
    )
    assert [d.kwargs["column"] for d in nums] == [
        "ints", "floats", "pair_a", "pair_b"
    ]
    texts = SemanticTypeColumnDomainBuilder("text").get_domains(typed_small, {})
    assert {d.kwargs["column"] for d in texts} == {"strings", "dates", "cat"}

    with pytest.raises(ProfilerConfigurationError):
        SemanticTypeColumnDomainBuilder(["numberish"])
    with pytest.raises(ProfilerConfigurationError):
        ColumnDomainBuilder(include_columns=["nope"]).get_domains(
            typed_small, {}
        )


def test_semantic_type_of(spark):
    import pyspark.sql.types as T

    assert semantic_type_of(T.DecimalType(10, 2)) == "numeric"
    assert semantic_type_of(T.TimestampType()) == "datetime"
    assert semantic_type_of(T.ArrayType(T.IntegerType())) == "other"


def test_profile_generates_min_max_suite(spark, typed_small):
    profiler = RuleBasedProfiler(NUMERIC_RULE_CONFIG)
    suite = profiler.profile(typed_small, suite_name="rbp")

    by_col = {
        c.kwargs.get("column"): c
        for c in suite.constraints
        if c.type == "expect_column_values_to_be_between"
    }
    assert set(by_col) == {"ints", "floats", "pair_a", "pair_b"}
    ints = by_col["ints"]
    assert ints.kwargs["min_value"] == 1
    assert ints.kwargs["max_value"] == 10

    [row_count] = [
        c for c in suite.constraints
        if c.type == "expect_table_row_count_to_equal"
    ]
    assert row_count.kwargs["value"] == 30

    # citation + per-expectation meta land in suite.meta
    assert suite.meta["citations"][0]["profiler_config"] is NUMERIC_RULE_CONFIG
    details = suite.meta["expectation_meta"][ints.id]["profiler_details"]
    assert details["metric_configuration"]["metric_name"] == "column.min"

    # The generated suite validates against the data it came from. Metric
    # resolution skips NaN (pandas-skipna parity), so floats gets
    # min=0/max=29 — and the NaN row then fails the generated between
    # constraint, because the reference's Spark engine only injects the
    # NaN filter for increasing/decreasing maps
    # (sparkdf_execution_engine.py:617-623, column_values_between has
    # filter_null only). Everything else is green.
    result = Validator(typed_small).validate(suite)
    by_cid = {c.id: c for c in suite.constraints}
    for r in result.results:
        c = by_cid[r.constraint_id]
        if c.kwargs.get("column") == "floats":
            assert not r.success
            assert r.unexpected_count == 1  # the NaN row
        else:
            assert r.success, c


def test_profile_is_one_fused_pass(spark, typed_small, monkeypatch):
    """All metric parameters across rules/domains resolve in ONE fused
    aggregation action (the reference does one engine round trip per
    (domain, parameter builder) — here 9 metrics collapse to one
    ``df.agg``). Counted at the run_fused_pass seam rather than via the
    job tracker because AQE legitimately splits one action into several
    job ids."""
    import data_profiler_spark.operators.rule_profiler as rbp
    from data_profiler_spark.plans.fused import run_fused_pass

    calls: list[int] = []

    def counting(df, terms, post):
        calls.append(len(terms))
        return run_fused_pass(df, terms, post)

    monkeypatch.setattr(rbp, "run_fused_pass", counting)
    RuleBasedProfiler(NUMERIC_RULE_CONFIG).profile(typed_small)
    # one pass carrying every metric: 2 per numeric column x 4 + row_count
    assert calls == [9]


def test_variables_and_quantile_metric(spark, typed_small):
    config = {
        "variables": {"upper_q": 0.75},
        "rules": {
            "median_rule": {
                "domain_builder": {
                    "class_name": "ColumnDomainBuilder",
                    "include_columns": ["ints"],
                },
                "parameter_builders": [
                    {
                        "parameter_name": "med",
                        "metric_name": "column.median",
                    },
                    {
                        "parameter_name": "qs",
                        "metric_name": "column.quantile_values",
                        "metric_value_kwargs": {"quantiles": [0.25, 0.75]},
                    },
                ],
                "expectation_configuration_builders": [
                    {
                        "expectation_type": "expect_column_median_to_be_between",
                        "column": "$domain.domain_kwargs.column",
                        "min_value": "$parameter.med.value",
                        "max_value": "$parameter.med.value",
                        "meta": {"upper_q": "$variables.upper_q"},
                    }
                ],
            }
        },
    }
    suite = RuleBasedProfiler(config).profile(typed_small)
    [c] = suite.constraints
    # ints non-null = 28 values (1..10 x3 minus one 6 and one 8); the
    # 14th and 15th order statistics are both 5 -> median 5.0
    assert c.kwargs["min_value"] == c.kwargs["max_value"] == 5.0
    assert suite.meta["expectation_meta"][c.id]["upper_q"] == 0.75
    res = Validator(typed_small).validate(suite)
    assert all(r.success for r in res.results)


def test_config_errors(spark, typed_small):
    with pytest.raises(ProfilerConfigurationError):
        RuleBasedProfiler({"rules": {}})
    with pytest.raises(ProfilerConfigurationError):
        RuleBasedProfiler({"rules": {"r": {}}})  # no domain_builder
    with pytest.raises(ProfilerConfigurationError):
        RuleBasedProfiler(
            {
                "rules": {
                    "r": {
                        "domain_builder": {"class_name": "Nope"},
                    }
                }
            }
        )
    with pytest.raises(ProfilerConfigurationError):
        RuleBasedProfiler(
            {
                "rules": {
                    "r": {
                        "domain_builder": {"class_name": "TableDomainBuilder"},
                        "parameter_builders": [
                            {"parameter_name": "p", "metric_name": "no.such"}
                        ],
                    }
                }
            }
        )

    # unresolvable $parameter reference surfaces as execution error
    cfg = {
        "rules": {
            "r": {
                "domain_builder": {"class_name": "TableDomainBuilder"},
                "expectation_configuration_builders": [
                    {
                        "expectation_type": "expect_table_row_count_to_equal",
                        "value": "$parameter.missing.value",
                    }
                ],
            }
        }
    }
    with pytest.raises(ProfilerExecutionError):
        RuleBasedProfiler(cfg).profile(typed_small)


def test_enforce_numeric_metric(spark, typed_small):
    cfg = {
        "rules": {
            "r": {
                "domain_builder": {
                    "class_name": "ColumnDomainBuilder",
                    "include_columns": ["strings"],
                },
                "parameter_builders": [
                    {
                        "parameter_name": "mn",
                        "metric_name": "column.min",
                        "enforce_numeric_metric": True,
                    }
                ],
                "expectation_configuration_builders": [],
            }
        }
    }
    with pytest.raises(ProfilerExecutionError):
        RuleBasedProfiler(cfg).profile(typed_small)
