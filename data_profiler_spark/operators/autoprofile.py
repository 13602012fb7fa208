"""Auto-generated constraint suites from observed profiles.

The Spark-first rebuild of ``BasicDatasetProfiler._profile``
(/root/reference/src/data_profiler/profile/basic_dataset_profiler.py:118-335)
and ``UserConfigurableProfiler`` (profile/user_configurable_profiler.py:32-195):
classify each column's semantic type + cardinality from the single-pass
profile, then emit the type/cardinality-appropriate constraints pinned to
observed values. Cardinality thresholds mirror basic_dataset_profiler.py:93-111.
"""

from __future__ import annotations

from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.operators.profile import ColumnProfile, TableProfile


def classify_cardinality(cp: ColumnProfile) -> str:
    """ref thresholds (basic_dataset_profiler.py:93-111)."""
    n = cp.nonnull_count
    d = cp.approx_distinct
    if n == 0 or d == 0:
        return "NONE"
    if d == 1:
        return "ONE"
    if d == 2:
        return "TWO"
    pct = d / n if n else 0.0
    if d == n:
        return "UNIQUE"
    if d < 60:
        return "VERY_FEW"
    if d < 1000:
        return "FEW"
    if pct > 0.1:
        return "VERY_MANY"
    return "MANY"


def build_suite_from_profile(
    tp: TableProfile,
    name: str = "auto_profile",
    null_mostly_slack: float = 0.01,
    numeric_slack: float = 0.1,
) -> ConstraintSuite:
    """Strict-ish suite pinned to the observed profile:
    - not_null with mostly = observed nonnull fraction - slack (or be_null
      when the column is >50% null — ref user_configurable_profiler nullity
      rule);
    - min/max/mean between observed +/- slack for numeric columns;
    - distinct-value containment for VERY_FEW cardinality;
    - uniqueness for UNIQUE cardinality;
    - drift vs the observed distribution sketch (top-k or histogram).
    """
    suite = ConstraintSuite(name)
    for colname, cp in tp.columns.items():
        n = cp.row_count
        if n == 0:
            continue
        null_frac = cp.null_count / n
        if null_frac > 0.5:
            suite.add(
                "expect_column_values_to_be_null", column=colname,
                mostly=max(0.0, round(null_frac - null_mostly_slack, 6)),
            )
        else:
            suite.add(
                "expect_column_values_to_not_be_null", column=colname,
                mostly=max(0.0, round(1.0 - null_frac - null_mostly_slack, 6)),
            )
        card = classify_cardinality(cp)
        if card == "UNIQUE":
            suite.add("expect_column_values_to_be_unique", column=colname)
        if card in ("ONE", "TWO", "VERY_FEW") and cp.top_k:
            suite.add(
                "expect_column_distinct_values_to_be_in_set",
                column=colname,
                value_set=[t["value"] for t in cp.top_k],
            )
        if cp.mean_v is not None and not cp.is_length_profile:
            span = (cp.max_v - cp.min_v) or 1.0
            suite.add(
                "expect_column_min_to_be_between", column=colname,
                min_value=cp.min_v - numeric_slack * span, max_value=cp.min_v + numeric_slack * span,
            )
            suite.add(
                "expect_column_max_to_be_between", column=colname,
                min_value=cp.max_v - numeric_slack * span, max_value=cp.max_v + numeric_slack * span,
            )
            suite.add(
                "expect_column_mean_to_be_between", column=colname,
                min_value=cp.mean_v - numeric_slack * span, max_value=cp.mean_v + numeric_slack * span,
            )
        if cp.is_length_profile and cp.max_v is not None:
            suite.add(
                "expect_column_value_lengths_to_be_between", column=colname,
                min_value=0, max_value=int(cp.max_v * (1 + numeric_slack)) + 1,
            )
        try:
            baseline = cp.as_baseline()
            suite.add(
                "expect_column_distribution_to_match_baseline",
                column=colname, baseline=baseline, p=0.001,
            )
        except ValueError:
            pass
    return suite
