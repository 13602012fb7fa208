"""Auto-generated constraint suites from observed profiles.

The Spark-first rebuild of ``BasicDatasetProfiler._profile``
(/root/reference/src/data_profiler/profile/basic_dataset_profiler.py:118-335)
and ``UserConfigurableProfiler`` (profile/user_configurable_profiler.py:32-195,
688-1133): classify each column's semantic type + cardinality from the
single-pass profile, then emit the type/cardinality-appropriate constraints
pinned to observed values. Cardinality thresholds mirror
basic_dataset_profiler.py:93-111; the option surface
(``semantic_types_dict`` / ``value_set_threshold`` /
``primary_or_compound_key`` / ``excluded_expectations`` / ``not_null_only`` /
``table_expectations_only``) mirrors user_configurable_profiler.py:56-147.
"""

from __future__ import annotations

from typing import Any

from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.operators.profile import ColumnProfile, TableProfile

# ref profile/base.py:234-241
PROFILER_SEMANTIC_TYPES = {
    "DATETIME", "NUMERIC", "STRING", "VALUE_SET", "BOOLEAN", "OTHER",
}

# ref profile/base.py:42-56 (OrderedProfilerCardinality)
CARDINALITY_ORDER = [
    "NONE", "ONE", "TWO", "VERY_FEW", "FEW", "MANY", "VERY_MANY", "UNIQUE",
]


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
    semantic_types_dict: dict[str, list[str]] | None = None,
    value_set_threshold: str = "VERY_FEW",
    primary_or_compound_key: list[str] | None = None,
    excluded_expectations: list[str] | None = None,
    not_null_only: bool = False,
    table_expectations_only: bool = False,
) -> ConstraintSuite:
    """Strict-ish suite pinned to the observed profile.

    Options (reference parity, user_configurable_profiler.py:56-147):

    - ``semantic_types_dict``: {semantic_type: [columns]} with types from
      ``PROFILER_SEMANTIC_TYPES``. When given, NUMERIC bounds are emitted
      only for columns declared NUMERIC, and declared VALUE_SET columns get
      a row-level ``expect_column_values_to_be_in_set`` pinned to the
      observed domain regardless of cardinality (ref
      _build_expectations_value_set, :688-715); undeclared columns keep
      only nullity + drift.
    - ``value_set_threshold``: cardinality rung (``CARDINALITY_ORDER``) at
      or below which a distinct-value containment constraint is pinned
      (ref :296-297). Default "VERY_FEW" — stricter than the reference's
      "MANY" because our set is built from the profile's top-k sketch and
      is only emitted when the sketch provably covers the domain
      (len(top_k) >= distinct).
    - ``primary_or_compound_key``: list of columns — single-column or
      compound uniqueness (ref _build_expectations_primary_or_compound_key,
      :896-924).
    - ``excluded_expectations``: constraint type names never emitted.
    - ``not_null_only``: never emit ``expect_column_values_to_be_null`` —
      mostly-null columns get a weak not_null instead (ref :64,80-85).
    - ``table_expectations_only``: only the table-level expectations
      (row count + column set; ref _build_expectations_table, :1104-1133).
    """
    excluded = set(excluded_expectations or [])
    if semantic_types_dict:
        bad = {k for k in semantic_types_dict if k.upper() not in PROFILER_SEMANTIC_TYPES}
        if bad:
            raise ValueError(
                f"unknown semantic types {sorted(bad)}; expected one of "
                f"{sorted(PROFILER_SEMANTIC_TYPES)}"
            )
    vst = value_set_threshold.upper()
    if vst not in CARDINALITY_ORDER:
        raise ValueError(
            f"value_set_threshold must be one of {CARDINALITY_ORDER}, got {vst!r}"
        )
    col_semantics: dict[str, set[str]] = {}
    for stype, cols in (semantic_types_dict or {}).items():
        for c in cols:
            col_semantics.setdefault(c, set()).add(stype.upper())

    suite = ConstraintSuite(name)

    def add(ctype: str, **kwargs: Any) -> None:
        if ctype not in excluded:
            suite.add(ctype, **kwargs)

    # ---- table-level (ref _build_expectations_table) -------------------
    any_cp = next(iter(tp.columns.values()), None)
    if any_cp is not None:
        add("expect_table_row_count_to_equal", value=any_cp.row_count)
        add(
            "expect_table_columns_to_match_set",
            column_set=sorted(tp.columns.keys()),
            exact_match=False,
        )
    if table_expectations_only:
        return suite

    # ---- primary / compound key ---------------------------------------
    if primary_or_compound_key:
        key = list(primary_or_compound_key)
        if len(key) > 1:
            add("expect_compound_columns_to_be_unique", column_list=key)
        else:
            add("expect_column_values_to_be_unique", column=key[0])

    for colname, cp in tp.columns.items():
        n = cp.row_count
        if n == 0:
            continue
        # when a semantic_types_dict is given, UNDECLARED columns keep only
        # nullity + drift (ref: declared types drive the build, :330-360)
        semantics = (
            col_semantics.get(colname, set())
            if semantic_types_dict
            else None
        )
        null_frac = cp.null_count / n
        if null_frac > 0.5 and not not_null_only:
            add(
                "expect_column_values_to_be_null", column=colname,
                mostly=max(0.0, round(null_frac - null_mostly_slack, 6)),
            )
        else:
            add(
                "expect_column_values_to_not_be_null", column=colname,
                mostly=max(0.0, round(1.0 - null_frac - null_mostly_slack, 6)),
            )
        card = classify_cardinality(cp)
        if card == "UNIQUE" and not primary_or_compound_key:
            add("expect_column_values_to_be_unique", column=colname)

        # value-set containment: domain provably covered by the top-k sketch
        covered = bool(cp.top_k) and cp.approx_distinct <= len(cp.top_k or [])
        if semantics is not None:
            if "VALUE_SET" in semantics and covered:
                add(
                    "expect_column_values_to_be_in_set",
                    column=colname,
                    value_set=[t["value"] for t in cp.top_k],
                )
        elif (
            card != "NONE"
            and CARDINALITY_ORDER.index(card) <= CARDINALITY_ORDER.index(vst)
            and covered
        ):
            add(
                "expect_column_distinct_values_to_be_in_set",
                column=colname,
                value_set=[t["value"] for t in cp.top_k],
            )

        numeric_ok = (
            ("NUMERIC" in semantics) if semantics is not None
            else not cp.is_length_profile
        )
        if cp.mean_v is not None and numeric_ok and not cp.is_length_profile:
            span = (cp.max_v - cp.min_v) or 1.0
            slack = numeric_slack * span
            add(
                "expect_column_min_to_be_between", column=colname,
                min_value=cp.min_v - slack, max_value=cp.min_v + slack,
            )
            add(
                "expect_column_max_to_be_between", column=colname,
                min_value=cp.max_v - slack, max_value=cp.max_v + slack,
            )
            add(
                "expect_column_mean_to_be_between", column=colname,
                min_value=cp.mean_v - slack, max_value=cp.mean_v + slack,
            )
            # median / stdev / pinned quantiles — the reference pins all
            # three for numeric columns (basic_dataset_profiler.py:180-207:
            # median_to_be_between, stdev_to_be_between,
            # quantile_values_to_be_between at [.05,.25,.5,.75,.95]), all
            # wired to the profile's existing sketch (no extra jobs)
            if cp.stddev_v is not None:
                add(
                    "expect_column_stdev_to_be_between", column=colname,
                    min_value=max(0.0, cp.stddev_v - slack),
                    max_value=cp.stddev_v + slack,
                )
            if cp.quantiles:
                qs = list(cp.quantile_qs or [])
                if 0.5 in qs:
                    med = cp.quantiles[qs.index(0.5)]
                    add(
                        "expect_column_median_to_be_between", column=colname,
                        min_value=med - slack, max_value=med + slack,
                    )
                add(
                    "expect_column_quantile_values_to_be_between",
                    column=colname,
                    quantile_ranges={
                        "quantiles": qs,
                        "value_ranges": [[v - slack, v + slack] for v in cp.quantiles],
                    },
                )
        if cp.is_length_profile and cp.max_v is not None and (
            semantics is None or "STRING" in semantics
        ):
            add(
                "expect_column_value_lengths_to_be_between", column=colname,
                min_value=0, max_value=int(cp.max_v * (1 + numeric_slack)) + 1,
            )
        try:
            baseline = cp.as_baseline()
            add(
                "expect_column_distribution_to_match_baseline",
                column=colname, baseline=baseline, p=0.001,
            )
        except ValueError:
            # no distribution sketch for this column (neither top-k nor
            # histogram was profiled) — skip the drift term
            pass
    return suite


# ---------------------------------------------------------------------------
# BasicDatasetProfiler parity: the reference's per-(type, cardinality)
# expectation table (basic_dataset_profiler.py:129-330)
# ---------------------------------------------------------------------------

# ref profile/base.py ProfilerDataType
PROFILER_DATA_TYPES = {"INT", "FLOAT", "STRING", "BOOLEAN", "DATETIME", "UNKNOWN"}

_LOW_CARD = ("ONE", "TWO", "VERY_FEW", "FEW")
_HIGH_CARD = ("MANY", "VERY_MANY")


def classify_profiler_type(spark_type: str) -> str:
    """Spark simpleString -> ProfilerDataType, mirroring the reference's
    type-name whitelists (ProfilerTypeMapping, profile/base.py — matched by
    ``expect_column_values_to_be_in_type_list`` probes in
    basic_dataset_profiler.py:34-72; we read the schema instead: one
    metadata lookup, zero jobs)."""
    t = spark_type.lower()
    if t in ("tinyint", "smallint", "int", "bigint", "byte", "short", "integer", "long"):
        return "INT"
    if t in ("float", "double", "real") or t.startswith("decimal"):
        return "FLOAT"
    if t == "string" or t.startswith(("varchar", "char")):
        return "STRING"
    if t == "boolean":
        return "BOOLEAN"
    if t in ("date", "timestamp", "timestamp_ntz"):
        return "DATETIME"
    return "UNKNOWN"


def basic_expectation_shape(ptype: str, cardinality: str) -> list[str]:
    """The exact expectation-type list ``BasicDatasetProfiler._profile``
    emits for a column of class (type, cardinality), in emission order
    (ref basic_dataset_profiler.py:154-330).

    Every column gets not_null(mostly=.5) + in_set([]) (:156-160); then:
    INT splits UNIQUE -> unique, low-cardinality -> distinct-in-set,
    MANY/VERY_MANY -> min/max/mean/median/stdev/quantiles/KL (:161-213);
    FLOAT is identical minus stdev (:215-249); STRING always adds the
    whitespace regex then unique/distinct-in-set (:251-270); DATETIME
    always pins min/max and adds distinct-in-set at low cardinality
    (:272-305); BOOLEAN/UNKNOWN get unique/distinct-in-set only
    (:307-330). NONE cardinality adds nothing type-specific."""
    if ptype not in PROFILER_DATA_TYPES:
        raise ValueError(f"unknown profiler type {ptype!r}")
    if cardinality not in CARDINALITY_ORDER:
        raise ValueError(f"unknown cardinality {cardinality!r}")
    shape = [
        "expect_column_values_to_not_be_null",
        "expect_column_values_to_be_in_set",
    ]
    unique = cardinality == "UNIQUE"
    low = cardinality in _LOW_CARD
    high = cardinality in _HIGH_CARD
    numeric_describe = [
        "expect_column_min_to_be_between",
        "expect_column_max_to_be_between",
        "expect_column_mean_to_be_between",
        "expect_column_median_to_be_between",
    ]
    if ptype == "INT":
        if unique:
            shape.append("expect_column_values_to_be_unique")
        elif low:
            shape.append("expect_column_distinct_values_to_be_in_set")
        elif high:
            shape += numeric_describe + [
                "expect_column_stdev_to_be_between",
                "expect_column_quantile_values_to_be_between",
                "expect_column_kl_divergence_to_be_less_than",
            ]
    elif ptype == "FLOAT":
        if unique:
            shape.append("expect_column_values_to_be_unique")
        elif low:
            shape.append("expect_column_distinct_values_to_be_in_set")
        elif high:
            # the reference's FLOAT branch omits stdev (:215-249)
            shape += numeric_describe + [
                "expect_column_quantile_values_to_be_between",
                "expect_column_kl_divergence_to_be_less_than",
            ]
    elif ptype == "STRING":
        shape.append("expect_column_values_to_not_match_regex")
        if unique:
            shape.append("expect_column_values_to_be_unique")
        elif low:
            shape.append("expect_column_distinct_values_to_be_in_set")
    elif ptype == "DATETIME":
        shape += [
            "expect_column_min_to_be_between",
            "expect_column_max_to_be_between",
        ]
        if low:
            shape.append("expect_column_distinct_values_to_be_in_set")
    else:  # BOOLEAN / UNKNOWN
        if unique:
            shape.append("expect_column_values_to_be_unique")
        elif low:
            shape.append("expect_column_distinct_values_to_be_in_set")
    return shape


def build_basic_suite_from_profile(
    tp: TableProfile, name: str = "basic_profile"
) -> ConstraintSuite:
    """The ``BasicDatasetProfiler`` suite: observe-only expectations whose
    types and arguments mirror the reference's emission exactly
    (basic_dataset_profiler.py:129-330) — ``mostly=0.5`` not-null, empty
    ``in_set``, ``None``-valued bounds/sets (= always succeed, record the
    observed value), the ``^\\s+|\\s+$`` whitespace regex, the
    [.05,.25,.5,.75,.95] quantile ladder. One deviation, in the profiling
    spirit: the KL term is pinned to the profile's own sketch as its
    ``partition_object`` (the reference also derives the partition from the
    profiled batch) with ``threshold=None`` (observe-only); it is skipped
    when the column has no sketch."""
    suite = ConstraintSuite(name)
    suite.add("expect_table_row_count_to_be_between", min_value=0, max_value=None)
    suite.add("expect_table_columns_to_match_ordered_list", column_list=None)
    for colname, cp in tp.columns.items():
        ptype = classify_profiler_type(cp.spark_type)
        card = classify_cardinality(cp)
        for ctype in basic_expectation_shape(ptype, card):
            kw: dict[str, Any] = {"column": colname}
            if ctype == "expect_column_values_to_not_be_null":
                kw["mostly"] = 0.5
            elif ctype == "expect_column_values_to_be_in_set":
                kw["value_set"] = []
                kw["result_format"] = "SUMMARY"
            elif ctype == "expect_column_distinct_values_to_be_in_set":
                kw["value_set"] = None
                kw["result_format"] = "SUMMARY"
            elif ctype == "expect_column_values_to_not_match_regex":
                kw["regex"] = r"^\s+|\s+$"
            elif ctype == "expect_column_quantile_values_to_be_between":
                kw["quantile_ranges"] = {
                    "quantiles": [0.05, 0.25, 0.5, 0.75, 0.95],
                    "value_ranges": [[None, None]] * 5,
                }
            elif ctype == "expect_column_kl_divergence_to_be_less_than":
                try:
                    kw["partition_object"] = cp.as_baseline()
                except ValueError:
                    continue  # no sketch for this column
                kw["threshold"] = None
                kw["result_format"] = "COMPLETE"
            elif ctype.endswith("_to_be_between"):
                kw["min_value"] = None
                kw["max_value"] = None
            suite.add(ctype, **kw)
    return suite
