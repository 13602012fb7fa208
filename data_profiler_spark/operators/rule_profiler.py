"""Config-driven rule-based profiler: rules -> generated ConstraintSuite.

Reference parity (the V3 "Rule-Based Profiler", marked Experimental in
rule_based_profiler/README.md:1-3):
  - engine loop: profiler.py:98-237 (per-rule domain builder + parameter
    builders + expectation-configuration builders; profile() concatenates
    every rule's generated configurations into one suite with a config
    citation), rule/rule.py:44-87 (domains -> parameters -> configs);
  - domain builders: table_domain_builder.py, column_domain_builder.py:10-42
    (one COLUMN domain per table column),
    simple_semantic_type_domain_builder.py (best-effort semantic typing of
    columns, filtered to requested semantic types);
  - parameter builder: metric_parameter_builder.py:14-103 (resolve one
    metric per (domain, builder), store under ``$parameter.<name>`` with
    enforce_numeric_metric / replace_nan_with_zero switches);
  - expectation builder: default_expectation_configuration_builder.py:15-71
    (kwargs are ``$``-references resolved against domain / variables /
    parameters).

Rebuilt Spark-first, NOT ported: the reference resolves every metric with
its own Validator.get_metric round trip (one driver->engine exchange per
(domain, parameter builder)). Here every metric parameter across ALL rules,
domains and builders lowers to a fused AggTerm and resolves in ONE
``df.agg(...)`` Spark job (plans/fused.py) — O(rules x columns x metrics)
metric queries collapse to a single scan, which is the difference between
"seconds" and "hours" on a 100-TB table. Domain discovery (columns, dtypes)
reads the Spark schema — no jobs at all.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from numbers import Number
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_profiler_spark.core.identity import fingerprint
from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.plans.fused import AggTerm, metric_alias, run_fused_pass


class ProfilerConfigurationError(ValueError):
    """Invalid profiler config (ref: exceptions.ProfilerConfigurationError)."""


class ProfilerExecutionError(RuntimeError):
    """Metric/parameter resolution failure (ref: ProfilerExecutionError)."""


# ---------------------------------------------------------------------------
# domains
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Domain:
    """A compute domain (ref: domain_builder/types/domain.py) — the table
    itself or one column of it."""

    domain_type: str  # "table" | "column"
    domain_kwargs: tuple[tuple[str, Any], ...] = ()

    @property
    def kwargs(self) -> dict[str, Any]:
        return dict(self.domain_kwargs)

    @property
    def id(self) -> str:
        return fingerprint(
            {"domain_type": self.domain_type, "domain_kwargs": self.kwargs}
        )


def _column_domain(column: str) -> Domain:
    return Domain(domain_type="column", domain_kwargs=(("column", column),))


# semantic typing: the reference's ProfilerTypeMapping name lists
# (profile/base.py) keyed off storage type names; here the Spark schema IS
# the storage type, so the mapping is dtype-class driven.
_SEMANTIC_OF_DTYPE: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.DateType, "datetime"),
    (T.TimestampType, "datetime"),
    (T.StringType, "text"),
    (T.BinaryType, "binary"),
    (T.NumericType, "numeric"),  # covers int/long/float/double/decimal/...
]


def semantic_type_of(dtype: T.DataType) -> str:
    for klass, name in _SEMANTIC_OF_DTYPE:
        if isinstance(dtype, klass):
            return name
    return "other"


class TableDomainBuilder:
    """ref: domain_builder/table_domain_builder.py — one TABLE domain."""

    def __init__(self, **_: Any) -> None:
        pass

    def get_domains(self, df: DataFrame, variables: dict[str, Any]) -> list[Domain]:
        return [Domain(domain_type="table")]


class ColumnDomainBuilder:
    """ref: domain_builder/column_domain_builder.py:10-42 — one COLUMN
    domain per table column (schema-driven: zero Spark jobs).

    ``include_columns`` / ``exclude_columns`` are engine extensions (the
    reference offers no filtering here; real configs need it)."""

    def __init__(
        self,
        include_columns: list[str] | None = None,
        exclude_columns: list[str] | None = None,
        **_: Any,
    ) -> None:
        self.include = include_columns
        self.exclude = set(exclude_columns or [])

    def get_domains(self, df: DataFrame, variables: dict[str, Any]) -> list[Domain]:
        names = self.include if self.include is not None else df.columns
        missing = [c for c in names if c not in df.columns]
        if missing:
            raise ProfilerConfigurationError(f"unknown columns: {missing}")
        return [_column_domain(c) for c in names if c not in self.exclude]


class SemanticTypeColumnDomainBuilder:
    """ref: domain_builder/simple_semantic_type_domain_builder.py — column
    domains filtered to the requested semantic types ("numeric", "text",
    "datetime", "boolean", "binary"). The reference probes
    table.column_types through the engine; the Spark schema already
    carries exact types, so this is driver-only."""

    def __init__(
        self, semantic_types: str | list[str] | None = None, **_: Any
    ) -> None:
        if semantic_types is None:
            semantic_types = []
        if isinstance(semantic_types, str):
            semantic_types = [semantic_types]
        known = {name for _k, name in _SEMANTIC_OF_DTYPE} | {"other"}
        bad = [t for t in semantic_types if t not in known]
        if bad:
            raise ProfilerConfigurationError(
                f"unknown semantic types {bad}; known: {sorted(known)}"
            )
        self.semantic_types = set(semantic_types)

    def get_domains(self, df: DataFrame, variables: dict[str, Any]) -> list[Domain]:
        return [
            _column_domain(f.name)
            for f in df.schema.fields
            if semantic_type_of(f.dataType) in self.semantic_types
        ]


# ---------------------------------------------------------------------------
# metric lowering (fused)
# ---------------------------------------------------------------------------

# metric name -> Column factory(column_expr, value_kwargs). Names mirror the
# reference's metric registry (expectations/metrics/*): the subset that
# resolves to a single aggregate value — exactly what MetricParameterBuilder
# consumes. ``column_expr`` is already NaN-masked (NaN -> NULL) for
# float/double columns so every lowering inherits the reference's pandas
# skipna semantics in one place: min/max/mean/sum/median/stddev/quantiles
# skip NaN, null.count counts NaN as null, nonnull.count and
# distinct_values.count drop it (pandas count()/nunique(dropna=True)).
# Spark would otherwise sort NaN above max and propagate it through mean.
_METRIC_LOWERINGS: dict[str, Any] = {
    "table.row_count": lambda c, vk: F.count(F.lit(1)),
    "column.min": lambda c, vk: F.min(c),
    "column.max": lambda c, vk: F.max(c),
    "column.mean": lambda c, vk: F.mean(c),
    "column.sum": lambda c, vk: F.sum(c),
    "column.median": lambda c, vk: F.median(c),
    "column.standard_deviation": lambda c, vk: F.stddev(c),
    "column.distinct_values.count": lambda c, vk: F.count_distinct(c),
    "column_values.null.count": lambda c, vk: F.count(
        F.when(c.isNull(), 1)
    ),
    "column_values.nonnull.count": lambda c, vk: F.count(c),
    "column.quantile_values": lambda c, vk: F.percentile(
        c.cast("double"),
        F.array(*[F.lit(float(q)) for q in (vk or {}).get("quantiles", [0.5])]),
    ),
}


def supported_metrics() -> list[str]:
    return sorted(_METRIC_LOWERINGS)


class MetricParameterBuilder:
    """ref: parameter_builder/metric_parameter_builder.py:14-103.

    Declares ONE metric; the engine fuses every declared metric into a
    single aggregation job, then this builder reads its resolved value and
    stores ``{"value": v, "details": {...}}`` under
    ``$parameter.<parameter_name>``."""

    def __init__(
        self,
        parameter_name: str,
        metric_name: str,
        metric_domain_kwargs: str | dict[str, Any] | None = "$domain.domain_kwargs",
        metric_value_kwargs: dict[str, Any] | None = None,
        enforce_numeric_metric: bool = False,
        replace_nan_with_zero: bool = False,
        **_: Any,
    ) -> None:
        if metric_name not in _METRIC_LOWERINGS:
            raise ProfilerConfigurationError(
                f"unsupported metric {metric_name!r}; supported: "
                f"{supported_metrics()}"
            )
        self.parameter_name = parameter_name
        self.metric_name = metric_name
        self.metric_domain_kwargs = metric_domain_kwargs
        self.metric_value_kwargs = dict(metric_value_kwargs or {})
        self.enforce_numeric_metric = bool(enforce_numeric_metric)
        self.replace_nan_with_zero = bool(replace_nan_with_zero)

    # -- fused-plan integration -------------------------------------------
    def _domain_kwargs(
        self, domain: Domain, variables: dict[str, Any]
    ) -> dict[str, Any]:
        dk = self.metric_domain_kwargs
        if dk == "$domain.domain_kwargs" or dk is None:
            return domain.kwargs
        if isinstance(dk, str):
            return _resolve_ref(dk, domain, variables, {})
        return dk

    def term(
        self, df: DataFrame, domain: Domain, variables: dict[str, Any]
    ) -> AggTerm:
        dk = self._domain_kwargs(domain, variables)
        col = dk.get("column")
        if self.metric_name != "table.row_count":
            if not col:
                raise ProfilerConfigurationError(
                    f"metric {self.metric_name!r} needs a column domain"
                )
            if col not in df.columns:
                raise ProfilerConfigurationError(f"unknown column {col!r}")
        alias = metric_alias(
            self.metric_name, column=col, **self.metric_value_kwargs
        )
        expr = None
        if col is not None:
            expr = F.col(col)
            if isinstance(
                df.schema[col].dataType, (T.DoubleType, T.FloatType)
            ):
                expr = F.when(~F.isnan(F.col(col)), F.col(col))
        column = _METRIC_LOWERINGS[self.metric_name](expr, self.metric_value_kwargs)
        return AggTerm(alias=alias, column=column)

    def build(
        self,
        container: dict[str, Any],
        df: DataFrame,
        domain: Domain,
        variables: dict[str, Any],
        resolved: dict[str, Any],
    ) -> None:
        alias = self.term(df, domain, variables).alias
        value = resolved.get(alias)
        if self.enforce_numeric_metric:
            if isinstance(value, float) and math.isnan(value):
                if self.replace_nan_with_zero:
                    value = 0.0
                else:
                    raise ProfilerExecutionError(
                        f"metric {self.metric_name!r} resolved to NaN and "
                        "replace_nan_with_zero is False"
                    )
            elif value is not None and not isinstance(value, Number):
                raise ProfilerExecutionError(
                    f"metric {self.metric_name!r} resolved to non-numeric "
                    f"{type(value).__name__} under enforce_numeric_metric"
                )
        container[f"$parameter.{self.parameter_name}"] = {
            "value": value,
            "details": {
                "metric_configuration": {
                    "metric_name": self.metric_name,
                    "domain_kwargs": self._domain_kwargs(domain, variables),
                    "metric_value_kwargs": self.metric_value_kwargs or None,
                }
            },
        }


# ---------------------------------------------------------------------------
# $-reference resolution (ref: rule_based_profiler/util.py get_parameter_value*)
# ---------------------------------------------------------------------------


def _resolve_ref(
    ref: str,
    domain: Domain,
    variables: dict[str, Any],
    parameters: dict[str, Any],
) -> Any:
    if ref.startswith("$variables."):
        root: Any = variables
        path = ref[len("$variables.") :].split(".")
    elif ref.startswith("$domain."):
        root = {"domain_kwargs": domain.kwargs, "domain_type": domain.domain_type}
        path = ref[len("$domain.") :].split(".")
    elif ref.startswith("$parameter."):
        # longest registered "$parameter.<name>" prefix, then attribute path
        # into its {"value", "details"} payload
        best = None
        for key in parameters:
            if ref == key or ref.startswith(key + "."):
                if best is None or len(key) > len(best):
                    best = key
        if best is None:
            raise ProfilerExecutionError(f"unresolvable reference {ref!r}")
        root = parameters[best]
        rest = ref[len(best) :]
        path = rest.lstrip(".").split(".") if rest else []
        path = [p for p in path if p]
    else:
        raise ProfilerExecutionError(f"unresolvable reference {ref!r}")
    node = root
    for part in path:
        if not isinstance(node, dict) or part not in node:
            raise ProfilerExecutionError(f"unresolvable reference {ref!r}")
        node = node[part]
    return node


def _resolve_value(
    v: Any, domain: Domain, variables: dict[str, Any], parameters: dict[str, Any]
) -> Any:
    if isinstance(v, str) and v.startswith("$"):
        return _resolve_ref(v, domain, variables, parameters)
    if isinstance(v, dict):
        return {
            k: _resolve_value(x, domain, variables, parameters)
            for k, x in v.items()
        }
    if isinstance(v, list):
        return [_resolve_value(x, domain, variables, parameters) for x in v]
    return v


class DefaultExpectationConfigurationBuilder:
    """ref: default_expectation_configuration_builder.py:15-71 — emit one
    (expectation_type, kwargs) with every ``$``-reference resolved."""

    def __init__(
        self,
        expectation_type: str,
        meta: dict[str, Any] | None = None,
        **kwargs: Any,
    ) -> None:
        if meta is None:
            meta = {}
        if not isinstance(meta, dict):
            raise ProfilerConfigurationError("meta must be a dict")
        self.expectation_type = expectation_type
        self.kwargs = kwargs
        self.meta = meta

    def build(
        self,
        domain: Domain,
        variables: dict[str, Any],
        parameters: dict[str, Any],
    ) -> tuple[str, dict[str, Any], dict[str, Any]]:
        kwargs = {
            k: _resolve_value(v, domain, variables, parameters)
            for k, v in self.kwargs.items()
        }
        meta = _resolve_value(self.meta, domain, variables, parameters)
        return self.expectation_type, kwargs, meta


# ---------------------------------------------------------------------------
# rule + profiler
# ---------------------------------------------------------------------------

_DOMAIN_BUILDERS = {
    "TableDomainBuilder": TableDomainBuilder,
    "ColumnDomainBuilder": ColumnDomainBuilder,
    "SemanticTypeColumnDomainBuilder": SemanticTypeColumnDomainBuilder,
    # reference class name alias (simple_semantic_type_domain_builder.py)
    "SimpleSemanticTypeColumnDomainBuilder": SemanticTypeColumnDomainBuilder,
}

_PARAMETER_BUILDERS = {"MetricParameterBuilder": MetricParameterBuilder}


@dataclass
class Rule:
    """ref: rule/rule.py:15-87 (minus the deepcopy-per-access hazards)."""

    name: str
    domain_builder: Any
    parameter_builders: list[MetricParameterBuilder] = field(default_factory=list)
    expectation_configuration_builders: list[
        DefaultExpectationConfigurationBuilder
    ] = field(default_factory=list)


def _instantiate(config: dict[str, Any], registry: dict, default: str | None, what: str):
    cfg = dict(config)
    class_name = cfg.pop("class_name", default)
    cfg.pop("module_name", None)  # config-compat no-op: registry is local
    if class_name not in registry:
        raise ProfilerConfigurationError(
            f"unknown {what} class {class_name!r}; known: {sorted(registry)}"
        )
    return registry[class_name](**cfg)


class RuleBasedProfiler:
    """ref: profiler.py:98-237. Construct from the same config-dict shape
    the reference loads from YAML; ``profile(df)`` returns a
    ``ConstraintSuite`` ready for ``Validator.validate``.

    Execution shape: domain discovery is schema-only; every rule's metric
    parameters fuse into ONE aggregation job over ``df`` (deduped by metric
    fingerprint across rules), then expectation configs are built
    driver-side. Per-expectation ``meta`` and the config citation land in
    ``suite.meta`` (our Constraint carries type+kwargs only, by design)."""

    def __init__(self, profiler_config: dict[str, Any]) -> None:
        self._config = profiler_config
        self.variables: dict[str, Any] = dict(profiler_config.get("variables", {}))
        self.rules: list[Rule] = []
        rules_cfg = profiler_config.get("rules", {})
        if not rules_cfg:
            raise ProfilerConfigurationError("profiler_config has no rules")
        for rule_name, rule_config in rules_cfg.items():
            db_cfg = rule_config.get("domain_builder")
            if db_cfg is None:
                raise ProfilerConfigurationError(
                    f'Invalid rule "{rule_name}": no domain_builder found.'
                )
            domain_builder = _instantiate(
                db_cfg, _DOMAIN_BUILDERS, None, "domain_builder"
            )
            pbs = [
                _instantiate(
                    c, _PARAMETER_BUILDERS, "MetricParameterBuilder",
                    "parameter_builder",
                )
                for c in rule_config.get("parameter_builders", [])
            ]
            ecbs = [
                DefaultExpectationConfigurationBuilder(**c)
                for c in rule_config.get("expectation_configuration_builders", [])
            ]
            self.rules.append(
                Rule(
                    name=rule_name,
                    domain_builder=domain_builder,
                    parameter_builders=pbs,
                    expectation_configuration_builders=ecbs,
                )
            )

    def profile(
        self,
        df: DataFrame,
        suite_name: str | None = None,
        include_citation: bool = True,
    ) -> ConstraintSuite:
        if suite_name is None:
            suite_name = f"rule_based_profiler_{fingerprint(self._config)[:8]}"

        # plan: every (rule, domain, parameter builder) -> fused AggTerm
        per_rule_domains: list[tuple[Rule, list[Domain]]] = [
            (rule, rule.domain_builder.get_domains(df, self.variables))
            for rule in self.rules
        ]
        terms: dict[str, AggTerm] = {}
        for rule, domains in per_rule_domains:
            for domain in domains:
                for pb in rule.parameter_builders:
                    t = pb.term(df, domain, self.variables)
                    terms.setdefault(t.alias, t)

        # ONE Spark job for every metric parameter of every rule
        resolved: dict[str, Any] = {}
        if terms:
            [(_, resolved)] = run_fused_pass(df, list(terms.values()), [])

        suite = ConstraintSuite(suite_name)
        expectation_meta: dict[str, dict[str, Any]] = {}
        for rule, domains in per_rule_domains:
            for domain in domains:
                parameters: dict[str, Any] = {}
                for pb in rule.parameter_builders:
                    pb.build(parameters, df, domain, self.variables, resolved)
                for ecb in rule.expectation_configuration_builders:
                    etype, kwargs, meta = ecb.build(
                        domain, self.variables, parameters
                    )
                    suite.add(etype, **kwargs)
                    if meta:
                        expectation_meta[suite.constraints[-1].id] = meta
        if expectation_meta:
            suite.meta["expectation_meta"] = expectation_meta
        if include_citation:
            suite.meta["citations"] = [
                {
                    "comment": "Suite created by Rule-Based Profiler with "
                    "the configuration included.",
                    "profiler_config": self._config,
                }
            ]
        return suite
