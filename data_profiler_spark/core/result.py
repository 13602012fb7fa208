"""Result shapes — mirrors the reference's ExpectationValidationResult.

Field semantics follow /root/reference/src/data_profiler/expectations/
expectation.py:1321-1369 (map verdicts) and :1760-1871 (_format_map_output):
- ``success`` for map constraints = (nonnull - unexpected)/nonnull >= mostly,
  vacuously True when the domain is empty (expectation.py:1354-1356);
- ``unexpected_percent`` is relative to nonnull values,
  ``unexpected_percent_total`` relative to all rows (expectation.py:1793-1825);
- suite ``statistics`` mirror validator.py:1465-1488.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class ConstraintResult:
    constraint_id: str
    constraint_type: str
    kwargs: dict[str, Any]
    success: bool
    group: dict[str, Any] = field(default_factory=dict)
    element_count: int | None = None
    unexpected_count: int | None = None
    unexpected_percent: float | None = None
    unexpected_percent_total: float | None = None
    missing_count: int | None = None
    observed_value: Any = None
    details: dict[str, Any] = field(default_factory=dict)
    partial_unexpected_list: list[Any] | None = None
    partial_unexpected_counts: list[dict[str, Any]] | None = None
    unexpected_list: list[Any] | None = None
    exception_info: str | None = None

    def to_row(self) -> dict[str, Any]:
        """Flatten for the results table (checkpoint store)."""
        import json

        return {
            "constraint_id": self.constraint_id,
            "constraint_type": self.constraint_type,
            "success": bool(self.success),
            "group_json": json.dumps(self.group, sort_keys=True, default=str),
            "element_count": self.element_count,
            "unexpected_count": self.unexpected_count,
            "observed_json": json.dumps(
                {
                    "observed_value": self.observed_value,
                    "unexpected_percent": self.unexpected_percent,
                    "unexpected_percent_total": self.unexpected_percent_total,
                    "missing_count": self.missing_count,
                    "partial_unexpected_list": self.partial_unexpected_list,
                    "partial_unexpected_counts": self.partial_unexpected_counts,
                    "details": self.details,
                },
                sort_keys=True,
                default=str,
            ),
            "exception_info": self.exception_info,
        }


@dataclass
class SuiteResult:
    suite_name: str
    suite_fingerprint: str
    results: list[ConstraintResult]

    @property
    def success(self) -> bool:
        return all(r.success for r in self.results)

    @property
    def statistics(self) -> dict[str, Any]:
        evaluated = len(self.results)
        successful = sum(1 for r in self.results if r.success)
        return {
            "evaluated_expectations": evaluated,
            "successful_expectations": successful,
            "unsuccessful_expectations": evaluated - successful,
            "success_percent": (100.0 * successful / evaluated) if evaluated else None,
        }
