"""data_profiler_spark — a PySpark-native schema + constraint validation engine.

Built from scratch against the behavior of open-metadata/data-profiler
(reference at /root/reference): a metric-computation + constraint-evaluation
engine, re-expressed Spark-first.

Key ideas (see SURVEY.md):
- Constraints declare named metrics; a planner dedups metrics by fingerprint
  and fuses every aggregate sharing a (domain, grouping) into ONE
  ``df.groupBy(...).agg(...)`` pass (the reference's ``resolve_metric_bundle``,
  sparkdf_execution_engine.py:632-692, generalized to grouped domains).
- Map constraints contribute ``sum(when(unexpected, 1))`` terms to the same
  fused pass; violation rows are extracted lazily only for failed constraints.
- Verdicts are pure Python over resolved scalars, shaped like the reference's
  ExpectationValidationResult (expectations/expectation.py:1321-1369).
- Runs are resumable: verdicts + lineage land in a results table keyed
  (run_id, suite_fingerprint, partition_id); re-submission skips done work.
"""

from data_profiler_spark.core.session import get_spark_session
from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.validator import Validator

__version__ = "0.1.0"

__all__ = ["get_spark_session", "ConstraintSuite", "Validator", "__version__"]
