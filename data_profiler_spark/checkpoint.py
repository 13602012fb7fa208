"""Resumable checkpoint runner — the production entry point.

The Spark-first rebuild of Checkpoint.run (reference
checkpoint/checkpoint.py:211-338): given a table, a suite, and a partition
column, validate every partition, write per-partition verdicts + violation
samples + lineage to the results store, and SKIP partitions a previous run
already completed.

Physical plan: pending partitions are validated in CHUNKS. Each chunk is ONE
fused pass grouped by the partition column (not a per-partition filter loop —
that would rescan the table P times), followed by the bounded post-pass jobs
and one violation-extraction job per failed constraint. Chunking bounds the
work lost to a crash; with Iceberg, the partition-column filter prunes the
scan to exactly the pending partitions.

Scale notes: the chunk pass groups by partition_id, so Spark's hash
aggregation distributes naturally; violation samples are limited per
(constraint, chunk) with deterministic ordering so a resumed run reproduces
byte-identical samples (FIXTURES.md §5).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_spark.core.suite import ConstraintSuite
from data_profiler_spark.sources.results_store import ResultsStore
from data_profiler_spark.validator import Validator


@dataclass
class CheckpointReport:
    run_id: str
    planned_partitions: list[str]
    skipped_partitions: list[str]
    validated_partitions: list[str]
    n_constraints: int
    duration_ms: int


class CheckpointRunner:
    def __init__(
        self,
        store: ResultsStore,
        violation_limit: int = 20,
        chunk_size: int = 64,
    ) -> None:
        self.store = store
        self.violation_limit = violation_limit
        self.chunk_size = chunk_size

    def run(
        self,
        df: DataFrame,
        suite: ConstraintSuite,
        partition_col: str,
        snapshot_id: str = "",
        run_id: str | None = None,
        tables: dict[str, DataFrame] | None = None,
        violation_key_columns: list[str] | None = None,
    ) -> CheckpointReport:
        t_start = time.time()
        run_id = run_id or uuid.uuid4().hex[:12]
        fp = suite.fingerprint

        planned = [
            str(r[partition_col])
            for r in df.select(partition_col).distinct().collect()
        ]
        done = self.store.completed_partitions(fp, snapshot_id)
        pending = sorted(p for p in planned if p not in done)
        skipped = sorted(p for p in planned if p in done)

        validated: list[str] = []
        for i in range(0, len(pending), self.chunk_size):
            chunk = pending[i : i + self.chunk_size]
            t_chunk = time.time()
            part = df.where(F.col(partition_col).cast("string").isin(chunk))
            # multiple jobs read this slice (fused pass + post passes +
            # violation extraction): cache it for the chunk's lifetime
            part = part.persist()
            try:
                v = Validator(part, tables=tables)
                suite_result = v.validate(suite, group_by=[partition_col])

                sampled: dict[tuple[str, str], list[dict[str, Any]]] = {}
                if violation_key_columns:
                    # shared schema -> ALL constraints' samples in one job
                    # (violation_samples_unioned): 1 driver round-trip per
                    # chunk instead of one per failed constraint
                    udf = v.violation_samples_unioned(
                        suite,
                        limit=self.violation_limit,
                        only_failed_of=suite_result,
                        key_columns=[partition_col] + violation_key_columns,
                    )
                    for row in udf.collect() if udf is not None else []:
                        d = row.asDict(recursive=True)
                        cid = d.pop("constraint_id")
                        pid = str(d.get(partition_col))
                        sampled.setdefault((cid, pid), []).append(d)
                else:
                    samples = v.violation_samples(
                        suite,
                        limit=self.violation_limit,
                        only_failed_of=suite_result,
                    )
                    for cid, sdf in samples.items():
                        for row in sdf.collect():
                            d = row.asDict(recursive=True)
                            pid = str(d.get(partition_col))
                            sampled.setdefault((cid, pid), []).append(d)

                now = int(time.time() * 1000)
                chunk_ms = int((time.time() - t_chunk) * 1000)
                rows = []
                per_part_rowcount: dict[str, int] = {}
                for r in suite_result.results:
                    pid = str(r.group.get(partition_col))
                    base = r.to_row()
                    if r.element_count is not None:
                        per_part_rowcount[pid] = r.element_count
                    rows.append(
                        {
                            **base,
                            "run_id": run_id,
                            "suite_fingerprint": fp,
                            "snapshot_id": snapshot_id,
                            "partition_id": pid,
                            "violations_json": json.dumps(
                                sampled.get((r.constraint_id, pid), []), default=str
                            ),
                            "started_at_ms": now - chunk_ms,
                            "finished_at_ms": now,
                            "duration_ms": chunk_ms,
                        }
                    )
                self.store.append_rows(rows)
                # sentinel LAST: a crash before this point re-runs the chunk
                self.store.mark_done(
                    run_id, fp, snapshot_id, chunk,
                    lineage={
                        "snapshot_id": snapshot_id,
                        "partition_col": partition_col,
                        "row_counts": per_part_rowcount,
                        "chunk_duration_ms": chunk_ms,
                    },
                )
                validated.extend(chunk)
            finally:
                part.unpersist()

        return CheckpointReport(
            run_id=run_id,
            planned_partitions=sorted(planned),
            skipped_partitions=skipped,
            validated_partitions=validated,
            n_constraints=len(suite.constraints),
            duration_ms=int((time.time() - t_start) * 1000),
        )
