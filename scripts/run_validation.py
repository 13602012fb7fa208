"""spark-submit entrypoint for production validation runs.

    zip -r dps.zip data_profiler_spark
    spark-submit --py-files dps.zip scripts/run_validation.py \
        --table /path/or/catalog.db.code_files \
        --suite suite.json \
        --results /path/to/results_store \
        --partition-col partition_id \
        [--snapshot-id 123456] [--dim commits=/path/to/commits] \
        [--violation-keys repo,path,commit] [--chunk-size 64]

The suite JSON is ``ConstraintSuite.to_dict()`` shape:
    {"name": "...", "constraints": [{"type": "...", "kwargs": {...}}, ...]}

Resumable: re-submitting the same command skips partitions whose verdicts
are already checkpointed for (suite fingerprint, snapshot).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="parquet path or catalog table")
    ap.add_argument("--suite", required=True, help="suite JSON file")
    ap.add_argument("--results", required=True, help="results-store path")
    ap.add_argument("--partition-col", default="partition_id")
    ap.add_argument("--snapshot-id", default="")
    ap.add_argument(
        "--dim", action="append", default=[],
        help="name=path for referential dimension tables (repeatable)",
    )
    ap.add_argument("--violation-keys", default="")
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--violation-limit", type=int, default=20)
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args()

    from data_profiler_spark.checkpoint import CheckpointRunner
    from data_profiler_spark.core.session import get_spark_session
    from data_profiler_spark.core.suite import ConstraintSuite
    from data_profiler_spark.sources.readers import read_path, read_table
    from data_profiler_spark.sources.results_store import ResultsStore

    spark = get_spark_session(app_name="dps_validation")

    def load(ref: str):
        if "/" in ref or ref.endswith(".parquet"):
            return read_path(spark, ref, format="parquet")
        return read_table(spark, ref, snapshot_id=args.snapshot_id or None)

    df = load(args.table)
    tables = {}
    for d in args.dim:
        name, path = d.split("=", 1)
        tables[name] = load(path)

    with open(args.suite) as fh:
        suite = ConstraintSuite.from_dict(json.load(fh))

    runner = CheckpointRunner(
        ResultsStore(spark, args.results),
        violation_limit=args.violation_limit,
        chunk_size=args.chunk_size,
    )
    report = runner.run(
        df,
        suite,
        partition_col=args.partition_col,
        snapshot_id=args.snapshot_id,
        run_id=args.run_id,
        tables=tables,
        violation_key_columns=(
            args.violation_keys.split(",") if args.violation_keys else None
        ),
    )
    print(
        json.dumps(
            {
                "run_id": report.run_id,
                "planned": len(report.planned_partitions),
                "skipped": len(report.skipped_partitions),
                "validated": len(report.validated_partitions),
                "constraints": report.n_constraints,
                "duration_ms": report.duration_ms,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
