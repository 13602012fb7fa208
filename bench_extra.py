"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink so the computation is measured, not the sink,
and optionally dumps .explain("formatted") for plan auditing.

This file is SEPARATE from bench.py (which is frozen for the driver's
measurement): numbers cited in OPTIMIZATION_r07.md come from here unless
stated otherwise. Methodology matches bench.py where it matters: same
session factory, same master local[$SPARK_GRAFT_CPUS], same calibration
probe before every timed run so burst-credit throttling is attributable.

Usage:
    python bench_extra.py [--sf DIR] [--reps N] [--explain-dir DIR]
                          [--sink noop|count] query [query ...]
Prints one JSON line: {"sf": ..., "queries": {name: [sec, ...]},
"probes": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _probe(spark) -> float:
    t0 = time.time()
    spark.range(4_000_000).selectExpr(
        "sum(pmod(xxhash64(id), 1000000)) as h"
    ).collect()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="",
                    help="suffix for explain files, e.g. _before/_after")
    ap.add_argument("--sink", choices=["noop", "count"], default="count",
                    help="count matches bench.py; noop isolates compute")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from data_profiler_spark.core.session import get_spark_session
    from data_profiler_spark import queries as Q

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark_session(app_name="bench_extra", master=f"local[{cpus}]")
    spark.range(10).count()
    _probe(spark)

    qs = Q.queries()
    names = args.queries
    if names == ["all"]:
        names = list(qs)
    out: dict[str, list[float]] = {}
    probes: dict[str, list[float]] = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(txt)
        out[name] = []
        probes[name] = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            p = _probe(spark)
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.time() - t0, 3)
            out[name].append(dt)
            probes[name].append(p)
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "sink": args.sink,
                      "queries": out, "probes": probes}))
    spark.stop()


if __name__ == "__main__":
    main()
