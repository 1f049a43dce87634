"""Client CLI — the reference's ``client.py`` surface on a SparkSession.

Reference commands (reference client/client.py:142-216, monitoring.py):
``submit`` (input, output, job file, M, R), ``status [--watch]``,
``list``, ``results``, ``cancel``. Here the coordinator/worker cluster is
a SparkSession, so:

- **submit** runs the job file synchronously through the MR-compat layer
  (``mr.run_job_file``) and writes the reference's TSV part-file layout.
  There is no job queue to poll — Spark schedules stages itself; the
  ``status`` phase loop of the reference collapses into blocking
  execution with live stage progress from ``statusTracker()``.
- **status** reports active stages/tasks from the StatusTracker — the
  analogue of the reference's per-phase task counts
  (reference coordinator/server.py:497-518).
- **results** lists output part files (the reference's stubbed
  ``GetResults`` — reference coordinator/server.py:533-552 — done for
  real).
- ``--num-map`` maps to input-split parallelism (minPartitions), R to
  shuffle/output partitions — the two knobs of the reference's
  JobRequest (reference coordinator.proto:16-22).

Usage::

    python -m cooler_mapreduce_spark.cli submit INPUT OUTPUT JOB_FILE \
        [--num-map M] [--num-reduce R]
    python -m cooler_mapreduce_spark.cli results OUTPUT
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def _submit(args: argparse.Namespace) -> int:
    from .mr import run_job_file, to_tsv_lines
    from .session import get_session

    spark = get_session("mr-submit")
    sc = spark.sparkContext
    t0 = time.perf_counter()

    lines = sc.textFile(args.input, minPartitions=args.num_map)
    kv = lines.zipWithIndex().map(lambda t: (f"{args.input}:{t[1]}", t[0]))
    result = run_job_file(spark, kv, args.job_file, num_reduce=args.num_reduce)
    to_tsv_lines(result).saveAsTextFile(args.output)

    elapsed = time.perf_counter() - t0
    parts = sorted(glob.glob(os.path.join(args.output, "part-*")))
    print(f"job COMPLETED in {elapsed:.2f}s; {len(parts)} output partitions -> {args.output}")
    return 0


def _status(args: argparse.Namespace) -> int:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        print("no active SparkSession in this process (jobs run synchronously; "
              "a finished submit has no residual state)")
        return 0
    st = spark.sparkContext.statusTracker()
    for sid in st.getActiveStageIds():
        info = st.getStageInfo(sid)
        if info:
            print(f"stage {sid}: {info.numCompletedTasks}/{info.numTasks} tasks "
                  f"({info.numActiveTasks} running, {info.numFailedTasks} failed)")
    if not st.getActiveStageIds():
        print("no active stages")
    return 0


def _results(args: argparse.Namespace) -> int:
    parts = sorted(glob.glob(os.path.join(args.output, "part-*")))
    if not parts:
        print(f"no part files under {args.output}", file=sys.stderr)
        return 1
    for p in parts:
        print(p)
    if args.show:
        for p in parts:
            with open(p) as f:
                sys.stdout.write(f.read())
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cooler-mapreduce-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("submit", help="run a MapReduce job file")
    s.add_argument("input"), s.add_argument("output"), s.add_argument("job_file")
    s.add_argument("--num-map", type=int, default=None,
                   help="input split parallelism (reference M)")
    s.add_argument("--num-reduce", type=int, default=None,
                   help="reduce/output partitions (reference R)")
    s.set_defaults(fn=_submit)

    st = sub.add_parser("status", help="active stage/task progress")
    st.set_defaults(fn=_status)

    r = sub.add_parser("results", help="list (and print) job output files")
    r.add_argument("output")
    r.add_argument("--show", action="store_true")
    r.set_defaults(fn=_results)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
