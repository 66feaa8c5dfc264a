"""Per-query job/stage/task census + wall time, via SparkStatusTracker.

The sandbox runs with the UI disabled, so the optimization round's
"empirical approach" (guide §1.1) needs another way to see where a
query's time goes. For bench-scale inputs (sf0.1 = 17 MB) nearly all
wall time is fixed per-job / per-stage / per-task overhead, so the
job/stage/task census IS the cost model: a query that launches 26 jobs
at 5k rows is paying ~26x scheduler+py4j round trips, not compute.

Usage:

    python tools/profile_catalog.py <sf_dir> [name ...]

Prints one line per query: wall seconds, #jobs, #stages, #tasks.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from data_integration_project_spark import plans
    from data_integration_project_spark.session import get_spark

    spark = get_spark("profile_catalog")
    sc = spark.sparkContext
    # warm file listing + JVM like bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    tracker = sc.statusTracker()
    print(f"{'query':42s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in names or list(plans.REGISTRY):
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            plans.REGISTRY[name].fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — survey tool
            print(f"{name:42s} ERR {type(exc).__name__}: {exc}")
            continue
        finally:
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"{name:42s} {dt:7.2f} {len(job_ids):5d} {n_stages:6d} {n_tasks:6d}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
