#!/usr/bin/env python
"""Per-query job/stage census: how many Spark jobs and stages one timed
execution of each named declared query schedules, and its wall time in
this session. At sf0.1 the scheduling floor (~50-150 ms/job in
local[32]) dominates many battery lines, so job count is the first
thing to read before blaming any operator (guide §1.2: fix the
distributed algorithm - number of passes - before per-task work).

Usage: python tools/profile_query.py QUERY [QUERY ...]
Prints one JSON line per query: {"q", "s", "jobs", "stages", "tasks"}.
Queries run in ONE session in the given order (memo sharing included),
after the bench's standard warmup-lite (q1 + Arrow pool).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from web_maxiv_hdbppviewer_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="profile-query")
    queries = entry_mod.queries()
    queries["q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    tracker = spark.sparkContext.statusTracker()
    for name in names:
        group = f"profile-{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None and sinfo.numTasks > 0:
                    stages += 1
                    tasks += sinfo.numTasks
        print(
            json.dumps(
                {
                    "q": name,
                    "s": dt,
                    "jobs": len(job_ids),
                    "stages": stages,
                    "tasks": tasks,
                },
                separators=(",", ":"),
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
