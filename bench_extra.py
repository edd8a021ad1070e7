#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver's measurement; this file holds the extra instrumentation the
optimization round needs — guide §1).

Modes:
  python bench_extra.py q <name> [name...]     time queries, bench.py discipline
      (same session conf, warmup pass, N interleaved cycles with
      spark.catalog.clearCache() between cycles, per-query medians)
  python bench_extra.py explain <name> [...]   write .explain("formatted") to
      plans/r06/<name>_<tag>.txt  (tag from $PLAN_TAG, default "cur")
  python bench_extra.py noop <name> [...]      time with the noop sink instead
      of .count() (guide §1.4 — forces every column)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 here — the driver's
measurement SF), SPARK_GRAFT_CPUS, WATCHMAN_BENCH_CYCLES (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", max(4, (os.cpu_count() or 8) // 2)))


def get_session():
    from bench import get_session as bench_session

    return bench_session(CPUS)


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod

    spark = get_session()
    qs = entrymod.queries()

    if mode == "explain":
        tag = os.environ.get("PLAN_TAG", "cur")
        outdir = os.path.join(REPO, "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt.splitlines())} lines)")
        return

    cycles = max(1, int(os.environ.get("WATCHMAN_BENCH_CYCLES", "3")))
    walls: dict[str, list[float]] = {n: [] for n in names}

    def run(name: str) -> None:
        df = qs[name](spark, SF_DIR)
        if mode == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for name in names:  # warmup (JIT, python workers)
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        run(name)
    for _ in range(cycles):
        spark.catalog.clearCache()
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.time()
            run(name)
            walls[name].append(round(time.time() - t0, 3))
    med = {n: round(statistics.median(w), 3) for n, w in walls.items()}
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "mode": mode,
                      "medians": med, "walls": walls,
                      "total_median": round(sum(med.values()), 3)}))


if __name__ == "__main__":
    main()
