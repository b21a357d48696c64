"""Round-8 optimization harness (separate from the FROZEN bench.py).

Modes:
  python bench_extra.py queries [name ...]   — per-query timings, interleaved
      fixed windows over count() AND a noop-sink pass (guide §1.4) so the
      computation is timed, not the sink or Catalyst's count-pruning.
  python bench_extra.py plans <outdir> [name ...] — dump explain("formatted")
      for the given queries into <outdir>/<name>.txt.
  python bench_extra.py crawl [master]       — one in-process crawl_job with
      stage attribution (same job bench.py measures).

Never writes BENCH_LOCAL.json; prints plain JSON to stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (reuses scratch setup + BENCH_QUERIES)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def _spark(app: str):
    from archive_query_log_spark.session import get_spark

    spark = get_spark(app_name=app, master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(names: list[str], repeats: int = 3) -> dict:
    from archive_query_log_spark import entry_queries

    spark = _spark("bench-extra-queries")
    qs = entry_queries.queries()
    names = names or bench.BENCH_QUERIES
    for name in names:
        qs[name](spark, SF_DIR).limit(1).collect()  # warm
    count_w: dict[str, list[float]] = {n: [] for n in names}
    noop_w: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"count:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            count_w[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            noop_w[name].append(round(time.perf_counter() - t0, 3))
    spark.stop()
    return {
        "sf_dir": SF_DIR,
        "count_median": {
            n: round(statistics.median(v), 3) for n, v in count_w.items()
        },
        "count_best": {n: min(v) for n, v in count_w.items()},
        "noop_median": {
            n: round(statistics.median(v), 3) for n, v in noop_w.items()
        },
        "noop_best": {n: min(v) for n, v in noop_w.items()},
        "count_windows": count_w,
        "noop_windows": noop_w,
    }


def dump_plans(outdir: str, names: list[str]) -> None:
    from archive_query_log_spark import entry_queries

    os.makedirs(outdir, exist_ok=True)
    spark = _spark("bench-extra-plans")
    qs = entry_queries.queries()
    for name in names or bench.BENCH_QUERIES:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {outdir}/{name}.txt", file=sys.stderr)
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        print(json.dumps(run_queries(sys.argv[2:]), indent=1))
    elif mode == "plans":
        dump_plans(sys.argv[2], sys.argv[3:])
    elif mode == "crawl":
        master = sys.argv[2] if len(sys.argv) > 2 else f"local[{CPUS}]"
        sf = bench._sf_of(SF_DIR)
        n_frontier = max(20_000, int(20_000_000 * sf)) if sf > 0 else 100_000
        print(
            json.dumps(
                bench.crawl_job(
                    master, n_frontier, n_frontier // 10, per_fetch=True,
                    n_runs=2, stages=True,
                ),
                indent=1,
            )
        )
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
