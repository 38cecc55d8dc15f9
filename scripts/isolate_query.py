#!/usr/bin/env python
"""Isolate one query's cost: build (Python/compile) vs analysis vs
execution, each timed separately, with an optional repeat to split JIT/worker
warm-up from steady state.

Usage: python scripts/isolate_query.py <query> [<query> ...] [--reps N]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from mqtt_streamr_spark.queries import QUERIES  # noqa: E402
from mqtt_streamr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # accept both --reps=N and --reps N (ADVICE r11: the space form
    # crashed on split("=") and leaked the bare N as a query name)
    argv = sys.argv[1:]
    args: list[str] = []
    reps = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
            i += 1
        else:
            args.append(a)
            i += 1
    spark = get_spark(app_name="isolate-query")
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    # warm the JVM/parquet footers the same way bench.py does
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    for name in args:
        for rep in range(reps):
            jvm.System.gc()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.schema  # forces analysis only
            t_analyze = time.perf_counter() - t0
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name} rep{rep}: build={t_build:.3f}s "
                f"analyze={t_analyze:.3f}s exec={t_exec:.3f}s "
                f"total={t_build + t_analyze + t_exec:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
