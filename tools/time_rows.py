#!/usr/bin/env python
"""Time named registered queries with the noop sink, min-of-N.

Usage: python tools/time_rows.py [-n N] <query> [<query> ...]
Mirrors bench.py methodology (clearCache between runs, noop sink,
min-of-N) for fast in-session A/B of individual rows while optimizing.
Not part of the graded bench; numbers printed as one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_event_stream_spark.plans import QUERIES  # noqa: E402
from eth_event_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 2
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="time_rows")
    # warm-up: JVM + parquet footers, untimed (same as bench.py)
    QUERIES["agg_stats"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"time_rows: {name}")
        best = float("inf")
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"rows": out, "n": n, "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
