#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> <query> [<query> ...]
Writes plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt for each (default
r17). Driver-loop rows (k-center, PageRank) execute their loop while the
frame is built; their plan file shows the final frame, and the loop
structure is documented in the round's OPTIMIZATION notes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_event_stream_spark.plans import QUERIES  # noqa: E402
from eth_event_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r17"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
