#!/usr/bin/env python
"""Execute named registered queries and dump the FINAL adaptive plan.

Usage: python tools/executed_plan.py <query> [<query> ...]

The static .explain("formatted") dump (tools/dump_plans.py) prints the
initial plan (`isFinalPlan=false`) — it cannot show which replicated
subtrees AQE deduplicates at RUNTIME via stage reuse. This tool executes
the frame through its own QueryExecution (RDD count over the physical
plan: full computation of every operator, like the noop sink) and then
prints the formatted plan again, which now renders the final adaptive
tree with ReusedQueryStage / ReusedExchange nodes. Output to
plans/r17/<query>_executed.txt plus a one-line summary per query:
exchanges vs reused (how much of the static replication actually re-ran).
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eth_event_stream_spark.plans import QUERIES  # noqa: E402
from eth_event_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)


def main() -> None:
    names = sys.argv[1:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="executed_plan")
    for name in names:
        df = QUERIES[name].fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        spark.sparkContext.setJobDescription(f"executed_plan: {name}")
        qe.executedPlan().execute().count()  # full physical execution
        txt = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
        path = os.path.join(OUT, f"{name}_executed.txt")
        with open(path, "w") as f:
            f.write(txt)
        ex = len(re.findall(r"\bExchange\b", txt))
        reused_ex = len(re.findall(r"ReusedExchange", txt))
        reused_stage = len(re.findall(r"ReusedQueryStage|StageReuse", txt))
        scans = len(re.findall(r"Scan parquet", txt))
        print(
            f"{name}\texchanges={ex}\treused_exchange={reused_ex}"
            f"\treused_stage={reused_stage}\tscans={scans}\t-> {path}"
        )


if __name__ == "__main__":
    main()
