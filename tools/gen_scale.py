#!/usr/bin/env python
"""Scale-rehearsal data generator: replicate the FACT tables of an sf dir
``factor``x with key-shifted copies, keeping dimension tables fixed — the
shape a real scale-up takes (facts dominate; dims grow slowly).

Key shifts preserve join semantics (lineitem.l_orderkey shifts with
orders.o_orderkey) and row identity (event/doc/vec ids stay unique).
Document texts and embeddings are replicated VERBATIM, which turns every
document into a ``factor``-clique of near-duplicates — deliberately: a
duplicate-heavy corpus is exactly what the capped dedup paths must bound.

Usage: python tools/gen_scale.py SRC_SF_DIR DST_DIR FACTOR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from eth_event_stream_spark.session import get_spark  # noqa: E402

DIMS = ["region", "nation", "customer", "supplier", "part"]
# fact table -> columns to shift by replica * stride (stride = global max+1
# of the PRIMARY key so every replica's ids are disjoint)
FACTS: dict[str, tuple[str, list[str]]] = {
    "orders": ("o_orderkey", ["o_orderkey"]),
    "lineitem": ("l_orderkey", ["l_orderkey"]),  # same stride as orders
    "events": ("event_id", ["event_id"]),
    "documents": ("doc_id", ["doc_id"]),
    "embeddings": ("vec_id", ["vec_id"]),
}


def _replicate(df: DataFrame, shift_cols: list[str], stride: int, factor: int) -> DataFrame:
    out = df
    for i in range(1, factor):
        rep = df
        for c in shift_cols:
            rep = rep.withColumn(c, F.col(c) + F.lit(i * stride))
        out = out.unionByName(rep)
    return out


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark(app_name="gen_scale")
    os.makedirs(dst, exist_ok=True)

    for name in DIMS:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )

    # one stride shared by orders+lineitem so the join key stays aligned
    orders = spark.read.parquet(f"{src}/orders.parquet")
    order_stride = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    for name, (pk, shift_cols) in FACTS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        stride = (
            order_stride
            if name in ("orders", "lineitem")
            else df.agg(F.max(pk)).collect()[0][0] + 1
        )
        _replicate(df, shift_cols, stride, factor).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"{name}: x{factor} (stride {stride})")
    spark.stop()


if __name__ == "__main__":
    main()
