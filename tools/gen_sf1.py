#!/usr/bin/env python
"""Synthesize an sf1-scale fixture set (~10× sf0.1) for the scaling
spot-run (VERDICT r4 item 7).

The driver ships fixtures only up to sf0.1; SCALING.md therefore
extrapolates from two decades.  This tool adds a third decade for the
heavy-tail timing run by key-shifted replication of sf0.1: each fact
table is unioned 10× with every join/entity key offset by
``copy × (max_key + 1)`` so referential joins (orders↔lineitem↔supplier,
events.user_id, documents.doc_id, …) stay exactly as selective as the
original — the copies never cross-join each other.  Dimension tables
(region, nation) are copied once.  TIMING fixture only: value
distributions repeat 10×, which is fine for plan-shape measurement and
useless for correctness oracles (which stay at sf0.01).

    python tools/gen_sf1.py [--out /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

#: table → columns to shift per copy (keyed by the table's own max of the
#: FIRST listed column group; every column in a group shares one offset
#: base so cross-table joins line up).
#: offset bases: ck=custkey, ok=orderkey, sk=suppkey, pk=partkey,
#: ek=event_id, uk=user_id, dk=doc_id, vk=vec_id
SHIFTS = {
    "customer": {"c_custkey": "ck"},
    "orders": {"o_orderkey": "ok", "o_custkey": "ck"},
    "lineitem": {"l_orderkey": "ok", "l_suppkey": "sk", "l_partkey": "pk"},
    "supplier": {"s_suppkey": "sk"},
    "part": {"p_partkey": "pk"},
    "events": {"event_id": "ek", "user_id": "uk"},
    "documents": {"doc_id": "dk"},
    "embeddings": {"vec_id": "vk"},
}
#: which (table, column) defines each offset base
BASES = {
    "ck": ("customer", "c_custkey"),
    "ok": ("orders", "o_orderkey"),
    "sk": ("supplier", "s_suppkey"),
    "pk": ("part", "p_partkey"),
    "ek": ("events", "event_id"),
    "uk": ("events", "user_id"),
    "dk": ("documents", "doc_id"),
    "vk": ("embeddings", "vec_id"),
}
DIMS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mysqldump_to_parquet_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="gen-sf1", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(args.out, exist_ok=True)
    base_vals = {
        name: (
            spark.read.parquet(f"{SRC}/{tbl}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
            + 1
        )
        for name, (tbl, col) in BASES.items()
    }
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied")
    for t, cols in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for i in range(args.copies):
            c = df
            for col, base in cols.items():
                c = c.withColumn(
                    col,
                    (F.col(col) + F.lit(i * base_vals[base])).cast(
                        dict(df.dtypes)[col]
                    ),
                )
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n:,} rows")
    spark.stop()


if __name__ == "__main__":
    main()
