"""Synthesize a larger SF directory from a driver-provided one, for bench
evidence at sf1 (r3 verdict item 8: the sf0.1 headline under-reports the
engine; no external data is allowed, so scale deterministically).

Each table is replicated `m` times with key shifts that preserve every
join relationship (orderkey shifts apply to orders AND lineitem; custkey
to customer AND orders; part/supp likewise). Dimension tables (region,
nation) keep one copy. Document text gets a per-copy suffix so the corpus
gains realistic near-duplicate classes instead of collapsing under exact
dedup; embeddings replicate unchanged (ANN queries probe vec_id < 5 —
copy 0 only).

Usage: python scripts/make_sfx.py SRC_DIR DST_DIR [m]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from airbyte_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    dfs = {t: spark.read.parquet(f"{src}/{t}.parquet") for t in TABLES}

    def span(t, c):  # shift unit that keeps copies disjoint
        return int(dfs[t].agg(F.max(c)).first()[0]) + 1

    shifts = {
        "customer": {"c_custkey": span("customer", "c_custkey")},
        "supplier": {"s_suppkey": span("supplier", "s_suppkey")},
        "part": {"p_partkey": span("part", "p_partkey")},
        "orders": {
            "o_orderkey": span("orders", "o_orderkey"),
            "o_custkey": span("customer", "c_custkey"),
        },
        "lineitem": {
            "l_orderkey": span("orders", "o_orderkey"),
            "l_partkey": span("part", "p_partkey"),
            "l_suppkey": span("supplier", "s_suppkey"),
        },
        "events": {
            "event_id": span("events", "event_id"),
            "user_id": span("events", "user_id"),
        },
        "documents": {"doc_id": span("documents", "doc_id")},
        "embeddings": {"vec_id": span("embeddings", "vec_id")},
    }
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        df = dfs[t]
        if t in ("region", "nation"):
            out = df
        else:
            copies = []
            for i in range(m):
                c = df
                for col, unit in shifts[t].items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * unit))
                if t == "documents" and i > 0:
                    c = c.withColumn(
                        "text", F.concat(F.col("text"), F.lit(f" c{i}"))
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{dst}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
