"""Scale up the driver's sf0.1 fixture to a larger SF for perf soaks.

Usage: python tools/gen_sf.py [factor] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1.0)

Replication preserves the schema and join topology: fact/entity keys
shift by ``replica * 10_000_000`` so FKs stay internally consistent
per replica while the key space grows; region/nation are FIXED
dimensions and are copied once (a 10× corpus does not invent new
countries). Documents get a per-replica text prefix so shingle-level
dedup sees near- rather than exact-duplicates across replicas;
embeddings replicate verbatim (planted duplicates at scale are exactly
what ANN/semdedup soaks should face).

The output is for SCALE.md soak runs only — correctness oracles keep
running on the driver's own fixtures.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE = 10_000_000

#: key columns to shift per table (FK topology preserved per replica)
SHIFTS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    out = None
    for i in range(factor):
        rep = df
        for key in SHIFTS[table]:
            rep = rep.withColumn(key, (F.col(key) + F.lit(i * BASE)).cast("long"))
        if table == "documents" and i > 0:
            rep = rep.withColumn("text", F.concat(F.lit(f"r{i} "), F.col("text")))
        if table == "events" and i > 0:
            rep = rep.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i} SECONDS")
            )
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1.0"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("gen_sf")
        .getOrCreate()
    )
    def write_single_file(df: DataFrame, table: str) -> None:
        # the driver fixture stores each table as ONE parquet FILE (not
        # a directory) — streaming readers glob on the file name, so the
        # soak fixture must match that layout
        import glob
        import os
        import shutil

        tmp = f"{out}/_tmp_{table}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        os.makedirs(out, exist_ok=True)
        target = f"{out}/{table}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        elif os.path.exists(target):
            os.remove(target)
        shutil.move(part, target)
        shutil.rmtree(tmp)

    for table in FIXED_DIMS:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        write_single_file(df, table)
        print(f"{table}: copied {df.count()} rows")
    for table, _keys in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        big = replicate(df, table, factor)
        write_single_file(big, table)
        print(f"{table}: {df.count()} -> {big.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
