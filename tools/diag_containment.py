"""One-off diagnostic for the doc_containment_pairs second-decade blow-up:
computes, at each SF, the shingle-index statistics that bound the
prefix-filtered join's cost WITHOUT running the join itself —
  * sum(df)        = index size (rows in `sh`)
  * max(df), p99   = posting-list skew
  * sum(df^2)      = the NAIVE shared-shingle join's candidate volume
  * sum(pc * df)   = the PREFIX join's candidate volume (pc = how many
                     docs carry the shingle in their rarest-k prefix)
Usage: python tools/diag_containment.py .scale/sf1 .scale/sf10
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_migration_tool_spark.functions import text as TX
from data_migration_tool_spark.session import get_spark
from data_migration_tool_spark.tables import load_table


def main() -> None:
    spark = get_spark(app_name="dmt-diag-containment")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:]:
        d = load_table(spark, sf_dir, "documents")
        sh = d.select(
            "doc_id",
            F.explode(F.array_distinct(TX.word_shingles("text"))).alias("shingle"),
        )
        df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        stats = df.agg(
            F.sum("df").alias("index_rows"),
            F.max("df").alias("max_df"),
            F.expr("percentile_approx(df, 0.99)").alias("p99_df"),
            F.sum(F.col("df") * F.col("df")).alias("naive_volume"),
            F.count(F.lit(1)).alias("distinct_shingles"),
        ).first()
        ranked = sh.join(df, "shingle").withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
            ),
        )
        n_sh = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        prefix = (
            ranked.join(n_sh, "doc_id")
            .filter(
                F.col("rk") <= F.col("n_sh") - F.expr("(9 * n_sh + 9) div 10") + F.lit(2)
            )
            .select("doc_id", "shingle")
        )
        pc = prefix.groupBy("shingle").agg(F.count(F.lit(1)).alias("pc"))
        pv = (
            pc.join(df, "shingle")
            .agg(F.sum(F.col("pc") * F.col("df")).alias("prefix_volume"))
            .first()
        )
        print(
            json.dumps(
                {
                    "sf": os.path.basename(sf_dir.rstrip("/")),
                    "index_rows": stats["index_rows"],
                    "distinct_shingles": stats["distinct_shingles"],
                    "max_df": stats["max_df"],
                    "p99_df": stats["p99_df"],
                    "naive_volume": stats["naive_volume"],
                    "prefix_volume": pv["prefix_volume"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
