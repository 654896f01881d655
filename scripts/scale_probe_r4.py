"""Round-4 scaling probe (SURVEY §10): bloom-prefilter selectivity and
10x-data wall-clock ratios for the round-4 operators.

Two measurements, printed as the lines recorded in SCALE.md
"Round-4 measurements":

1. Bloom selectivity at sf0.1 — probe rows passing the 2^19-bit
   prefilter vs true join matches (the fp rate should sit near the
   (1 - e^(-kn/m))^k theory value, ~1.2% at ~17 bits/key).
2. Wall-clock ratio sf0.01 -> sf0.1 (10x rows) for each round-4 key,
   best of 3 noop-sink runs — ratios far below 10x mean the operator is
   still fixed-overhead-bound at fixture scale.

Run: python scripts/scale_probe_r4.py   (~3 min at local[8])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flexcalc_spark import registry  # noqa: E402

R4_KEYS = [
    "q_time_rollup", "q_sketch_hll", "q_cdc_upsert", "q_join_bloom",
    "q_bm25", "q_quality_entropy", "q_anomaly_zscore", "q_embed_project",
    "q_funnel", "q_retention", "q_cooccur", "q_concurrency",
    "q_table_checksum", "q_histogram_equidepth", "q_grouped_sample",
]


def bloom_selectivity(spark: SparkSession, sf_dir: str) -> None:
    from flexcalc_spark.operators.joins import BLOOM_BITS, BLOOM_HASHES

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = o.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.lit(h), F.col("o_orderkey")),
                        F.lit(BLOOM_BITS),
                    )
                    for h in range(BLOOM_HASHES)
                ]
            )
        ).alias("pos")
    )
    bloom = (
        pos.select(
            F.expr("pos div 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )
    probe = l
    for h in range(BLOOM_HASHES):
        p = f"pmod(xxhash64({h}, l_orderkey), {BLOOM_BITS})"
        probe = (
            probe.withColumn(f"w{h}", F.expr(f"({p}) div 64"))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word").alias(f"bw{h}"),
                        F.col("mask").alias(f"bm{h}"),
                    )
                ),
                F.col(f"w{h}") == F.col(f"bw{h}"),
                "inner",
            )
            .filter(F.expr(f"((bm{h} >> CAST(({p}) % 64 AS INT)) & 1) = 1"))
            .drop(f"w{h}", f"bw{h}", f"bm{h}")
        )
    total = l.count()
    passed = probe.count()
    true = l.join(
        o.select("o_orderkey"),
        l.l_orderkey == o.o_orderkey,
        "left_semi",
    ).count()
    fp = (passed - true) / max(total - true, 1)
    print(
        f"PROBE bloom {os.path.basename(sf_dir)}: probe_rows={total} "
        f"build_keys={o.count()} pass_prefilter={passed} "
        f"true_matches={true} fp_rate={fp:.4f}"
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    bloom_selectivity(spark, "/root/testdata/sf0.1")
    for key in R4_KEYS:
        ts = {}
        for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
            best = None
            for _ in range(3):
                spark.catalog.clearCache()
                df = registry.QUERIES[key](spark, sf)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            ts[os.path.basename(sf)] = best
        print(
            f"PROBE scale {key}: sf0.01={ts['sf0.01']:.3f}s "
            f"sf0.1={ts['sf0.1']:.3f}s "
            f"ratio={ts['sf0.1'] / ts['sf0.01']:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
