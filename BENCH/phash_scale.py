"""Scale evidence for the image-payload near-dup family: phash banded LSH
over synthetic 64-bit hashes at volume (no image decode — this measures the
JOIN SHAPE, which is what survives a 100x scale-up; the decode cost lives
in the codec benchmarks).

Input: n base rows with pseudo-random phashes (xxhash64 of the id — worst
case for LSH: uniform buckets, no structure), plus a planted near-dup for
every PLANT_EVERY-th id with exactly 3 bits flipped. With 4 x 16-bit bands,
3 flipped bits always leave >= 1 band untouched, so recall on the planted
pairs must be EXACTLY 1.0 — a correctness invariant checked at volume, not
just sf0.001.

Prints one JSON line: rows/sec through the pair generator, planted-pair
recall, and the candidate-join fan-out actually materialized.

Env: SPARK_GRAFT_CPUS (default 32), PHASH_SCALE_N (default 1_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANT_EVERY = 100
FLIP = (1 << 3) | (1 << 21) | (1 << 47)  # 3 bits, 3 distinct bands


def main() -> None:
    n = int(os.environ.get("PHASH_SCALE_N", "1000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from housenumbercore_spark.images.dedup import phash_neardup_pairs
    from housenumbercore_spark.session import get_spark

    spark = get_spark(app_name=f"phash-scale-{cpus}", cores=None)
    base = spark.range(0, n).select(
        F.concat(F.lit("i"), F.lpad(F.col("id").cast("string"), 9, "0")).alias(
            "image_id"
        ),
        F.xxhash64(F.col("id")).alias("phash"),
    )
    planted = (
        spark.range(0, n, PLANT_EVERY)
        .select(
            F.concat(
                F.lit("p"), F.lpad(F.col("id").cast("string"), 9, "0")
            ).alias("image_id"),
            F.xxhash64(F.col("id")).alias("ph0"),
        )
        .select(
            "image_id",
            F.expr(f"ph0 ^ {FLIP}L").alias("phash"),
        )
    )
    df = base.unionByName(planted).localCheckpoint(eager=True)  # time the join, not range()
    n_rows = df.count()

    t0 = time.time()
    pairs = phash_neardup_pairs(df, max_hamming=10).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    dt = time.time() - t0

    n_planted = (n + PLANT_EVERY - 1) // PLANT_EVERY
    found_planted = pairs.filter(
        (F.substring("img_a", 2, 9) == F.substring("img_b", 2, 9))
        & (F.substring("img_a", 1, 1) != F.substring("img_b", 1, 1))
    ).count()
    print(
        json.dumps(
            {
                "metric": "phash_neardup_pairs throughput (input rows/sec)",
                "value": round(n_rows / dt, 1),
                "unit": "rows/sec",
                "n_rows": n_rows,
                "n_pairs": n_pairs,
                "seconds": round(dt, 3),
                "planted": n_planted,
                "planted_found": found_planted,
                "planted_recall": round(found_planted / n_planted, 4),
                "cpus": cpus,
            }
        )
    )
    assert found_planted == n_planted, "planted 3-bit near-dups must all be found"
    spark.stop()


if __name__ == "__main__":
    main()
