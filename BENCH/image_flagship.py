"""Image-table flagship: the north-rule metric measured literally.

BASELINE.json's metric is spatial-join + tile-assignment throughput *over
the image+caption table*, with every image row preserving the decoded-pixel
/ caption invariant. BENCH/scaling.py measures the join kernel on the
narrow point table; THIS bench runs the full north-star pipeline shape on
rows that carry the real binary payload:

  images (bytes, caption, phash, lon, lat)
    → replicate ×REP (fresh image_id, jittered lon — byte payloads reused)
    → cell-cover broadcast join + pure-JVM exact refine (admin areas)
    → tile assignment (codegen)
    → invariant gate: join back to the source on image_id; byte-equal
      payloads verify INSIDE the JVM (images/udfs.check_invariants fast
      path), so the gate costs a broadcast hash join, not a decode
    → noop sink

Run at two parallelism levels in fresh subprocesses (north-rule N vs 4N
proxy), best-of-3 each:
  python BENCH/image_flagship.py          # appends BENCH/BASELINE_extra.md
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_IMAGES = int(os.environ.get("SPARK_GRAFT_IMGFLAG_N", "20000"))
REP = int(os.environ.get("SPARK_GRAFT_IMGFLAG_REP", "256"))
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_IMGFLAG_LEVELS", "2,8,32").split(",")
)
TILE_RES = 13


def run_level(cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from housenumbercore_spark.operators import pip_join as PJ
    from housenumbercore_spark.session import get_spark
    from housenumbercore_spark.sources import images as IMG
    from housenumbercore_spark.sources import synthetic as S

    spark = get_spark(app_name=f"imgflag-{cpus}")
    # decouple fact parallelism from the source file count (the
    # replicate-join is map-side, so it inherits input partitioning;
    # 8 parquet files would cap local[32] at 8 busy threads)
    imgs = IMG.images_table(spark, N_IMAGES).repartition(cpus * 2)
    rep = spark.range(REP).select(F.col("id").alias("r"))
    big = imgs.crossJoin(F.broadcast(rep)).select(
        F.concat("image_id", F.lit("#"), F.col("r").cast("string")).alias(
            "image_id"
        ),
        "bytes", "w", "h", "fmt", "caption", "phash",
        (F.col("lon") + (F.col("r") - REP / 2) * 1e-7).alias("lon"),
        "lat",
    )
    areas = S.areas_df(spark, SF_DIR)
    assigned = PJ.tile_assign(
        PJ.assign_points_to_areas(spark, big, areas), TILE_RES
    )
    # invariant gate against the DIMENSION-sized source table via broadcast:
    # replicas share payloads, so the 20k-image source (≈20 MB) broadcasts
    # and the byte/caption equality check runs inside the JVM with ZERO
    # shuffle of fact-side bytes. (First attempt joined the replicated fact
    # to itself on image_id — a payload sort-merge shuffle that is disk-
    # bound and measured NEGATIVE thread scaling: 5.2 s at local[8] but
    # 10.1 s at local[32]. Broadcast-against-source is the shape that
    # survives scale-up; kept here as the measured design rationale.)
    src = imgs.select(
        F.col("image_id").alias("__bid"),
        F.col("bytes").alias("__sb"),
        F.col("caption").alias("__sc"),
    )
    gated = (
        assigned.withColumn(
            "__bid", F.substring_index("image_id", "#", 1)
        )
        .join(F.broadcast(src), "__bid")
        .filter(
            (F.col("bytes") == F.col("__sb"))
            & F.col("caption").eqNullSafe(F.col("__sc"))
        )
        .drop("__bid", "__sb", "__sc")
    )
    n_rows = gated.count()  # warm-up + row count (must equal assigned rows)
    n_assigned = assigned.count()
    assert n_rows == n_assigned, (n_rows, n_assigned)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        gated.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return {
        "cpus": cpus,
        "rows": n_rows,
        "images": N_IMAGES * REP,
        "seconds": round(best, 3),
        "rows_per_sec": round(n_rows / best, 1),
    }


def main() -> None:
    import subprocess

    # three interleaved rounds per level, keep each level's best — the host's
    # noisy neighbors stall single draws by 10-20x (same methodology as
    # BENCH/scaling.py)
    best: dict[int, dict] = {}
    for _round in range(3):
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
                capture_output=True, text=True, cwd=REPO_ROOT, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if cpus not in best or r["seconds"] < best[cpus]["seconds"]:
                best[cpus] = r
    results = [best[c] for c in LEVELS]
    pairs = {}
    for lo, hi in zip(results, results[1:]):
        factor = hi["cpus"] / lo["cpus"]
        pairs[f"{lo['cpus']}->{hi['cpus']}"] = round(
            hi["rows_per_sec"] / (factor * lo["rows_per_sec"]), 3
        )
    summary = {
        "metric": "image-table-flagship",
        "levels": results,
        "efficiency_pairs": pairs,
    }
    print(json.dumps(summary))
    md = (
        "\n## Image-table flagship (north-rule metric shape: %s image rows "
        "with real byte payloads)\n\n"
        "Spatial join + tile assignment + JVM byte-equal invariant gate over "
        "the replicated image+caption table (every output row passed the "
        "pixels/caption gate — asserted in-run). Best-of-3, fresh JVM per "
        "level:\n\n| parallelism | wall s | rows/sec |\n|---|---|---|\n"
        % f"{results[0]['images']:,}"
    )
    for r in results:
        md += f"| local[{r['cpus']}] | {r['seconds']} | {r['rows_per_sec']:,} |\n"
    md += (
        f"\nEfficiency pairs: **{pairs}**. The 1 KB payload rides every fact\n"
        "row, so this job is memory-bandwidth-heavier than the narrow-row\n"
        "points flagship; the 2→8 pair is the meaningful N-vs-4N evidence\n"
        "(same hardware-ceiling caveat as the scaling section: this VM's\n"
        "raw-CPU efficiency caps near 0.71 on 8→32).\n"
    )
    extra = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_extra.md")
    with open(extra, "a") as f:
        f.write(md)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        print(json.dumps(run_level(int(sys.argv[2]))))
    else:
        main()
