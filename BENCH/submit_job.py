"""Cluster-deployment entrypoint: run the flagship pipeline via
``spark-submit --py-files`` (north rule: the job must ship as a zipped
package to multi-executor clusters; see BENCH/submit_demo.sh).

The SparkSession comes from spark-submit's conf — no master hardcoded —
so the identical invocation works on YARN/K8s/standalone by changing only
``--master`` and executor counts.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("housenumbercore-flagship").getOrCreate()

    from housenumbercore_spark.operators import pip_join as PJ
    from housenumbercore_spark.sources import synthetic as S

    t0 = time.perf_counter()
    pts = S.points_df(spark, sf_dir)
    areas = S.areas_df(spark, sf_dir)
    assigned = PJ.tile_assign(PJ.assign_points_to_areas(spark, pts, areas), 13)
    n = assigned.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "job": "flagship-pip-tile",
                "rows": n,
                "sec": round(wall, 3),
                "rows_per_sec": round(n / wall, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
