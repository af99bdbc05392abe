"""End-to-end pipelines composing sources + operators.

These are the engine's equivalents of the reference's hard-coded Java main()
pipelines (SURVEY.md §3): each returns a DataFrame so callers (driver
contract, bench, tests) choose the action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .operators import match_eval as ME
from .sources import addresses as A


def official_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Official list keyed + first-wins deduped (HousenumberList.
    addHousenumber:161-173 keeps the FIRST occurrence; determinised here as
    min source_id)."""
    flags = F.broadcast(A.job_flags_df(spark))
    off = A.official_df(spark, sf_dir).join(flags, "job_id")
    off = off.withColumn("hnr_key", ME.match_key("housenumber", "exact"))
    w = W.partitionBy("job_id", "street", "hnr_key").orderBy("source_id")
    return (
        off.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "exact")
    )


def osm_best_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OSM side: tags → priority (through the MapType/hstore path, P1/P2) →
    best object per housenumber identity (W1)."""
    flags = F.broadcast(A.job_flags_df(spark))
    osm = A.osm_df(spark, sf_dir).join(flags, "job_id")
    # assemble the flat columns into an hstore-like MapType and derive the
    # priority from the map — the engine path the reference exercises via
    # planet_*.tags (TheoreticalHousenumbers.java:876-883)
    tags = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("building"), F.lit("entrance"), F.lit("amenity")),
            F.array(F.col("building"), F.col("entrance"), F.col("amenity")),
        ),
        lambda k, v: v.isNotNull(),
    )
    osm = osm.withColumn("tags", tags).withColumn(
        "prio", ME.osm_tag_priority("tags")
    )
    osm = osm.withColumn("hnr_key", ME.match_key("housenumber", "exact")).drop("exact")
    return ME.best_osm_object(osm)


def evaluation_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The match evaluation (J5/J6): one row per housenumber identity."""
    off = official_normalized(spark, sf_dir).select(
        "job_id", "street", "hnr_key", "source_id"
    )
    osm = osm_best_objects(spark, sf_dir).select(
        "job_id", "street", "hnr_key", "osm_id", "prio"
    )
    return ME.match_evaluation(off, osm).select(
        "job_id", "street", "hnr_key", "treffertyp", "source_id", "osm_id", "prio"
    )


def evaluation_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ME.evaluation_counters(evaluation_matched(spark, sf_dir))


def street_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 parity: whitelist → blacklist → street-in-polygon → name
    grouping → official-street augmentation."""
    from .operators import street_catalog as SC
    from .sources import streets as ST
    from .sources import synthetic as S

    segs = ST.street_segments_df(spark, sf_dir)
    segs = SC.apply_whitelist(segs)
    blacklist = segs.filter(F.col("osm_id") % 97 == 0)
    segs = SC.apply_blacklist(segs, blacklist)
    munis = S.areas_df(spark, sf_dir).filter(F.col("admin_level") == 8)
    assigned = SC.streets_in_areas(spark, segs, munis)
    catalog = SC.group_street_names(assigned)
    official_streets = (
        A.official_df(spark, sf_dir)
        .select((F.col("job_id") + 100).alias("area_id"), F.col("street").alias("name"))
        .dropDuplicates(["area_id", "name"])
    )
    return SC.augment_official_streets(catalog, official_streets)


def street_merged_geometries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 linemerge per street (engine-only: WKT output, no SQL oracle)."""
    from .operators import street_catalog as SC
    from .sources import streets as ST
    from .sources import synthetic as S

    segs = SC.apply_whitelist(ST.street_segments_df(spark, sf_dir))
    munis = S.areas_df(spark, sf_dir).filter(F.col("admin_level") == 8)
    assigned = SC.streets_in_areas(spark, segs, munis)
    return SC.merge_street_geometries(assigned)


def documents_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import analysis as TA

    return TA.token_stats(documents_df(spark, sf_dir))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import analysis as TA

    return TA.quality_score(documents_df(spark, sf_dir))


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import analysis as TA

    return TA.lang_id(documents_df(spark, sf_dir))


def text_lang_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import analysis as TA

    return TA.lang_id_accuracy(documents_df(spark, sf_dir))


def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import analysis as TA

    return TA.fingerprints(documents_df(spark, sf_dir))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.exact_dedup(documents_df(spark, sf_dir))


def dedup_minhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.minhash_bands(TD.minhash_signatures(documents_df(spark, sf_dir)))


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.minhash_dedup_pairs(documents_df(spark, sf_dir))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.simhash(documents_df(spark, sf_dir))


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.simhash_pairs(documents_df(spark, sf_dir))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import dedup as TD

    return TD.ngram_jaccard_pairs(documents_df(spark, sf_dir))


def sim_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import similarity as VS

    return VS.brute_force_topk(embeddings_df(spark, sf_dir))


def sim_ann_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import similarity as VS

    return VS.ann_buckets(embeddings_df(spark, sf_dir)).select(
        "vec_id", "tbl", "bucket"
    )


def sim_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import similarity as VS

    return VS.ann_topk(embeddings_df(spark, sf_dir))


def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import similarity as VS

    return VS.ann_recall(embeddings_df(spark, sf_dir))


def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .vectors import similarity as VS

    return VS.neardup_pairs(embeddings_df(spark, sf_dir))


KNN_RES = 8  # ring-1 at res 8 covers the whole synthetic world → exact kNN


def knn_nearest_street(spark: SparkSession, sf_dir: str, k: int = 1) -> DataFrame:
    """J10: nearest street per point via k-ring candidate expansion."""
    from .operators import knn as KN
    from .sources import streets as ST
    from .sources import synthetic as S

    pts = S.points_df(spark, sf_dir).select("point_id", "lon", "lat")
    targets = ST.street_points_df(spark, sf_dir)
    out = KN.knn_nearest(pts, targets, res=KNN_RES, k_ring=1, n_neighbors=k)
    return out.select("point_id", "street_key", "name", "knn_rank")
