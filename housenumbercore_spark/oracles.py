"""DuckDB-oracle SQL builders mirroring the engine pipelines.

Every string here is ANSI SQL over the driver's pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings) and must produce the same columns/values as the matching
pipeline in pipelines.py — the driver's correctness gate compares them
hash-for-hash at sf=0.01.
"""

from __future__ import annotations

from .geo.distance import distance_m_sql
from .operators.match_eval import tag_priority_sql
from .sources.addresses import job_flags_sql, official_sql, osm_sql
from .sources.streets import HIGHWAY_WHITELIST, street_points_sql, street_segments_sql
from .sources.synthetic import areas_sql, points_sql


def _eval_ctes() -> str:
    return f"""
WITH offk AS (
  SELECT o.job_id, o.street, o.source_id,
         CASE WHEN f.exact THEN o.housenumber ELSE lower(o.housenumber) END AS hnr_key
  FROM {official_sql()} o JOIN {job_flags_sql()} f ON o.job_id = f.job_id
),
offd AS (
  SELECT job_id, street, hnr_key, source_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY job_id, street, hnr_key ORDER BY source_id) AS rn
    FROM offk) t WHERE rn = 1
),
osmk AS (
  SELECT o.job_id, o.street, o.osm_id,
         CASE WHEN f.exact THEN o.housenumber ELSE lower(o.housenumber) END AS hnr_key,
         {tag_priority_sql('o.building', 'o.entrance', 'o.amenity')} AS prio
  FROM {osm_sql()} o JOIN {job_flags_sql()} f ON o.job_id = f.job_id
),
osmb AS (
  SELECT job_id, street, hnr_key, osm_id, prio FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY job_id, street, hnr_key ORDER BY prio, osm_id) AS rn
    FROM osmk) t WHERE rn = 1
),
matched AS (
  SELECT COALESCE(a.job_id, b.job_id) AS job_id,
         COALESCE(a.street, b.street) AS street,
         COALESCE(a.hnr_key, b.hnr_key) AS hnr_key,
         CASE WHEN a.source_id IS NOT NULL AND b.osm_id IS NOT NULL THEN 'i'
              WHEN a.source_id IS NOT NULL THEN 'l' ELSE 'o' END AS treffertyp,
         a.source_id, b.osm_id, b.prio
  FROM offd a FULL OUTER JOIN osmb b
    ON a.job_id = b.job_id AND a.street = b.street AND a.hnr_key = b.hnr_key
)"""


def official_dedup_sql() -> str:
    return (
        _eval_ctes()
        + "\nSELECT job_id, street, hnr_key, source_id FROM offd"
    )


def best_osm_sql() -> str:
    return (
        _eval_ctes()
        + "\nSELECT job_id, street, hnr_key, osm_id, prio FROM osmb"
    )


def matched_sql() -> str:
    return (
        _eval_ctes()
        + "\nSELECT job_id, street, hnr_key, treffertyp, source_id, osm_id, prio"
        " FROM matched"
    )


def counters_sql() -> str:
    return (
        _eval_ctes()
        + """
SELECT job_id,
       CAST(SUM(CASE WHEN treffertyp IN ('i','l') THEN 1 ELSE 0 END) AS BIGINT) AS number_target,
       CAST(SUM(CASE WHEN treffertyp = 'i' THEN 1 ELSE 0 END) AS BIGINT) AS number_identical,
       CAST(SUM(CASE WHEN treffertyp = 'o' THEN 1 ELSE 0 END) AS BIGINT) AS number_osmonly
FROM matched GROUP BY job_id"""
    )


def street_catalog_sql() -> str:
    wl = ", ".join(f"'{h}'" for h in HIGHWAY_WHITELIST)
    return f"""
WITH segs AS (
  SELECT * FROM {street_segments_sql()} t
  WHERE highway IN ({wl}) AND osm_id % 97 <> 0
),
areas AS (SELECT * FROM {areas_sql()} a WHERE admin_level = 8),
asg AS (
  SELECT s.osm_id, s.name, a.area_id FROM segs s JOIN areas a
    ON s.y0 >= a.ymin AND s.y0 <= a.ymax AND s.x1 >= a.xmin AND s.x0 <= a.xmax
),
cat AS (
  SELECT area_id, name, COUNT(*) AS n_segments,
         string_agg(CAST(osm_id AS VARCHAR), ',' ORDER BY osm_id) AS osm_ids
  FROM asg GROUP BY area_id, name
),
official AS (
  SELECT DISTINCT job_id + 100 AS area_id, street AS name FROM {official_sql()} o
)
SELECT area_id, name, n_segments, osm_ids, 'osm' AS source FROM cat
UNION ALL
SELECT o.area_id, o.name, CAST(0 AS BIGINT) AS n_segments, '' AS osm_ids,
       'official_only' AS source
FROM official o
WHERE NOT EXISTS (
  SELECT 1 FROM cat c WHERE c.area_id = o.area_id AND c.name = o.name)"""


def knn_nearest_street_sql(k: int = 1) -> str:
    dist = distance_m_sql("p.lon", "p.lat", "t.slon", "t.slat")
    return f"""
SELECT point_id, street_key, name, knn_rank FROM (
  SELECT p.point_id, t.street_key, t.name,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p.point_id ORDER BY {dist}, t.street_key) AS INT) AS knn_rank
  FROM {points_sql()} p CROSS JOIN {street_points_sql()} t
) r WHERE knn_rank <= {k}"""
