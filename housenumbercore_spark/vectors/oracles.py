"""DuckDB-oracle SQL mirroring vectors/similarity.py.

Integer-quantized dot products make every comparison order-independent, so
these reproduce the Spark results bit-for-bit (see similarity.py docstring).
"""

from __future__ import annotations

from .similarity import (
    ANN_PLANES,
    ANN_TABLES,
    IVF_CENTROIDS,
    IVF_NPROBE,
    NEARDUP_COS,
    NQ,
    QUANT,
    TOPK,
    plane,
)


def _n_cte() -> str:
    return f"""
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}.0) AS BIGINT)) AS qv
  FROM embeddings),
n AS (
  SELECT vec_id, qv,
         CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS n2
  FROM q)"""


def _cos(a: str, b: str) -> str:
    # zero-norm guard in lockstep with similarity.py _cos: cos := 0.0
    # when either side's quantized norm is 0
    return (
        f"CASE WHEN {a}.n2 = 0 OR {b}.n2 = 0 THEN CAST(0.0 AS DOUBLE) "
        f"ELSE CAST(round(CAST(list_inner_product({a}.qv, {b}.qv) AS DOUBLE) / "
        f"(sqrt(CAST({a}.n2 AS DOUBLE)) * sqrt(CAST({b}.n2 AS DOUBLE))), 6) "
        "AS DOUBLE) END"
    )


def brute_force_topk_sql(nq: int = NQ, k: int = TOPK) -> str:
    return f"""
WITH {_n_cte()},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_cos('a', 'b')} AS cos_sim
  FROM n a JOIN n b ON a.vec_id < {nq} AND b.vec_id <> a.vec_id)
SELECT query_id, neighbor_id, cos_sim, knn_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS knn_rank
  FROM scored) t
WHERE knn_rank <= {k}"""


def _bucket_expr(t: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN CAST(list_inner_product(qv, "
        f"[{', '.join(map(str, plane(t, p)))}]) AS BIGINT) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(ANN_PLANES)
    )
    return f"({bits})"


def _bk_cte() -> str:
    parts = " UNION ALL ".join(
        f"SELECT vec_id, qv, n2, {t} AS tbl, {_bucket_expr(t)} AS bucket FROM n"
        for t in range(ANN_TABLES)
    )
    return f"bk AS ({parts})"


def ann_buckets_sql() -> str:
    return f"""
WITH {_n_cte()},
{_bk_cte()}
SELECT vec_id, tbl, bucket FROM bk"""


def _ann_scored_cte(nq: int) -> str:
    return f"""
cand AS (
  SELECT DISTINCT qq.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bk qq JOIN bk c ON qq.tbl = c.tbl AND qq.bucket = c.bucket
  WHERE qq.vec_id < {nq} AND c.vec_id <> qq.vec_id),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {_cos('a', 'b')} AS cos_sim
  FROM cand
  JOIN n a ON a.vec_id = cand.query_id
  JOIN n b ON b.vec_id = cand.neighbor_id)"""


def ann_topk_sql(nq: int = NQ, k: int = TOPK) -> str:
    return f"""
WITH {_n_cte()},
{_bk_cte()},
{_ann_scored_cte(nq)}
SELECT query_id, neighbor_id, cos_sim, knn_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS knn_rank
  FROM scored) t
WHERE knn_rank <= {k}"""


def ann_recall_sql(nq: int = NQ, k: int = TOPK) -> str:
    return f"""
WITH {_n_cte()},
{_bk_cte()},
{_ann_scored_cte(nq)},
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
        ORDER BY {_cos('a', 'b')} DESC, b.vec_id) AS INT) AS rk
    FROM n a JOIN n b ON a.vec_id < {nq} AND b.vec_id <> a.vec_id) t
  WHERE rk <= {k}),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rk
    FROM scored) t
  WHERE rk <= {k})
SELECT t.query_id, CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matched,
  CAST(round(COUNT(a.neighbor_id) / COUNT(*), 6) AS DOUBLE) AS recall_at_k
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id"""


def _ivf_ctes(n_centroids: int, nq: int, nprobe: int) -> str:
    """Mirror of similarity.py ivf_index/ivf_topk: centroids = vectors with
    vec_id < n_centroids; every corpus vector assigned to its max-cosine
    centroid (ties → lowest centroid id); each query probes its nprobe
    nearest centroids and scores exact cosine within those lists."""
    return f"""
cents AS (SELECT vec_id AS centroid_id, qv, n2 FROM n
          WHERE vec_id < {n_centroids}),
asg AS (
  SELECT vec_id, qv, n2, centroid_id FROM (
    SELECT a.vec_id, a.qv, a.n2, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY a.vec_id
        ORDER BY {_cos('a', 'c')} DESC, c.centroid_id) AS rk
    FROM n a CROSS JOIN cents c) t
  WHERE rk = 1),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT a.vec_id AS query_id, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY a.vec_id
        ORDER BY {_cos('a', 'c')} DESC, c.centroid_id) AS rk
    FROM n a CROSS JOIN cents c WHERE a.vec_id < {nq}) t
  WHERE rk <= {nprobe}),
iscored AS (
  SELECT p.query_id, b.vec_id AS neighbor_id, {_cos('a', 'b')} AS cos_sim
  FROM probes p
  JOIN asg b ON b.centroid_id = p.centroid_id AND b.vec_id <> p.query_id
  JOIN n a ON a.vec_id = p.query_id)"""


def ivf_topk_sql(
    nq: int = NQ,
    k: int = TOPK,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> str:
    return f"""
WITH {_n_cte()},
{_ivf_ctes(n_centroids, nq, nprobe)}
SELECT query_id, neighbor_id, cos_sim, knn_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS knn_rank
  FROM iscored) t
WHERE knn_rank <= {k}"""


def ivf_recall_sql(
    nq: int = NQ,
    k: int = TOPK,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
) -> str:
    return f"""
WITH {_n_cte()},
{_ivf_ctes(n_centroids, nq, nprobe)},
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
        ORDER BY {_cos('a', 'b')} DESC, b.vec_id) AS INT) AS rk
    FROM n a JOIN n b ON a.vec_id < {nq} AND b.vec_id <> a.vec_id) t
  WHERE rk <= {k}),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rk
    FROM iscored) t
  WHERE rk <= {k})
SELECT t.query_id, CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matched,
  CAST(round(COUNT(a.neighbor_id) / COUNT(*), 6) AS DOUBLE) AS recall_at_k
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id"""


def neardup_pairs_sql(threshold: float = NEARDUP_COS) -> str:
    return f"""
WITH {_n_cte()},
{_bk_cte()},
pairs AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM bk l JOIN bk r
    ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT p.vec_a, p.vec_b, {_cos('a', 'b')} AS cos_sim
  FROM pairs p
  JOIN n a ON a.vec_id = p.vec_a
  JOIN n b ON b.vec_id = p.vec_b) t
WHERE cos_sim >= {threshold}"""
