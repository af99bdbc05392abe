"""End-to-end training-corpus preparation: the composition a user of the
engine actually runs before training — quality gate → language filter →
exact dedup → MinHash near-dup keep-one — as one declarative pipeline.

Every stage is one of the engine's individually-oracled operators
(text/analysis.py, text/dedup.py); this module only wires them, so the
whole pipeline stays set-based: narrow filters, equi-joins on doc_id, and
the cluster propagation loop. No new shuffle shapes are introduced beyond
what the stage operators already measured at scale.

The reference has no corpus surface (it is a house-number evaluator);
this extends the engine per the graft brief's training-data-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.55,
    languages: list[str] | None = None,
    jaccard_threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """→ (kept_docs, report).

    ``kept_docs``: the input rows that survive all four gates, with
    ``quality`` and ``pred_lang`` columns attached. ``report``: one row
    per stage — (stage, n_in, n_out) — for pipeline observability (its
    evaluation triggers the stage counts; keep it lazy if you only need
    the kept rows).

    Stages:

    1. quality ≥ ``min_quality`` (composite score, text/analysis.py);
    2. predicted language ∈ ``languages`` (skipped when None);
    3. exact dedup — keep the canonical (min doc_id) of each normalized
       content group;
    4. near-dup keep-one — MinHash LSH pairs at ``jaccard_threshold``,
       connected components, keep cluster canonicals.
    """
    from . import analysis as TA
    from . import dedup as TD

    q = TA.quality_score(docs).select("doc_id", "quality")
    l = TA.lang_id(docs).select("doc_id", "pred_lang")
    enriched = docs.join(q, "doc_id").join(l, "doc_id")

    s1 = enriched.filter(F.col("quality") >= min_quality)
    s2 = s1.filter(F.col("pred_lang").isin(languages)) if languages else s1

    ex = TD.exact_dedup(s2.select("doc_id", "text"))
    s3 = s2.join(
        ex.filter(F.col("doc_id") == F.col("canonical_doc_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    pairs = TD.minhash_dedup_pairs(s3.select("doc_id", "text")).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    clusters = TD.dedup_clusters(
        s3.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    kept = s3.join(
        clusters.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )

    stages = [
        ("input", docs, enriched),
        ("quality_gate", enriched, s1),
        ("language_filter", s1, s2),
        ("exact_dedup", s2, s3),
        ("neardup_keep_one", s3, kept),
    ]
    report = None
    for name, a, b in stages:
        r = (
            a.agg(F.count(F.lit(1)).alias("n_in"))
            .crossJoin(b.agg(F.count(F.lit(1)).alias("n_out")))
            .select(F.lit(name).alias("stage"), "n_in", "n_out")
        )
        report = r if report is None else report.unionByName(r)
    return kept, report
