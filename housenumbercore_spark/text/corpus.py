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

from ..pinning import pin


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.55,
    languages: list[str] | None = None,
    jaccard_threshold: float = 0.5,
    keep_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """→ (kept_docs, report).

    Input contract: ``docs`` must carry ``doc_id``, ``text`` and a
    ``lang`` label column (lang_id projects it as its accuracy label).
    ``kept_docs`` schema: exactly ``(doc_id, text, quality, pred_lang,
    *keep_cols)`` — any other input column is DROPPED unless named in
    ``keep_cols``, which threads it through the narrow enrichment
    projections (no extra join). ``report``: one row per stage —
    (stage, n_in, n_out) — for pipeline observability.

    Stages:

    1. quality ≥ ``min_quality`` (composite score, text/analysis.py);
    2. predicted language ∈ ``languages`` (skipped when None);
    3. exact dedup — keep the canonical (min doc_id) of each normalized
       content group;
    4. near-dup keep-one — MinHash LSH pairs at ``jaccard_threshold``,
       connected components, keep cluster canonicals.

    Execution shape of the eager report: the first three stage counts
    come from ONE aggregate pass over the enrichment lineage (input /
    quality-gate / language-filter are conditional counts of the same
    narrow map), and the two expensive boundaries (post-exact-dedup
    ``s3``, final ``kept``) are pinned (pinning.py) BEFORE counting —
    so the MinHash pair generation + cluster propagation execute exactly
    once per run, and the returned ``kept_docs`` is a materialized scan
    the caller can reuse without re-running any stage."""
    from . import analysis as TA
    from . import dedup as TD

    # Column.isin unpacks a LIST but treats a TUPLE as one (unsupported)
    # array literal — normalize so callers can pass any iterable
    # None = no language filter; an EMPTY list means "keep zero
    # languages" and must filter everything, not silently disable the
    # gate (a falsy check conflated the two)
    languages = list(languages) if languages is not None else None

    # one narrow pass attaches both scores (keep_cols pass-through) —
    # joining projections of docs back to docs would shuffle the full
    # text twice for what is a map-only computation. keep_cols is deduped
    # against the columns the stages project anyway ('lang'/'text' are the
    # natural requests) and names that collide with enrichment OUTPUT
    # columns are rejected up front — blindly appending them would select
    # the same name twice and fail later with AMBIGUOUS_REFERENCE.
    keep_cols = tuple(dict.fromkeys(keep_cols))  # stable de-dup
    reserved = {
        "doc_id", "n_chars", "n_tokens", "stopword_ratio",
        "mean_token_len", "quality", "pred_lang", "lang_score",
        "label_lang",
    }
    bad = [c for c in keep_cols if c in reserved]
    if bad:
        raise ValueError(
            f"keep_cols {bad} collide with enrichment output columns; "
            "they are recomputed by prepare_corpus and cannot be threaded "
            "through by name"
        )
    q = TA.quality_score(
        docs, keep_cols=tuple(dict.fromkeys(("text", "lang") + keep_cols))
    )
    enriched = TA.lang_id(
        q, keep_cols=tuple(dict.fromkeys(("text", "quality") + keep_cols))
    ).select(
        "doc_id", "text", "quality", "pred_lang",
        *[c for c in keep_cols if c != "text"],
    )

    pass_q = F.col("quality") >= min_quality
    # None disables the gate; [] keeps zero languages (isin([]) is
    # all-false) — same None-vs-empty distinction as the normalization
    # above
    pass_lang = (
        pass_q & F.col("pred_lang").isin(languages)
        if languages is not None
        else pass_q
    )
    # stage counts 0-2 in a single job over the enrichment map (the
    # per-stage .count() chain re-ran the same lineage four times)
    n0, n1, n2 = enriched.agg(
        F.count(F.lit(1)),
        F.count(F.when(pass_q, 1)),
        F.count(F.when(pass_lang, 1)),
    ).first()

    s2 = enriched.filter(pass_lang)
    ex = TD.exact_dedup(s2.select("doc_id", "text"))
    s3 = s2.join(
        ex.filter(F.col("doc_id") == F.col("canonical_doc_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    s3 = pin(s3)  # feeds pair-gen AND kept AND the count: run once
    n3 = s3.count()

    pairs = TD.minhash_dedup_pairs(s3.select("doc_id", "text")).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    clusters = TD.dedup_clusters(
        s3.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    kept = pin(
        s3.join(
            clusters.filter("is_canonical").select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )  # counted here and materialized by the caller
    n4 = kept.count()

    report = docs.sparkSession.createDataFrame(
        [
            ("input", n0, n0),
            ("quality_gate", n0, n1),
            ("language_filter", n1, n2),
            ("exact_dedup", n2, n3),
            ("neardup_keep_one", n3, n4),
        ],
        "stage string, n_in long, n_out long",
    )
    return kept, report


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic down-sampling to ≈ ``budget_tokens`` total tokens —
    the data-mixing step of a pretraining pipeline. With ``by`` set (e.g.
    a language or source column), the budget is split EQUALLY across the
    groups present, capped at each group's own size.

    Mechanism: per-group token totals (one narrow aggregate) give a keep
    fraction; each document is kept iff a 60-bit hash of its id falls
    under fraction × 2⁶⁰ — no ordering, no sampling RNG, no shuffle of
    document payloads, and the SAME documents are kept on every run and
    every partitioning. Expected kept tokens per group =
    fraction × group_tokens; deviation is one document's tokens in the
    worst case per hash-boundary, negligible at corpus scale.

    Output contract: the input columns plus ``n_tokens`` (whitespace
    token count of ``text``). ``n_tokens`` is RECOMPUTED here — a
    pre-existing ``n_tokens`` column on the input is replaced, so the
    budget arithmetic and the emitted counts always agree."""
    from .analysis import n_tokens_col
    from .hashing import h60_spark

    # token counts as an inline column — a token_stats join here would
    # self-join the corpus on doc_id and shuffle the full text
    d = docs.withColumn("n_tokens", n_tokens_col())
    # NULL group values coalesce to a sentinel: a plain equi-join on the
    # group key would silently drop every NULL-group document while its
    # reserved budget share went unspent
    grp = (
        F.coalesce(F.col(by).cast("string"), F.lit("__null__"))
        if by
        else F.lit("__all__")
    )
    d = d.withColumn("__grp", grp)
    # pin: totals is n_groups rows, but its lineage tokenizes the whole
    # corpus — without the pin, the count here AND the broadcast join
    # below each re-run that scan
    totals = pin(
        d.groupBy("__grp").agg(F.sum("n_tokens").alias("__grp_tokens"))
    )
    n_groups = totals.count()
    per_group = budget_tokens / max(n_groups, 1)
    # a group whose docs are all zero-token (empty/whitespace/NULL text)
    # has __grp_tokens = 0: keeping everything costs nothing, and the
    # plain division would throw DIVIDE_BY_ZERO under Spark 4's default
    # ANSI mode (oracle SQL carries the same guard in lockstep)
    frac = F.when(F.col("__grp_tokens") == 0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), F.lit(per_group) / F.col("__grp_tokens"))
    )
    keyed = d.join(F.broadcast(totals), "__grp").withColumn(
        "__h", F.expr(h60_spark(f"cast({id_col} as string)"))
    )
    kept = keyed.filter(
        F.col("__h").cast("double") < frac * float(1 << 60)
    )
    return kept.drop("__grp", "__grp_tokens", "__h")


CONTAM_SHINGLE = 8


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = CONTAM_SHINGLE,
    min_common: int = 1,
) -> DataFrame:
    """Benchmark-contamination scan: which corpus documents share word
    ``k``-grams with an evaluation set → (doc_id, bench_id,
    n_common_shingles, doc_overlap_ratio).

    The standard pretraining hygiene step (decontaminate the corpus
    against eval benchmarks before training). Shape: both sides reduce to
    distinct shingle HASHES; the benchmark side (eval sets are small)
    broadcasts, so the scan is one map-side equi-join over the corpus'
    exploded int64 hashes — no corpus-side shuffle, no text movement.
    ``doc_overlap_ratio`` = shared distinct shingles / the DOCUMENT's
    distinct shingles (1.0 ⇒ the doc is fully contained in the benchmark
    at this shingle size). Exact-match semantics on normalized tokens;
    k=8 matches common published decontamination practice."""
    from . import dedup as TD

    d = TD.with_shingle_hashes(docs, k).select(
        "doc_id", F.size("sh31").alias("__n_doc"), F.explode("sh31").alias("h")
    )
    # project to exactly (doc_id, text) up front: a rename alone would
    # produce TWO doc_id columns (AMBIGUOUS_REFERENCE downstream) when the
    # benchmark frame carries both bench_id and a leftover doc_id (natural
    # for eval sets cut from the corpus)
    bench = (
        benchmark.select(F.col("bench_id").alias("doc_id"), "text")
        if "bench_id" in benchmark.columns
        else benchmark.select("doc_id", "text")
    )
    b = (
        TD.with_shingle_hashes(bench, k)
        .select(F.col("doc_id").alias("bench_id"), F.explode("sh31").alias("h"))
        .dropDuplicates()
    )
    hits = (
        d.join(F.broadcast(b), "h")
        .groupBy("doc_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_common_shingles"),
            F.first("__n_doc").alias("__n_doc"),
        )
        .filter(F.col("n_common_shingles") >= min_common)
    )
    return hits.select(
        "doc_id",
        "bench_id",
        "n_common_shingles",
        F.round(F.col("n_common_shingles") / F.col("__n_doc"), 6).alias(
            "doc_overlap_ratio"
        ),
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing for training batches: → (doc_id, n_tokens,
    pack_id, pack_slot). Every pack built from in-budget documents has a
    token sum ≤ ``max_tokens``; a document longer than the budget becomes
    a singleton pack carrying its FULL (untruncated) ``n_tokens`` and is
    flagged by pack_slot = -1 — the caller decides whether to split,
    truncate, or drop it (this function never alters token counts, so
    the flag is the ONLY budget-violation signal).

    Shape: documents hash into ``n_buckets`` independent buckets
    (narrow (bucket, id, n_tokens) shuffle — text itself never moves);
    each bucket packs its docs with first-fit-decreasing inside one
    ``applyInPandas`` batch. Packing is per-bucket greedy — the global
    optimum is bin packing (NP-hard) and per-shard FFD is the standard
    practice; determinism comes from the hash bucketing + in-bucket sort,
    not from partition layout. pack_id embeds the bucket in the high bits
    (bucket << 40), so ids are globally unique without coordination up to
    2⁴⁰ packs per bucket. NULL text packs as 0 tokens."""
    import pandas as pd

    from .analysis import n_tokens_col
    from .hashing import h60_spark

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens_col().alias("n_tokens"),
        (
            F.expr(h60_spark("cast(" + id_col + " as string)"))
            % F.lit(n_buckets)
        ).alias("__bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["__bucket"].iat[0]) if len(pdf) else 0
        # plain ndarray iteration — iterrows built a Series per row and
        # dominated the loop at 10⁵-doc buckets (~10× overhead)
        ntok = pdf["n_tokens"].to_numpy()
        out_pack = np.empty(len(ntok), dtype=np.int64)
        out_slot = np.empty(len(ntok), dtype=np.int32)
        packs: list[int] = []  # remaining capacity per open pack
        slots: list[int] = []  # next slot per pack
        for j, n in enumerate(ntok.tolist()):
            if n > max_tokens:  # oversize: its own pack, flagged
                packs.append(0)
                slots.append(0)
                out_pack[j] = len(packs) - 1
                out_slot[j] = -1
                continue
            # zero-token docs may join any OPEN pack but never a flagged
            # oversize singleton (those carry capacity 0, which `cap >= 0`
            # alone would satisfy, un-singling the flagged pack)
            for i, cap in enumerate(packs):  # first fit (decreasing order)
                if cap >= n and (n > 0 or cap > 0):
                    packs[i] = cap - n
                    out_pack[j] = i
                    out_slot[j] = slots[i]
                    slots[i] += 1
                    break
            else:
                packs.append(max_tokens - n)
                slots.append(1)
                out_pack[j] = len(packs) - 1
                out_slot[j] = 0
        pdf = pdf.drop(columns="__bucket")
        pdf["pack_id"] = (bucket << 40) + out_pack
        pdf["pack_slot"] = out_slot
        return pdf

    return d.groupBy("__bucket").applyInPandas(
        pack, "doc_id " + dict(docs.dtypes)[id_col] + ", n_tokens int, "
        "pack_id long, pack_slot int"
    )


def training_order(docs: DataFrame, seed: int = 0, id_col: str = "doc_id") -> DataFrame:
    """Deterministic epoch shuffle: a reproducible pseudo-random total
    order over documents (order_key = 60-bit hash of seed‖doc_id).
    Changing ``seed`` reshuffles; the same seed gives the same order on
    any cluster and any partitioning — no RNG state to coordinate."""
    from .hashing import h60_spark

    return docs.withColumn(
        "order_key",
        F.expr(h60_spark(f"concat('{seed}#', cast({id_col} as string))")),
    )
