"""DuckDB-oracle SQL mirroring text/analysis.py and text/dedup.py.

Same literal hash constants, same integer arithmetic, same rounding — the
driver's correctness gate compares these hash-for-hash against the Spark
results at sf0.01. Casts pin DuckDB output types to Spark's (size→INT,
count→BIGINT, round→DOUBLE).
"""

from __future__ import annotations

from .analysis import FINGERPRINT_SHINGLE, LANG_PROFILES, QUALITY_STOPWORDS
from .hashing import (
    MERSENNE31,
    MINHASH_A,
    MINHASH_B,
    MINHASH_BANDS,
    MINHASH_ROWS,
    ROLLING_BASE,
    SIMHASH_BAND_BITS,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    h60_duck,
    tokens_duck,
)

P = MERSENNE31


def _src() -> str:
    return (
        f"(SELECT doc_id, text, lang, {tokens_duck('text')} AS toks "
        "FROM documents)"
    )


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _count_in(words: tuple[str, ...]) -> str:
    # case-folded, mirroring analysis._count_in
    return (
        f"len(list_filter(toks, t -> "
        f"list_contains([{_sql_list(words)}], lower(t))))"
    )


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
  CAST(CASE WHEN len(toks) > 0 THEN
       round(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
             / len(toks), 6) END AS DOUBLE) AS mean_token_len
FROM {_src()} d"""


def quality_sql() -> str:
    stop = _count_in(QUALITY_STOPWORDS)
    sl = "list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum')"
    n = "CAST(len(toks) AS BIGINT)"
    s = f"CAST({stop} AS BIGINT)"
    # mirror the engine's micropoint integer arithmetic (floor division)
    qu = (
        f"(1000 * least({n}, 400)"
        f" + (300000 * ({n} - {s})) // greatest({n}, 1)"
        f" + least((37500 * {sl}) // {n}, 300000))"
    )
    return f"""
SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars,
  CAST(len(toks) AS INT) AS n_tokens,
  ((1000000 * {s}) // greatest({n}, 1)) / 1e6 AS stopword_ratio,
  ((1000000 * {sl}) // greatest({n}, 1)) / 1e6 AS mean_token_len,
  {qu} / 1e6 AS quality
FROM {_src()} d"""


def lang_id_sql() -> str:
    cols = ", ".join(
        f"{_count_in(words)} AS c_{lang}" for lang, words in LANG_PROFILES
    )
    langs = [lang for lang, _ in LANG_PROFILES]
    # cascade: earlier rank wins ties (same rule as the engine's
    # array_max over (score, -rank) structs)
    cases = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"c_{lang} >= c_{other}" for other in langs[i + 1 :]
        )
        cases.append(
            f"WHEN {conds or 'TRUE'} THEN '{lang}'"
            if i < len(langs) - 1
            else f"ELSE '{langs[-1]}'"
        )
    pred = "CASE " + " ".join(cases) + " END"
    score = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    # zero marker hits → 'und', mirroring analysis.lang_id
    pred = f"CASE WHEN {score} = 0 THEN 'und' ELSE ({pred}) END"
    return f"""
SELECT doc_id, {pred} AS pred_lang, CAST({score} AS INT) AS lang_score,
       lang AS label_lang
FROM (SELECT doc_id, lang, {cols} FROM {_src()} d) s"""


def lang_id_accuracy_sql() -> str:
    return (
        f"SELECT label_lang, pred_lang, COUNT(*) AS n_docs FROM ({lang_id_sql()}"
        ") li GROUP BY label_lang, pred_lang"
    )


def fingerprints_sql() -> str:
    k = FINGERPRINT_SHINGLE
    rolling = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(toks, t -> {h60_duck('t')} % {P})), "
        f"(acc, h) -> (acc * {ROLLING_BASE} + h) % {P})"
    )
    gram = "array_to_string(toks[i:i+" + str(k - 1) + "], ' ')"
    # short-doc fallback = token join (whitespace-normalized), mirroring
    # analysis.fingerprints and dedup.shingle_expr
    short = h60_duck("array_to_string(toks, ' ')")
    min_shingle = (
        f"CASE WHEN len(toks) >= {k} THEN "
        f"list_aggregate(list_transform(generate_series(1, len(toks) - {k - 1}), "
        f"i -> {h60_duck(gram)}), 'min') "
        f"ELSE {short} END"
    )
    return f"""
SELECT doc_id, {h60_duck('text')} AS content_hash,
  {rolling} AS rolling_hash, {min_shingle} AS min_shingle_hash
FROM {_src()} d"""


NORM_DUCK = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def exact_dedup_sql() -> str:
    return f"""
WITH keyed AS (
  SELECT doc_id, {h60_duck(NORM_DUCK)} AS content_key FROM documents),
groups AS (
  SELECT content_key, min(doc_id) AS canonical_doc_id,
         COUNT(*) AS group_size
  FROM keyed GROUP BY content_key)
SELECT k.doc_id, k.content_key, g.canonical_doc_id, g.group_size,
       g.group_size > 1 AS is_duplicate_group
FROM keyed k JOIN groups g USING (content_key)"""


def _shingle_cte(k: int, src: str | None = None) -> str:
    if k == 1:
        sh = "list_distinct(toks)"
    else:
        sh = (
            f"CASE WHEN len(toks) >= {k} THEN list_distinct("
            f"list_transform(generate_series(1, len(toks) - {k - 1}), "
            f"i -> array_to_string(toks[i:i+{k - 1}], ' '))) "
            f"ELSE [array_to_string(toks, ' ')] END"
        )
    return f"""
shing AS (
  SELECT doc_id, {sh} AS shingles FROM {src or _src()} d),
sh31 AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> {h60_duck('s')} % {P}) AS hs
  FROM shing)"""


def _sig_expr() -> str:
    elems = ", ".join(
        f"list_aggregate(list_transform(hs, h -> ({a} * h + {b}) % {P}), 'min')"
        for a, b in zip(MINHASH_A, MINHASH_B)
    )
    return f"[{elems}]"


def _minhash_cte_body(k: int, src: str | None = None) -> str:
    r = MINHASH_ROWS
    band_bucket = h60_duck(f"array_to_string(sig[j*{r}+1:j*{r}+{r}], ',')")
    return f"""{_shingle_cte(k, src)},
sigs AS (
  SELECT doc_id, {_sig_expr()} AS sig FROM sh31),
bands AS (
  SELECT doc_id, j AS band, {band_bucket} AS bucket
  FROM sigs CROSS JOIN (
    SELECT unnest(generate_series(0, {MINHASH_BANDS - 1})) AS j) g),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""


def _minhash_ctes(k: int) -> str:
    return f"""
WITH {_minhash_cte_body(k)}"""


def minhash_buckets_sql(k: int = 2) -> str:
    return (
        _minhash_ctes(k)
        + "\nSELECT doc_id, CAST(band AS INT) AS band, bucket FROM bands"
    )


def _pairs_cte_body(
    k: int = 2, min_sig_agree: int = 8, src: str | None = None
) -> str:
    """CTE chain (no WITH) ending in ``mpairs(doc_a, doc_b, jaccard)`` —
    the verified MinHash near-dup pairs of ``src`` (default: documents),
    mirroring dedup.py minhash_dedup_pairs (signature-estimate prefilter
    then exact shingle verify)."""
    agree = (
        "list_sum(list_transform(generate_series(1, "
        f"{len(MINHASH_A)}), i -> CASE WHEN ga.sig[i] = gb.sig[i] "
        "THEN 1 ELSE 0 END))"
    )
    return (
        _minhash_cte_body(k, src)
        + f""",
screened AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN sigs ga ON ga.doc_id = p.doc_a
  JOIN sigs gb ON gb.doc_id = p.doc_b
  WHERE {agree} >= {min_sig_agree}),
mpairs AS (
  SELECT p.doc_a, p.doc_b,
    CAST(round(len(list_intersect(sa.shingles, sb.shingles))
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))), 6) AS DOUBLE)
    AS jaccard
  FROM screened p
  JOIN shing sa ON sa.doc_id = p.doc_a
  JOIN shing sb ON sb.doc_id = p.doc_b)"""
    )


def minhash_pairs_sql(k: int = 2, min_sig_agree: int = 8) -> str:
    return (
        "\nWITH "
        + _pairs_cte_body(k, min_sig_agree)
        + "\nSELECT doc_a, doc_b, jaccard FROM mpairs"
    )


def dedup_clusters_sql(k: int = 2, min_sig_agree: int = 8) -> str:
    """Connected components over the MinHash near-dup pair graph via
    recursive reachability: cluster_id = min doc_id reachable from each
    document (isolated docs are their own singleton clusters) — the same
    fixpoint dedup.py dedup_clusters reaches by min-label propagation."""
    return f"""
WITH RECURSIVE {_pairs_cte_body(k, min_sig_agree)},
edges AS (
  SELECT doc_a AS esrc, doc_b AS edst FROM mpairs
  UNION
  SELECT doc_b, doc_a FROM mpairs),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.edst, reach.r FROM reach JOIN edges e ON e.esrc = reach.id)
SELECT id AS doc_id, MIN(r) AS cluster_id, id = MIN(r) AS is_canonical
FROM reach GROUP BY id"""


def corpus_report_sql(
    min_quality: float = 0.55,
    languages: tuple[str, ...] = ("en", "de"),
    jaccard_threshold: float = 0.5,
) -> str:
    """Stage ledger of corpus.py prepare_corpus: quality gate → language
    filter → exact-dedup keep-one → MinHash near-dup keep-one, each stage
    recomputed in SQL over the previous stage's survivors (the MinHash
    pair CTEs run over the post-exact-dedup subset exactly as the engine
    does), then the 5 (stage, n_in, n_out) rows."""
    langs = ", ".join(f"'{lang}'" for lang in languages)
    src3 = (
        f"(SELECT s.doc_id, s.text, s.lang, s.toks FROM {_src()} s "
        "JOIN s3 ON s.doc_id = s3.doc_id)"
    )
    return f"""
WITH RECURSIVE
qflt AS (
  SELECT doc_id FROM ({quality_sql()}) q WHERE quality >= {min_quality}),
lflt AS (
  SELECT doc_id FROM ({lang_id_sql()}) l WHERE pred_lang IN ({langs})),
s2 AS (SELECT q.doc_id FROM qflt q JOIN lflt l ON q.doc_id = l.doc_id),
ek AS (
  SELECT d.doc_id, {h60_duck(NORM_DUCK)} AS ck
  FROM documents d JOIN s2 ON d.doc_id = s2.doc_id),
s3 AS (
  SELECT e.doc_id FROM ek e
  JOIN (SELECT ck, MIN(doc_id) AS m FROM ek GROUP BY ck) g
    ON e.ck = g.ck AND e.doc_id = g.m),
{_pairs_cte_body(src=src3)},
edges AS (
  SELECT doc_a AS esrc, doc_b AS edst FROM mpairs
  WHERE jaccard >= {jaccard_threshold}
  UNION
  SELECT doc_b, doc_a FROM mpairs WHERE jaccard >= {jaccard_threshold}),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM s3
  UNION
  SELECT e.edst, reach.r FROM reach JOIN edges e ON e.esrc = reach.id),
kept AS (SELECT id FROM reach GROUP BY id HAVING id = MIN(r)),
c AS (SELECT (SELECT COUNT(*) FROM documents) AS n0,
             (SELECT COUNT(*) FROM qflt) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2_,
             (SELECT COUNT(*) FROM s3) AS n3,
             (SELECT COUNT(*) FROM kept) AS n4)
SELECT 'input' AS stage, n0 AS n_in, n0 AS n_out FROM c
UNION ALL SELECT 'quality_gate', n0, n1 FROM c
UNION ALL SELECT 'language_filter', n1, n2_ FROM c
UNION ALL SELECT 'exact_dedup', n2_, n3 FROM c
UNION ALL SELECT 'neardup_keep_one', n3, n4 FROM c"""


def token_budget_sample_sql(budget: int = 30_000, by: str = "lang") -> str:
    """Mirror of corpus.py sample_to_token_budget(by=...): equal budget
    split across groups, keep iff 60-bit id hash < fraction × 2⁶⁰ —
    identical double arithmetic, so the SAME documents are kept."""
    nt = f"CAST(greatest(0, len({tokens_duck('text')})) AS INT)"
    return f"""
WITH d AS (
  SELECT doc_id, text, lang, source, n_chars, {nt} AS n_tokens,
         coalesce(CAST({by} AS VARCHAR), '__null__') AS grp
  FROM documents),
tot AS (
  SELECT grp, CAST(SUM(n_tokens) AS BIGINT) AS grp_tokens
  FROM d GROUP BY grp),
ng AS (SELECT COUNT(*) AS n FROM tot)
SELECT doc_id, text, lang, source, n_chars, n_tokens
FROM d JOIN tot USING (grp), ng
WHERE CAST({h60_duck('CAST(doc_id AS VARCHAR)')} AS DOUBLE)
      < CASE WHEN tot.grp_tokens = 0 THEN 1.0
             ELSE least(1.0, (CAST({budget} AS DOUBLE) / ng.n)
                             / tot.grp_tokens) END
        * 1152921504606846976.0"""


def contamination_sql(k: int = 8, bench_mod: int = 97) -> str:
    """Mirror of corpus.py contamination_check with the driver's benchmark
    = documents where doc_id % bench_mod = 0: corpus docs sharing word
    k-gram hashes with the benchmark set."""
    return f"""
WITH {_shingle_cte(k)},
dd AS (
  SELECT doc_id, CAST(len(hs) AS INT) AS n_doc, unnest(hs) AS h FROM sh31),
bb AS (
  SELECT DISTINCT bench_id, h FROM (
    SELECT doc_id AS bench_id, unnest(hs) AS h FROM sh31
    WHERE doc_id % {bench_mod} = 0) t)
SELECT doc_id, bench_id, n_common_shingles,
  CAST(round(n_common_shingles / n_doc, 6) AS DOUBLE) AS doc_overlap_ratio
FROM (
  SELECT dd.doc_id, bb.bench_id,
         CAST(COUNT(*) AS BIGINT) AS n_common_shingles,
         MIN(dd.n_doc) AS n_doc
  FROM dd JOIN bb ON dd.h = bb.h
  GROUP BY dd.doc_id, bb.bench_id
  HAVING COUNT(*) >= 1) hits"""


def sequence_packs_sql(max_tokens: int = 80, n_buckets: int = 8) -> str:
    """Mirror of corpus.py pack_sequences: per-bucket first-fit-decreasing
    replayed as a recursive CTE — state rows carry the open-pack capacity
    and next-slot lists, advancing one document (in n_tokens DESC, doc_id
    ASC order) per recursion step; the final state per bucket holds every
    assignment. Oversize docs (> max_tokens) become pack_slot = -1
    singletons exactly as the engine flags them."""
    nt = f"CAST(greatest(0, len({tokens_duck('text')})) AS INT)"
    h = h60_duck("CAST(doc_id AS VARCHAR)")
    # first open pack (1-based) whose remaining capacity fits the doc;
    # list_position returns 0 when none fits
    # zero-token docs never join a flagged oversize singleton (capacity 0)
    idx = (
        "list_position(list_transform(s.caps, "
        "c -> c >= b.n_tokens AND (b.n_tokens > 0 OR c > 0)), true)"
    )
    return f"""
WITH RECURSIVE
d AS (
  SELECT doc_id, {nt} AS n_tokens, {h} % {n_buckets} AS bucket
  FROM documents),
base AS (
  SELECT doc_id, n_tokens, bucket,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY bucket ORDER BY n_tokens DESC, doc_id) AS BIGINT)
         AS rn
  FROM d),
nb AS (SELECT bucket, COUNT(*) AS cnt FROM base GROUP BY bucket),
st(bucket, rn, caps, slots, opack, oslot) AS (
  SELECT bucket, CAST(0 AS BIGINT), CAST([] AS BIGINT[]),
         CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
  FROM nb
  UNION ALL
  SELECT s.bucket, s.rn + 1,
    CASE WHEN b.n_tokens > {max_tokens} THEN list_append(s.caps, 0)
         WHEN {idx} > 0 THEN list_transform(
           generate_series(1, len(s.caps)),
           i -> CASE WHEN i = {idx} THEN s.caps[i] - b.n_tokens
                     ELSE s.caps[i] END)
         ELSE list_append(s.caps, {max_tokens} - b.n_tokens) END,
    CASE WHEN b.n_tokens > {max_tokens} THEN list_append(s.slots, 0)
         WHEN {idx} > 0 THEN list_transform(
           generate_series(1, len(s.slots)),
           i -> CASE WHEN i = {idx} THEN s.slots[i] + 1 ELSE s.slots[i] END)
         ELSE list_append(s.slots, 1) END,
    list_append(s.opack,
      CASE WHEN b.n_tokens > {max_tokens} THEN len(s.caps)
           WHEN {idx} > 0 THEN {idx} - 1
           ELSE len(s.caps) END),
    list_append(s.oslot,
      CASE WHEN b.n_tokens > {max_tokens} THEN -1
           WHEN {idx} > 0 THEN s.slots[{idx}]
           ELSE 0 END)
  FROM st s JOIN base b ON b.bucket = s.bucket AND b.rn = s.rn + 1),
fin AS (
  SELECT s.bucket, s.opack, s.oslot
  FROM st s JOIN nb ON s.bucket = nb.bucket AND s.rn = nb.cnt)
SELECT b.doc_id, b.n_tokens,
  CAST((b.bucket << 40) + f.opack[b.rn] AS BIGINT) AS pack_id,
  CAST(f.oslot[b.rn] AS INT) AS pack_slot
FROM base b JOIN fin f ON b.bucket = f.bucket"""


def training_order_sql(seed: int = 1) -> str:
    """Mirror of corpus.py training_order: order_key = 60-bit hash of
    seed‖doc_id appended to every input column."""
    key = h60_duck(f"'{seed}#' || CAST(doc_id AS VARCHAR)")
    return (
        "SELECT doc_id, text, lang, source, n_chars, "
        f"{key} AS order_key FROM documents"
    )


def _simhash_ctes() -> str:
    return f"""
WITH th AS (
  SELECT doc_id, {h60_duck('t')} AS h
  FROM (SELECT doc_id, unnest(toks) AS t FROM {_src()} d) u),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (
    SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j) g
  GROUP BY doc_id, j),
sh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id)"""


def simhash_sql() -> str:
    return _simhash_ctes() + "\nSELECT doc_id, simhash FROM sh"


def simhash_pairs_sql(max_hamming: int = 24) -> str:
    bb = SIMHASH_BAND_BITS
    mask = (1 << bb) - 1
    return (
        _simhash_ctes()
        + f""",
sbands AS (
  SELECT doc_id, simhash, j AS band,
         (simhash >> (j * {bb})) & {mask} AS bucket
  FROM sh CROSS JOIN (
    SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS j) g)
SELECT doc_a, doc_b, hamming FROM (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM sbands a JOIN sbands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id) t
WHERE hamming <= {max_hamming}"""
    )


def ngram_jaccard_sql(
    k: int = 3, threshold: float = 0.2, max_df: int = 100
) -> str:
    # mirror the engine's DF-capped candidate generation over shingle
    # HASHES + exact array verify (dedup.py ngram_jaccard_pairs)
    return f"""
WITH {_shingle_cte(k)},
inv AS (
  SELECT doc_id, unnest(hs) AS h FROM sh31),
hot AS (
  SELECT h FROM inv GROUP BY h HAVING COUNT(*) > {max_df}),
rare AS (
  SELECT * FROM inv WHERE h NOT IN (SELECT h FROM hot)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT p.doc_a, p.doc_b,
    CAST(round(len(list_intersect(sa.shingles, sb.shingles))
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))), 6) AS DOUBLE)
    AS jaccard
  FROM pairs p
  JOIN shing sa ON sa.doc_id = p.doc_a
  JOIN shing sb ON sb.doc_id = p.doc_b) t
WHERE jaccard >= {threshold}"""
