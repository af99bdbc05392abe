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
    return (
        f"len(list_filter(toks, t -> list_contains([{_sql_list(words)}], t)))"
    )


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_unique_tokens,
  CAST(round(list_aggregate(list_transform(toks, t -> length(t)), 'sum')
       / len(toks), 6) AS DOUBLE) AS mean_token_len
FROM {_src()} d"""


def quality_sql() -> str:
    stop = _count_in(QUALITY_STOPWORDS)
    sl = "list_aggregate(list_transform(toks, t -> CAST(length(t) AS BIGINT)), 'sum')"
    n = "CAST(len(toks) AS BIGINT)"
    s = f"CAST({stop} AS BIGINT)"
    # mirror the engine's micropoint integer arithmetic (floor division)
    qu = (
        f"(1000 * least({n}, 400)"
        f" + (300000 * ({n} - {s})) // {n}"
        f" + least((37500 * {sl}) // {n}, 300000))"
    )
    return f"""
SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars,
  CAST(len(toks) AS INT) AS n_tokens,
  ((1000000 * {s}) // {n}) / 1e6 AS stopword_ratio,
  ((1000000 * {sl}) // {n}) / 1e6 AS mean_token_len,
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
    min_shingle = (
        f"CASE WHEN len(toks) >= {k} THEN "
        f"list_aggregate(list_transform(generate_series(1, len(toks) - {k - 1}), "
        f"i -> {h60_duck(gram)}), 'min') "
        f"ELSE {h60_duck('text')} END"
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


def _shingle_cte(k: int) -> str:
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
  SELECT doc_id, {sh} AS shingles FROM {_src()} d),
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


def _minhash_ctes(k: int) -> str:
    r = MINHASH_ROWS
    band_bucket = h60_duck(f"array_to_string(sig[j*{r}+1:j*{r}+{r}], ',')")
    return f"""
WITH {_shingle_cte(k)},
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


def minhash_buckets_sql(k: int = 2) -> str:
    return (
        _minhash_ctes(k)
        + "\nSELECT doc_id, CAST(band AS INT) AS band, bucket FROM bands"
    )


def minhash_pairs_sql(k: int = 2, min_sig_agree: int = 8) -> str:
    # mirror the engine's signature-estimate prefilter (dedup.py
    # minhash_dedup_pairs): count agreeing signature components per pair
    agree = (
        "list_sum(list_transform(generate_series(1, "
        f"{len(MINHASH_A)}), i -> CASE WHEN ga.sig[i] = gb.sig[i] "
        "THEN 1 ELSE 0 END))"
    )
    return (
        _minhash_ctes(k)
        + f""",
screened AS (
  SELECT p.doc_a, p.doc_b FROM pairs p
  JOIN sigs ga ON ga.doc_id = p.doc_a
  JOIN sigs gb ON gb.doc_id = p.doc_b
  WHERE {agree} >= {min_sig_agree})
SELECT p.doc_a, p.doc_b,
  CAST(round(len(list_intersect(sa.shingles, sb.shingles))
    / (len(sa.shingles) + len(sb.shingles)
       - len(list_intersect(sa.shingles, sb.shingles))), 6) AS DOUBLE)
  AS jaccard
FROM screened p
JOIN shing sa ON sa.doc_id = p.doc_a
JOIN shing sb ON sb.doc_id = p.doc_b"""
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
