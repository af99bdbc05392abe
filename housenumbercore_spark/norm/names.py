"""Street / municipality name normalization — column expressions.

Reference semantics:

- ``correctorder`` locale sort folding: lower() then ß→ss ä→ae ö→oe ü→ue â→a
  (/root/reference/scripts/dbinstallation/dbfunctions.sql:15-19).
- street normalizeName: Romania strips a leading "Strada "
  (/root/reference/src/de/regioosm/housenumbercore/util/OSMStreet.java:121-130).
- StreetToUpperLower title-casing: runs of UPPERCASE letters (incl. Romanian
  diacritics) get first-upper+rest-lower, unless the whole word is in a
  per-country lowercase list (Italian particles) or uppercase list ("II");
  already-mixed/lowercase words are untouched
  (CsvReader.java:153-189, lists :387-404).
- AGS (German official municipality key): strip spaces, right-pad with zeros
  to 8, error if longer (MunicipalityArea.java:294-306, 370-401).
- boundary-name suffix/prefix tolerance: generate the name variants the
  reference accepts when matching relation names
  (MunicipalityArea.java:456-498).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# CsvReader.java:387-404 — populated for IT imports; "II" forced upper.
LOWERCASE_PARTICLES = [
    "al", "alla", "alle", "da", "de", "dei", "del", "dell", "della", "delle",
    "destro", "di", "in", "sinistro",
]
UPPERCASE_WORDS = ["II"]

_UPPER_CLASS = "A-ZÄÉÈÖÜĂÂÎŞŢ"
_UPPER_RUN = rf"[{_UPPER_CLASS}][{_UPPER_CLASS}ß]*"


def correctorder(col: Column | str) -> Column:
    """Sort-folding (dbfunctions.sql:15-19): lower + German umlaut expansion."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    for a, b in (("ß", "ss"), ("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("â", "a")):
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def correctorder_sql(expr: str) -> str:
    out = f"lower({expr})"
    for a, b in (("ß", "ss"), ("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("â", "a")):
        out = f"replace({out}, '{a}', '{b}')"
    return out


def normalize_street_name(name: Column | str, country_code: Column | str) -> Column:
    """OSMStreet.normalizeName parity: RO strips leading 'Strada '."""
    name = F.col(name) if isinstance(name, str) else name
    cc = F.col(country_code) if isinstance(country_code, str) else country_code
    return F.when(
        (cc == "RO") & name.startswith("Strada "),
        F.substring(name, len("Strada ") + 1, 1 << 30),
    ).otherwise(name)


def title_case_street(
    name: Column | str, country_code: Column | str | None = None
) -> Column:
    """StreetToUpperLower parity (CsvReader.java:157-189).

    Only runs of uppercase letters are rewritten; per-run exception lists
    force all-lower (particles) or all-upper ("II"). The reference
    regex-replaces uppercase RUNS in place ANYWHERE in the string —
     'VITTORIO-EMANUELE' and 'S.MARIA' rewrite run-by-run, and so do runs
    embedded in mixed tokens: 'McDONALD' → 'McDonald', "O'BRIEN" →
    "O'Brien", 'LIBERTÀ' → 'LibertÀ' (À is outside the run class, exactly
    like the reference regex). Implemented by wrapping every maximal run
    with sentinels, splitting, and folding only the run segments — the
    non-run text between them passes through verbatim.

    ``country_code``: the exception lists originate from the reference's
    Italy CSV importer; pass the import's country column and the lists are
    consulted only for 'IT' rows ('IN DER AU' in a German list then titles
    to 'In Der Au', not 'in Der Au'). None (default) consults them for
    every row — the historical behavior for single-country pipelines.
    """
    name = F.col(name) if isinstance(name, str) else name
    lower_lit = F.array(*[F.lit(w) for w in LOWERCASE_PARTICLES])
    upper_lit = F.array(*[F.lit(w) for w in UPPERCASE_WORDS])
    if country_code is None:
        lists_on = F.lit(True)
    else:
        cc = (
            F.col(country_code)
            if isinstance(country_code, str)
            else country_code
        )
        lists_on = F.upper(cc).eqNullSafe("IT")

    def fix_run(tok: Column) -> Column:
        # the exception lists apply ONLY to uppercase runs, like the
        # reference (it matches the run first, then consults the lists):
        # an already-mixed-case 'Della' or 'Am' must pass through untouched
        is_upper_run = tok.rlike(rf"^{_UPPER_RUN}$")
        return (
            F.when(
                is_upper_run & lists_on
                & F.array_contains(lower_lit, F.lower(tok)),
                F.lower(tok),
            )
            .when(
                is_upper_run & lists_on
                & F.array_contains(upper_lit, F.upper(tok)),
                F.upper(tok),
            )
            .when(
                is_upper_run,
                F.concat(F.substring(tok, 1, 1), F.lower(F.substring(tok, 2, 1 << 30))),
            )
            .otherwise(tok)
        )

    # wrap every maximal uppercase run with sentinels and split: segments
    # alternate between runs (folded by fix_run) and text with no
    # uppercase-class characters at all (passed through verbatim)
    wrapped = F.regexp_replace(name, rf"({_UPPER_RUN})", "\x01$1\x01")
    return F.array_join(F.transform(F.split(wrapped, "\x01"), fix_run), "")


def normalize_ags(ags: Column | str) -> Column:
    """German AGS: strip spaces, right-pad to 8 with zeros
    (MunicipalityArea.java:294-306). Longer-than-8 keys are left as-is for
    the caller to reject (the reference raises)."""
    c = F.col(ags) if isinstance(ags, str) else ags
    stripped = F.regexp_replace(c, " ", "")
    return F.when(F.length(stripped) >= 8, stripped).otherwise(
        F.rpad(stripped, 8, "0")
    )


def ags_lookup_variants(ags: Column | str) -> Column:
    """Array of the key variants the reference tries when matching boundary
    relations by official key (MunicipalityArea.java:370-401 +
    TheoreticalHousenumbers.java:344-358): the normalized 8-digit form, the
    trailing-zero-stripped form, and the '03 1 52 012'-style spaced form."""
    norm = normalize_ags(ags)
    stripped = F.regexp_replace(norm, "0+$", "")
    spaced = F.concat_ws(
        " ",
        F.substring(norm, 1, 2),
        F.substring(norm, 3, 1),
        F.substring(norm, 4, 2),
        F.substring(norm, 6, 3),
    )
    return F.array_distinct(F.array(norm, stripped, spaced))


def boundary_name_variants(name: Column | str) -> Column:
    """Name variants accepted when matching admin relation names
    (MunicipalityArea.java:456-498): strip/append ', Stadt' and '-Stadt'
    suffixes, 'gmina '/'Gemeinde ' prefixes, and infix ' im '/' ob '/' bei '
    truncations."""
    n = F.col(name) if isinstance(name, str) else name
    variants = [
        n,
        F.regexp_replace(n, r", Stadt$", ""),
        F.regexp_replace(n, r"-Stadt$", ""),
        F.regexp_replace(n, r"^gmina ", ""),
        F.regexp_replace(n, r"^Gemeinde ", ""),
        F.regexp_replace(n, r" im .*$", ""),
        F.regexp_replace(n, r" ob .*$", ""),
        F.regexp_replace(n, r" bei .*$", ""),
        F.concat(n, F.lit(", Stadt")),
        F.concat(F.lit("Gemeinde "), n),
    ]
    return F.array_distinct(F.array(*variants))


# hstore text ⇄ map helpers (reference parser: de/zalando/typemapper/postgres/
# HStore.java:1-371; serialization HousenumberList.java:404-413)
# one escape-aware pair pattern, shared by keys/values extraction: a
# quoted token is ((?:[^"\]|\.)*) — any run of non-quote-non-backslash
# chars or backslash-escapes — so an escaped quote OR an escaped
# backslash at the END of a value (the lookbehind approach misread
# \\" as an escaped quote) never terminates the token; values may also
# be the unquoted literal NULL (postgres hstore_out, HStore.java:217-219)
_HSTORE_PAIR = r'"((?:[^"\\]|\\.)*)"\s*=>\s*(?:NULL|"((?:[^"\\]|\\.)*)")'


def hstore_to_map(col: Column | str) -> Column:
    """Parse '"k"=>"v", "n"=>NULL, ...' hstore text into a MapType column.

    Escape-aware like the reference parser (HStore.java): tokens are
    matched with a full escape grammar (not a single-char lookbehind, which
    misparsed values ending in an escaped backslash), unquoted ``NULL``
    values parse to map-value NULL, and the backslash escapes (\\" and
    \\\\) are unescaped after extraction."""
    c = F.col(col) if isinstance(col, str) else col
    unescape = lambda s: F.regexp_replace(s, r"\\(.)", "$1")  # noqa: E731
    keys = F.transform(
        F.regexp_extract_all(c, F.lit(_HSTORE_PAIR), F.lit(1)), unescape
    )
    # full matches keep the NULL-vs-empty-string distinction that a
    # group-2 extraction loses (a non-participating group extracts '')
    vals = F.transform(
        F.regexp_extract_all(c, F.lit(_HSTORE_PAIR), F.lit(0)),
        lambda m: F.when(m.rlike(r"=>\s*NULL$"), F.lit(None)).otherwise(
            unescape(F.regexp_extract(m, _HSTORE_PAIR, 2))
        ),
    )
    return F.map_from_arrays(keys, vals)


def map_to_hstore(col: Column | str) -> Column:
    """Serialize a MapType to hstore text, escaping backslashes and quotes
    (HousenumberList.java:404-413 writes through the same codec) so that
    hstore_to_map(map_to_hstore(m)) round-trips any value — including
    NULL values, which serialize unquoted ('"k"=>NULL', hstore_out's
    format) instead of silently vanishing from the output (concat of a
    NULL value nulled the whole entry and array_join dropped it)."""
    c = F.col(col) if isinstance(col, str) else col

    def esc(s: Column) -> Column:
        return F.regexp_replace(
            F.regexp_replace(s, r"\\", r"\\\\"), '"', '\\\\"'
        )

    entries = F.transform(
        F.map_entries(c),
        lambda e: F.concat(
            F.lit('"'),
            esc(e["key"]),
            F.when(e["value"].isNull(), F.lit('"=>NULL')).otherwise(
                F.concat(F.lit('"=>"'), esc(e["value"]), F.lit('"'))
            ),
        ),
    )
    return F.array_join(entries, ", ")
