"""Config-driven CSV list importer — Spark-first parity with the
reference's CsvReader (S1 in SURVEY.md §2.1).

Reference behaviors re-expressed (NOT ported):
- separator sniffing by frequency over the header line
  (/root/reference/src/de/regioosm/housenumbercore/util/CsvReader.java:351-369)
- UTF-8 BOM strip (CsvReader.java:346-350)
- multilingual header inference mapping German/English/Italian/French
  header names to logical fields (analyseHeaderline, CsvReader.java:191-297)
- explicit positional column binding, ``-c 3=street``
  (imports/CsvListImport.java:301-346)
- unknown columns captured as OSM extra tags (``-cf``,
  CsvListImport.java:347-360 → ``extraosmtags`` hstore)

Spark design: the header is read ONCE on the driver from a tiny
``spark.read.text().limit()`` sample (works on any Hadoop-visible store —
no local-file assumption); everything row-shaped then flows through
``spark.read.csv`` with an explicit separator + a select/alias layer, so
the actual data path is a single distributed scan with column pruning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# candidate separators, tested by frequency in the header line
# (CsvReader.java:351-369 counts occurrences and picks the most frequent)
SEPARATORS = ("\t", ";", ",", "|")

# logical field → lowercase header-name variants (multilingual subset of
# analyseHeaderline, CsvReader.java:191-297)
HEADER_VARIANTS: dict[str, tuple[str, ...]] = {
    "street": (
        "strasse", "straße", "str", "strassenname", "street", "streetname",
        "via", "strada", "rue", "calle",
    ),
    "housenumber": (
        "hausnummer", "hnr", "hausnr", "nummer", "housenumber", "number",
        "civico", "numero", "nr",
    ),
    "housenumberaddition": (
        "adresszusatz", "zusatz", "hausnummerzusatz", "addition", "suffix",
        "esponente",
    ),
    "postcode": (
        "plz", "postleitzahl", "postcode", "zip", "zipcode", "cap",
        "code_postal", "codice_postale",
    ),
    "municipality": (
        "gemeinde", "stadt", "ort", "city", "municipality", "town", "comune",
        "commune", "localidad",
    ),
    "submunicipality": (
        "ortsteil", "stadtteil", "suburb", "district", "frazione", "quartier",
    ),
    "municipality_ref": ("ags", "gemeindeschluessel", "officialkey", "lau"),
    "lon": ("lon", "lng", "longitude", "x", "easting", "rechtswert"),
    "lat": ("lat", "latitude", "y", "northing", "hochwert"),
}

LOGICAL_FIELDS = tuple(HEADER_VARIANTS)


@dataclass
class CsvImportParams:
    """Subset of the reference's CsvImportparameter relevant to parsing."""

    separator: str | None = None  # None → sniff
    column_bindings: dict[int, str] = field(default_factory=dict)  # 0-based
    tag_bindings: dict[int, str] = field(default_factory=dict)  # col → osm tag
    encoding: str = "UTF-8"
    srid: int = 4326


def strip_bom(s: str) -> str:
    return s.lstrip("﻿")


def sniff_separator(header_line: str) -> str:
    """Most frequent candidate separator in the header line."""
    counts = {sep: header_line.count(sep) for sep in SEPARATORS}
    best = max(counts, key=lambda s: counts[s])
    return best if counts[best] > 0 else ","


def infer_header_mapping(
    headers: list[str], params: CsvImportParams | None = None
) -> tuple[dict[str, int], dict[int, str]]:
    """(logical field → column index, unmatched column index → tag name).

    Explicit ``column_bindings`` win over name inference; remaining
    unmatched columns become extra OSM tags (explicit ``tag_bindings`` name
    them, others keep their header name).
    """
    params = params or CsvImportParams()
    mapping: dict[str, int] = {}
    claimed: set[int] = set()
    for idx, logical in params.column_bindings.items():
        mapping[logical] = idx
        claimed.add(idx)
    norm = [strip_bom(h).strip().lower().replace(" ", "_") for h in headers]
    for logical, variants in HEADER_VARIANTS.items():
        if logical in mapping:
            continue
        for i, h in enumerate(norm):
            if i not in claimed and h in variants:
                mapping[logical] = i
                claimed.add(i)
                break
    tags = {
        i: params.tag_bindings.get(i, headers[i].strip())
        for i in range(len(headers))
        if i not in claimed and headers[i].strip()
    }
    return mapping, tags


def read_header(spark: SparkSession, path: str, params: CsvImportParams) -> tuple[str, list[str]]:
    """Driver-side peek at the first line (distributed-store-safe).

    The header is split with a quote-aware csv parser, mirroring the
    quote handling spark.read.csv applies to the data rows: a naive
    ``split(sep)`` would keep the quotes on quoted names (breaking the
    header-variant match) and mis-split a quoted name containing the
    separator, shifting every positional binding after it."""
    import csv as _csv
    import io

    first = strip_bom(_first_line(spark, path, params.encoding))
    # a '#'-prefixed header line is a comment marker the reference strips
    # before analysing (CsvReader.analyseHeaderline); positions are
    # unchanged, only the first header name loses the marker
    if first.startswith("#"):
        first = first[1:]
    sep = params.separator or sniff_separator(first)
    fields = next(_csv.reader(io.StringIO(first), delimiter=sep, quotechar='"'))
    return sep, [h.strip() for h in fields]


def _first_line(spark: SparkSession, path: str, encoding: str) -> str:
    """First line of the first file matching ``path``, decoded with the
    import's encoding. ``spark.read.text`` always decodes UTF-8 — it
    honored ``params.encoding`` for the data rows but fed the header
    inference mojibake on Latin-1/UTF-16 files (a 'Straße' header then
    matched no variant and the street column silently went NULL)."""
    from .sinks import _hadoop_fs

    jvm, fs, jpath = _hadoop_fs(spark, path)
    sts = fs.globStatus(jpath)
    files = []
    for st in sts or []:
        if st.isFile():
            files.append(st.getPath())
        elif st.isDirectory():
            for sub in fs.listStatus(st.getPath()):
                if sub.isFile() and not sub.getPath().getName().startswith(
                    ("_", ".")
                ):
                    files.append(sub.getPath())
    if not files:
        raise FileNotFoundError(f"read_header: no files match {path}")
    files.sort(key=lambda p: p.toString())
    stream = fs.open(files[0])
    try:
        # bounded JVM-side copy (one py4j call): 64 KiB is orders of
        # magnitude beyond any real header line, and per-byte py4j reads
        # are unusably slow (same rationale as snapshots._read_text)
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(
            stream, 65536
        )
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(bounded, baos, 8192, False)
    finally:
        stream.close()
    text = bytes(baos.toByteArray()).decode(encoding, errors="replace")
    return text.splitlines()[0] if text else ""


def read_csv_addresses(
    spark: SparkSession,
    path: str,
    params: CsvImportParams | None = None,
) -> DataFrame:
    """CSV → logical address DataFrame
    ``(street, housenumber, housenumberaddition, postcode, municipality,
    submunicipality, municipality_ref, lon, lat, extraosmtags)``.

    Missing logical columns come out NULL; unmatched CSV columns are packed
    into the ``extraosmtags`` map (the reference's hstore column,
    dbstructure.sql:152).
    """
    params = params or CsvImportParams()
    sep, headers = read_header(spark, path, params)
    mapping, tags = infer_header_mapping(headers, params)

    raw = (
        spark.read.option("sep", sep)
        .option("header", "true")
        .option("encoding", params.encoding)
        .csv(path)
    )
    cols = raw.columns  # spark's view of the header (post-BOM handling)

    def col_at(i: int):
        if i >= len(cols):
            return F.lit(None)
        # identifier-quote the header name with backticks DOUBLED — a
        # header containing a backtick otherwise fails identifier parsing
        # for every column reference
        return F.col("`" + cols[i].replace("`", "``") + "`")

    out = []
    for logical in LOGICAL_FIELDS:
        if logical in ("lon", "lat"):
            # decimal-comma normalization (CsvReader.java:506 replaces
            # ',' before parsing — the standard German format) and
            # try_cast: under Spark 4's default ANSI mode a plain cast
            # aborts the whole import on one junk coordinate cell, where
            # the reference logs a warning and unsets the coordinate
            c = (
                F.regexp_replace(
                    col_at(mapping[logical]).cast("string"), ",", "."
                ).try_cast("double")
                if logical in mapping
                else F.lit(None).cast("double")
            )
        else:
            c = col_at(mapping[logical]) if logical in mapping else F.lit(None).cast("string")
        out.append(c.alias(logical))
    if tags:
        pairs = []
        used: set[str] = set()
        for i, tag in sorted(tags.items()):
            # duplicate unmatched header names must get distinct map keys:
            # Spark's default mapKeyDedupPolicy=EXCEPTION fails the whole
            # read on the first duplicated key otherwise (real-world CSV
            # lists do repeat header names). Collision-aware against the
            # FULL name set — a real header literally named 'note_2' next
            # to two 'note' columns must not recreate the duplicate
            name, n = tag, 1
            while name in used:
                n += 1
                name = f"{tag}_{n}"
            used.add(name)
            pairs.extend([F.lit(name), col_at(i)])
        extes = F.map_filter(F.create_map(*pairs), lambda k, v: v.isNotNull())
    else:
        extes = F.lit(None).cast("map<string,string>")
    out.append(extes.alias("extraosmtags"))
    df = raw.select(*out)

    if params.srid != 4326:
        df = _transform_coords(df, params.srid)
    return df


def _transform_coords(df: DataFrame, srid: int) -> DataFrame:
    """CRS transform via the vectorized kernel (F7; EPSG:25832 zone hack
    easting > 32e6 → −32e6, CsvReader.java:507-509)."""
    import pandas as pd

    from ..geo import crs as CRS

    if srid == 25832:
        df = df.withColumn(
            "lon",
            F.when(F.col("lon") > 32e6, F.col("lon") - 32e6).otherwise(F.col("lon")),
        )

    schema = df.schema

    def gen(batches):
        for pdf in batches:
            x = pdf["lon"].to_numpy(dtype="float64")
            y = pdf["lat"].to_numpy(dtype="float64")
            if srid in (3857, 900913):
                lon, lat = CRS.webmercator_to_wgs84(x, y)
            elif 25828 <= srid <= 25838:
                lon, lat = CRS.utm_to_wgs84(x, y, srid - 25800)
            else:
                raise ValueError(f"unsupported srid {srid}")
            pdf = pdf.assign(lon=lon, lat=lat)
            yield pdf

    return df.mapInPandas(gen, schema)
