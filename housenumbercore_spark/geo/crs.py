"""CRS transforms, from scratch (no pyproj in this environment).

The reference transforms imported list coordinates to WGS84 inside PostGIS
(`ST_Transform(ST_SetSRID(ST_MakePoint(lon,lat),srid),4326)`,
/root/reference/src/de/regioosm/housenumbercore/util/HousenumberList.java:262)
and applies a zone hack for EPSG:25832 (easting > 32e6 → subtract 32e6,
CsvReader.java:507-509). Supported here:

- EPSG:4326     identity
- EPSG:3857 / 900913  spherical ("web") Mercator inverse
- EPSG:258xx    ETRS89 / UTM zone xx N — transverse Mercator inverse using
                the standard Krüger series on the GRS80 ellipsoid (accurate
                to well under 1 mm inside a zone; formulas from public
                geodesy references, e.g. Karney 2011 / OSGB guide).

All vectorized numpy — called from an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (ETRS89)
_A = 6378137.0
_F = 1 / 298.257222101
_K0 = 0.9996
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)


def webmercator_to_wgs84(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 / 900913 (osm2pgsql planet tables) → lon/lat degrees."""
    R = 6378137.0
    lon = np.degrees(np.asarray(x, dtype=np.float64) / R)
    lat = np.degrees(2 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / R)) - np.pi / 2)
    return lon, lat


def utm_to_wgs84(e: np.ndarray, n: np.ndarray, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """UTM zone ``zone`` N (e.g. EPSG:25832 → zone 32) → lon/lat degrees.

    Standard transverse-Mercator inverse series (footpoint latitude +
    6th-order corrections).
    """
    e = np.asarray(e, dtype=np.float64) - 500000.0
    n = np.asarray(n, dtype=np.float64)
    m = n / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))

    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )

    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = e / (n1 * _K0)

    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lon_rel = (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / cos1

    lon0 = np.radians((zone - 1) * 6 - 180 + 3)
    return np.degrees(lon_rel) + np.degrees(lon0), np.degrees(lat)


def with_wgs84(df, x_col: str, y_col: str, srid_col: str):
    """F7 as a DataFrame op: append `lon`/`lat` WGS84 columns from per-row
    (x, y, srid) — the engine path for `ST_Transform(ST_SetSRID(
    ST_MakePoint(lon,lat),srid),4326)` (HousenumberList.java:262).

    One Arrow-batched pandas UDF; inside the batch each distinct SRID is
    transformed as a vectorized numpy slice (mixed-SRID imports are the
    norm: the reference reads the SRID per CSV row, CsvReader.java:500-527).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    def _transform(x, y, srid):
        xv = x.to_numpy(dtype=np.float64)
        yv = y.to_numpy(dtype=np.float64)
        # NaN-init (not empty): rows whose srid is NULL/unmatched must come
        # out as NULL lon/lat, never as uninitialized memory
        lon = np.full_like(xv, np.nan)
        lat = np.full_like(yv, np.nan)
        for s in pd.unique(srid):
            if pd.isna(s):
                continue  # NULL srid → NULL lon/lat for those rows
            m = (srid == s).to_numpy()
            try:
                lon[m], lat[m] = transform_to_wgs84(xv[m], yv[m], int(s))
            except ValueError:
                # unmatched SRID → NULL lon/lat for those rows (the
                # documented contract): one bad row among billions must
                # quarantine itself, not kill the stage — same dirty-data
                # policy as the multimodal transform seams
                continue
        return pd.DataFrame({"lon": lon, "lat": lat})

    transform_udf = F.pandas_udf(_transform, "struct<lon:double,lat:double>")
    out = df.withColumn("__t", transform_udf(x_col, y_col, srid_col))
    return out.withColumns(
        {"lon": out["__t.lon"], "lat": out["__t.lat"]}
    ).drop("__t")


def transform_to_wgs84(
    x: np.ndarray, y: np.ndarray, srid: int
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch by SRID; includes the reference's 25832 easting-prefix hack
    (CsvReader.java:507-509: easting > 32e6 means the zone number is glued
    onto the easting — strip it)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if srid == 4326:
        return x, y
    if srid in (3857, 900913):
        return webmercator_to_wgs84(x, y)
    if 25828 <= srid <= 25838:
        zone = srid - 25800
        # prefixed easting = zone glued in front of a <1e6 easting, so the
        # millions digit equals the zone (generalizes the reference's
        # 25832-only 'x > 32e6' trigger to every ETRS89 zone)
        x = np.where(np.floor(x / 1e6) == zone, x - zone * 1e6, x)
        return utm_to_wgs84(x, y, zone)
    raise ValueError(f"unsupported SRID {srid}")
