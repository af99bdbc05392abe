"""Partitioned table sinks: Iceberg-`overwritePartitions` semantics on plain
parquet.

The reference maintains its result tables with per-row INSERT/UPDATE/DELETE
driven by the Workcache diff (/root/reference/src/de/regioosm/
theoreticalhousenumbercore/util/Workcache.java:243-424) inside a
per-municipality transaction. The Spark-native equivalent is partition-level
replacement: results are partitioned by the evaluation unit (job/municipality
or cell prefix), and a re-evaluation overwrites ONLY the partitions it
recomputed — readers of other partitions are unaffected, and the old
snapshot stays readable until the swap (parquet dynamic partition overwrite;
with an Iceberg catalog the same calls map to ``writeTo(...).
overwritePartitions()`` and gain snapshot isolation).

Scale notes: partition count should track the evaluation-unit cardinality
(10⁴-10⁵ municipalities / cell prefixes), not row count; each partition's
rewrite is a narrow map-only job when upstream already partitioned the
DataFrame (`repartition(partition_cols)` avoids tiny-file explosions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic: bool = True,
) -> None:
    """Write/overwrite a partitioned parquet table. With ``dynamic=True``
    only partitions present in ``df`` are replaced (Iceberg
    overwritePartitions parity); with False the whole table is replaced."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "dynamic" if dynamic else "static",
    )
    try:
        (
            df.repartition(*partition_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _part_value_str(v) -> str | None:
    """Python partition value → the string Spark writes into the directory
    name (before percent-escaping). None means the NULL partition."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _decode_part_dir(name: str) -> tuple[str, str | None]:
    """On-disk ``col=escaped-value`` directory name → (col, decoded value).
    Spark percent-escapes special characters (space, ':', '/', …) and writes
    NULL as __HIVE_DEFAULT_PARTITION__ — matching must happen on DECODED
    values, never by string-composing the expected path."""
    from urllib.parse import unquote

    col, _, raw = name.partition("=")
    return col, (None if raw == _HIVE_NULL else unquote(raw))


def _leaf_partition_dirs(root: str, depth: int) -> list[str]:
    """Relative paths of all ``col=value`` partition leaf dirs exactly
    ``depth`` levels under ``root``."""
    import os

    out: list[str] = []

    def rec(cur: str, rel: str, d: int) -> None:
        if d == 0:
            out.append(rel)
            return
        for name in sorted(os.listdir(cur)):
            p = os.path.join(cur, name)
            if os.path.isdir(p) and "=" in name and not name.startswith(("_", ".")):
                rec(p, os.path.join(rel, name) if rel else name, d - 1)

    rec(root, "", depth)
    return out


def _find_partition_dir(path: str, partition_cols: list[str], values: tuple) -> str | None:
    """Locate a partition directory by DECODED value comparison, level by
    level (robust to Hive percent-escaping and the NULL marker)."""
    import os

    cur = path
    for col, want in zip(partition_cols, values):
        nxt = None
        if os.path.isdir(cur):
            for name in os.listdir(cur):
                c, v = _decode_part_dir(name)
                if c == col and v == want and os.path.isdir(os.path.join(cur, name)):
                    nxt = os.path.join(cur, name)
                    break
        if nxt is None:
            return None
        cur = nxt
    return cur


def merge_upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    deletes: DataFrame | None = None,
) -> None:
    """MERGE INTO parity without a table format (Workcache write-back,
    Workcache.java:243-424: new→INSERT, changed→UPDATE, deleted→DELETE):
    affected partitions are recomputed as (current rows neither updated nor
    deleted) ∪ (update rows) and committed with a SINGLE data write.
    Untouched partitions keep their files byte-identical.

    ``updates`` must carry the partition columns. ``deletes`` is an optional
    key DataFrame listing rows to drop (the diff protocol's DELETE set).

    Commit protocol (parquet cannot overwrite a path it is reading, and the
    old staging-table double-write cost 2× I/O on every touched partition):
    the merged partitions are written ONCE into an underscore-prefixed
    staging directory INSIDE the destination table (invisible to readers —
    Spark/Hadoop ignore ``_``/``.`` paths), then each staged partition
    directory is swapped into place with a driver-side rename (same
    filesystem by construction; metadata ops at partition count, never row
    count). Per-partition atomic, like Hive/Spark's own dynamic-overwrite
    commit; an Iceberg catalog upgrades this to one atomic multi-partition
    snapshot swap with the SAME single data write.

    A touched partition whose merged row count drops to ZERO has no staged
    directory; its on-disk directory is removed explicitly, located by
    decoded-value matching (Hive percent-escaping / NULL marker safe).
    """
    import os
    import shutil
    import uuid

    current = spark.read.parquet(path)
    touched = updates.select(*partition_cols).dropDuplicates()
    if deletes is not None:
        touched = touched.unionByName(
            current.join(deletes.select(*keys).dropDuplicates(), keys, "left_semi")
            .select(*partition_cols)
            .dropDuplicates()
        ).dropDuplicates()
    kept = (
        current.join(touched, partition_cols, "left_semi")
        .join(updates.select(*keys).dropDuplicates(), keys, "left_anti")
    )
    if deletes is not None:
        kept = kept.join(deletes.select(*keys).dropDuplicates(), keys, "left_anti")
    merged = kept.unionByName(updates.select(*current.columns))
    touched_rows = touched.collect()  # partition-count scale, never row scale

    stage = os.path.join(path, f"_stage_{uuid.uuid4().hex}")
    try:
        write_partitioned(merged, stage, partition_cols, dynamic=False)
        staged_rels = _leaf_partition_dirs(stage, len(partition_cols))
        staged_vals: set[tuple] = set()
        for rel in staged_rels:
            vals = tuple(
                _decode_part_dir(p)[1] for p in rel.split(os.sep)
            )
            staged_vals.add(vals)
            dest = os.path.join(path, rel)
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.rename(os.path.join(stage, rel), dest)
        for row in touched_rows:
            want = tuple(_part_value_str(row[c]) for c in partition_cols)
            if want in staged_vals:
                continue
            gone = _find_partition_dir(path, partition_cols, want)
            if gone is not None:
                shutil.rmtree(gone, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
