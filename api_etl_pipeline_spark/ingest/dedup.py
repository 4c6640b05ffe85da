"""Content hashing + idempotent dedup-insert (SURVEY.md S6/S7/J2, X1/X11).

The reference's `INSERT OR IGNORE` on UNIQUE(source_url, sha256)
(storage/db.py:28,76) becomes a left-anti merge: new rows whose key
already exists in the sink are dropped before the append. The blob
store's write-once `<root>/<sha256[:2]>/<sha256>` layout
(storage/blob_store.py:9-14) becomes a hash-prefix partition column.

Scale notes: the anti-join shuffles on the dedup key — at 100 TB the
existing-keys side should be a key-only projection (two string columns),
which Catalyst reduces to via column pruning; if the sink is huge,
partition it by `blob_bucket` so the merge prunes to matching prefixes.
With a transactional table format this is `MERGE WHEN NOT MATCHED`; on
plain parquet it is read-project-antijoin-append (non-transactional —
known gap vs SQLite atomicity, SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEDUP_KEYS = ("source_url", "sha256")


def with_sha256(df: DataFrame, src: str = "body", out: str = "sha256") -> DataFrame:
    """X1: sha256 hex digest of the body bytes (downloads.py:23-24) plus
    byte count (A5) — one pass, JVM-side."""
    return df.withColumn(out, F.sha2(F.col(src), 256)).withColumn(
        "bytes", F.length(F.col(src)).cast("long")
    )


def blob_bucket(col: Column) -> Column:
    """X11: 2-hex-char fan-out key (blob_store.py:10)."""
    return F.substring(col, 1, 2)


def dedup_insert(new_rows: DataFrame, existing: DataFrame | None, keys=DEDUP_KEYS) -> DataFrame:
    """J2/S6: rows of `new_rows` whose key tuple is absent from `existing`
    — the INSERT OR IGNORE semantics. Also dedupes within the batch
    itself (first occurrence wins is not defined; any one row per key)."""
    batch_unique = new_rows.dropDuplicates(list(keys))
    if existing is None:
        return batch_unique
    return batch_unique.join(
        existing.select(*keys).dropDuplicates(list(keys)), on=list(keys), how="left_anti"
    )


def write_blobs(df: DataFrame, blob_root: str) -> None:
    """S7: content-addressed blob sink — bytes partitioned by hash prefix.
    Write-once semantics (blob_store.py:12-13: skip existing paths) =
    dedupe within the batch AND against the existing sink before the
    append; the 2-char prefix keeps directory fan-out bounded (256 dirs)
    and aligns file layout with the dedup shuffle partitioning."""
    new = df.select(F.col("sha256"), F.col("body")).dropDuplicates(["sha256"])
    try:
        existing = new.sparkSession.read.parquet(blob_root).select("sha256")
    except Exception:
        existing = None
    if existing is not None:
        new = new.join(existing, "sha256", "left_anti")
    (
        new.withColumn("bucket", blob_bucket(F.col("sha256")))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(blob_root)
    )


def merge_upsert(existing: DataFrame | None, updates: DataFrame, keys=DEDUP_KEYS) -> DataFrame:
    """T5 reconciliation MERGE (batch upsert): rows of `existing` whose key
    appears in `updates` are replaced; everything else is kept. This is
    `MERGE WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` emulated
    on plain parquet (delete-and-insert; non-transactional — swap for a
    table format's MERGE where available, SURVEY §7.4)."""
    deduped_updates = updates.dropDuplicates(list(keys))
    if existing is None:
        return deduped_updates
    kept = existing.join(deduped_updates.select(*keys), on=list(keys), how="left_anti")
    return kept.unionByName(deduped_updates)


def reconcile_by_hash(
    existing: DataFrame | None, fresh: DataFrame, keys=("source_url",), hash_col: str = "sha256"
) -> DataFrame:
    """T5: the weekly-archive-rebuild reconciliation (dossier :245-252):
    re-read a window, compare content hashes, and upsert only the rows
    whose hash changed or whose key is new — the idempotent re-ingest
    pattern. Returns the merged table; the changed-row subset is what a
    production job would write."""
    if existing is None:
        return fresh.dropDuplicates(list(keys))
    ex = existing.select(*keys, F.col(hash_col).alias("_existing_hash"))
    changed = (
        fresh.join(ex, on=list(keys), how="left")
        .filter(
            F.col("_existing_hash").isNull() | (F.col(hash_col) != F.col("_existing_hash"))
        )
        .drop("_existing_hash")
    )
    return merge_upsert(existing, changed, keys=keys)
