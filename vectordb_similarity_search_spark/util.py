"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame) -> DataFrame:
    """Raise the partition count of a NARROW input to the session's default
    parallelism before a per-row-heavy pass (Arrow ``mapInPandas``, wide
    HOF expression chains).

    Why: Spark parallelizes a narrow pass by *input splits*. A small local
    parquet file scans as 1-2 splits, so an expensive per-document pass
    (MinHash signatures, 64-bit simhash folds, winnowing) runs on a single
    core while 31 sit idle. At production scale the input already carries
    >= cores partitions and this branch is a no-op — no shuffle is added
    where it would hurt. Round-robin repartition is safe here because
    per-row transforms are partitioning-independent.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def swap_snapshot(table_path: str, new_path: str) -> None:
    """Replace the directory at ``table_path`` with ``new_path`` by two
    renames, parking the previous snapshot at ``<table>__old_<uuid>`` until
    the swap completes.

    Honest atomicity note: POSIX cannot atomically exchange two
    directories (no portable renameat2), so there IS a crash window
    between the renames in which ``table_path`` does not exist — but the
    previous snapshot is intact under the ``__old_`` name and
    :func:`restore_snapshot` (called automatically by the writers before
    their next run) brings it back. Data is never lost; readers racing
    the window see a missing path, not a half-written table."""
    import os
    import shutil
    import uuid

    old = f"{table_path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(table_path, old)
    os.rename(new_path, table_path)
    shutil.rmtree(old)


def restore_snapshot(table_path: str) -> bool:
    """Crash recovery for :func:`swap_snapshot`: if ``table_path`` is
    missing and a parked ``__old_`` snapshot exists, restore the newest
    one. Returns True if a restore happened."""
    import glob
    import os

    if os.path.exists(table_path):
        return False
    parked = sorted(glob.glob(f"{table_path.rstrip('/')}__old_*"), key=os.path.getmtime)
    if not parked:
        return False
    os.rename(parked[-1], table_path)
    return True


def evict_other_apps(cache: dict, app_id: str) -> None:
    """Drop cache entries that belong to a DIFFERENT Spark application.

    The per-session plan/model caches (sources/tables._SCAN_CACHE,
    operators/ann._INDEX_SCAN_CACHE, plans' _MODEL_CACHE/_QVEC_CACHE) key
    tuples by ``applicationId`` first. Entries of a stopped session are
    unreachable once a new session starts (fresh appId) but would
    otherwise be pinned for the process lifetime, holding plan objects
    into dead JVM contexts — a leak in any long-lived process that
    restarts sessions. Sweeping on insert keeps exactly one session's
    entries alive."""
    for k in [k for k in cache if isinstance(k, tuple) and k and k[0] != app_id]:
        del cache[k]
