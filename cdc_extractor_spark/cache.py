"""Fixture-keyed artifact cache with atomic-rename publish.

Several queries build derived artifacts from the read-only fixtures —
bucketed table copies, partitioned DPP layouts, binary-blob corpora,
trained ANN indexes.  They are built ONCE per fixture identity and
reused so timed runs measure the query, not setup (the reference, by
contrast, re-extracts per run: WorkerRunnable.java:93-94 rescans the
audit table for every task).

Shared discipline:
- cache key = sha1(realpath + size + mtime_ns of the source fixture
  [+ builder params/version]) — a regenerated fixture or a
  same-basename different path gets a fresh dir, never stale data;
- build into a private staging dir, publish with ONE atomic os.rename
  — concurrent first builds race harmlessly, readers only ever see a
  complete directory;
- on rename failure the loser cleans its staging up, and then VERIFIES
  the destination exists: losing the publish race is fine (the winner's
  dir is there), but any other rename failure (cross-device tempdir,
  permissions) must raise instead of leaving a dangling path that a
  later `CREATE TABLE ... LOCATION` would materialize as a silently
  empty table.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid


def fixture_key(sf_dir: str, table: str, tag: str = "") -> str:
    """Identity hash of one fixture file (+ an optional builder tag)."""
    st = os.stat(os.path.join(sf_dir, f"{table}.parquet"))
    return hashlib.sha1(
        f"{os.path.realpath(sf_dir)}|{tag}|{st.st_size}|{st.st_mtime_ns}"
        .encode()
    ).hexdigest()[:16]


def cache_dir(prefix: str, key: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{key}")


def staging_dir(dest: str) -> str:
    return dest + ".tmp." + uuid.uuid4().hex


def publish_dir(staging: str, dest: str) -> None:
    """Atomically publish ``staging`` as ``dest``; loser cleans up.

    Raises if, after a failed rename, ``dest`` still does not exist —
    i.e. the failure was NOT a lost race to a concurrent winner.
    """
    try:
        os.rename(staging, dest)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.isdir(dest):
            raise


def publish_snapshot(version_dir: str, link_path: str) -> None:
    """Crash-safe snapshot publish for incrementally-maintained state
    (streaming upsert / bitmap partials): ``link_path`` is a SYMLINK
    atomically repointed at the new ``version_dir``.

    The naive two-rename swap (rename current → old, rename new →
    current) has a window where the state path does not exist; a crash
    there makes the next epoch start from nothing and silently drop all
    accumulated state, and a crash before the old-dir cleanup wedges
    every later swap on ENOTEMPTY.  A symlink replace has no such
    window: readers see either the old version or the new one, never
    neither, and a replayed epoch that re-publishes is harmless because
    the merge that produced ``version_dir`` is idempotent.  (On a real
    deployment this pointer is the table format's metadata commit —
    Delta/Iceberg — and versions are its snapshots.)

    Superseded version directories are garbage-collected best-effort
    AFTER the pointer moves; a crash mid-GC leaves orphan versions,
    never a broken pointer.
    """
    prev = os.readlink(link_path) if os.path.islink(link_path) else None
    tmp_link = link_path + ".lnk." + uuid.uuid4().hex
    os.symlink(version_dir, tmp_link)
    os.replace(tmp_link, link_path)  # atomic pointer swap
    if prev and os.path.abspath(prev) != os.path.abspath(version_dir):
        shutil.rmtree(prev, ignore_errors=True)
