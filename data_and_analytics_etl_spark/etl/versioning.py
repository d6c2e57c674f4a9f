"""Snapshot versioning over the append-mode partitioned sink: a commit
log of file manifests gives time travel and incremental change reads
without a table-format dependency — Delta's transaction-log idea
reduced to the engine's append-only ETL contract.

The reference's pipeline is append-only by construction (every pull
window writes new hourly objects, CommCareAPIHandler.py:251-258;
nothing is ever rewritten), which is exactly the regime where a file
manifest IS a consistent snapshot:

- ``commit_version`` lists the data files present (a directory walk —
  no data scan, the vacuum/compaction rule) and writes
  ``_versions/v{N}.json``;
- ``read_version`` loads the file set of any committed version, so a
  reader pins the table AS OF a commit while writers keep appending —
  readers never see a torn batch;
- ``read_changes`` loads only files added between two versions — the
  incremental hand-off for downstream consumers (recompute nothing,
  read exactly the delta), the batch analog of a streaming source's
  offset range.

Mutating operations (merge's dynamic overwrite, compaction) REWRITE
files, which invalidates older manifests; ``commit_version`` fences
this by refusing to commit when a previously-manifested file
disappeared — the caller either vacuums the version log first
(``reset_versions``) or keeps mutation and time travel on separate
tables. That honesty is the design: full multi-version concurrency
needs a real table format; bounded append-only time travel needs only
this.
"""

from __future__ import annotations

import json
import os


def _data_files(path: str, fmt: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        if rel_root.startswith("_versions"):
            continue
        for f in files:
            if f.endswith(f".{fmt}") and not f.startswith(("_", ".")):
                rel = os.path.join(rel_root, f).replace(os.sep, "/")
                out.append(rel.removeprefix("./"))
    return sorted(out)


def list_versions(path: str) -> list[int]:
    vdir = os.path.join(path, "_versions")
    if not os.path.isdir(vdir):
        return []
    return sorted(int(f[1:-5]) for f in os.listdir(vdir)
                  if f.startswith("v") and f.endswith(".json"))


def _manifest(path: str, version: int) -> list[str]:
    with open(os.path.join(path, "_versions",
                           f"v{version}.json")) as fh:
        return json.load(fh)["files"]


class ConcurrentCommitError(RuntimeError):
    """Raised when a commit loses the version-slot race more than
    ``max_attempts`` times in a row — the store is untouched and
    readable; the caller retries or serializes its writers."""


def commit_version(path: str, fmt: str = "parquet",
                   max_attempts: int = 16) -> int:
    """Snapshot the current file set as the next version. Refuses to
    commit if a previously-manifested file vanished (a mutation broke
    append-only time travel).

    Concurrent-writer fence: the manifest publishes via an EXCLUSIVE
    link — ``os.link(tmp, v{N}.json)`` atomically fails with EEXIST
    when another writer already owns slot N (a plain rename would
    silently overwrite the winner's manifest, corrupting the log).
    The loser re-lists, re-validates append-only against the NEW
    latest manifest, and retries the next slot; after
    ``max_attempts`` collisions it raises :class:`ConcurrentCommitError`
    with the store intact. Every published v{N}.json is therefore
    complete and written by exactly one writer, interleaving or not
    (tests/test_etl.py races 8 writers through this). The protocol is
    POSIX/HDFS-correct; an S3-style store without atomic
    create-if-absent needs a real table format's commit service —
    exactly the boundary the module docstring draws.
    """
    vdir = os.path.join(path, "_versions")
    os.makedirs(vdir, exist_ok=True)
    import threading
    tmp = os.path.join(
        vdir, f".commit-{os.getpid()}-{threading.get_ident()}.tmp")
    try:
        for _ in range(max_attempts):
            files = _data_files(path, fmt)
            versions = list_versions(path)
            if versions:
                prev = set(_manifest(path, versions[-1]))
                gone = prev - set(files)
                if gone:
                    raise ValueError(
                        "append-only contract violated: files in v"
                        f"{versions[-1]} no longer exist "
                        f"({sorted(gone)[:3]}…); "
                        "run reset_versions() after mutating operations")
            n = (versions[-1] + 1) if versions else 1
            with open(tmp, "w") as fh:
                json.dump({"version": n, "files": files}, fh)
            try:
                os.link(tmp, os.path.join(vdir, f"v{n}.json"))
                return n
            except FileExistsError:
                continue  # lost slot n to a concurrent writer; retry
        raise ConcurrentCommitError(
            f"could not claim a version slot in {max_attempts} "
            f"attempts under {vdir}")
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def reset_versions(path: str) -> None:
    """Drop the version log (after merge/compaction rewrote files)."""
    import shutil
    vdir = os.path.join(path, "_versions")
    if os.path.isdir(vdir):
        shutil.rmtree(vdir)


def read_version(spark, path: str, version: int | None = None,
                 fmt: str = "parquet"):
    """The table AS OF a committed version: reads exactly that
    manifest's files. ``basePath`` keeps hive partition columns."""
    v = version if version is not None else list_versions(path)[-1]
    files = [os.path.join(path, f) for f in _manifest(path, v)]
    if not files:
        raise ValueError(f"version {v} is empty")
    return (spark.read.option("basePath", path).format(fmt)
            .load(files))


def read_changes(spark, path: str, since: int, until: int | None = None,
                 fmt: str = "parquet"):
    """Rows added between two versions: only the delta's files are
    read — the downstream-consumer hand-off (no recompute, no rescan).
    """
    u = until if until is not None else list_versions(path)[-1]
    base = set(_manifest(path, since))
    delta = [os.path.join(path, f) for f in _manifest(path, u)
             if f not in base]
    if not delta:
        return read_version(spark, path, u, fmt).limit(0)
    return (spark.read.option("basePath", path).format(fmt)
            .load(delta))


def vacuum_unreferenced(spark, path: str, fmt: str = "parquet") -> int:
    """Delete data files referenced by NO committed version — Delta's
    VACUUM for this store. Orphans accumulate from writers that died
    between write and commit (the WAP gate rolls back its own staging,
    but a crashed process can't), and from aborted Spark tasks; they
    cost storage and, worse, would get swept into the NEXT
    ``commit_version`` directory listing and silently publish.

    Deletion routes through the Hadoop FileSystem API (the merge.py
    purge rule — os.remove no-ops on object stores and the ghost bytes
    then publish with the next commit, which is a correctness bug, not
    a cost bug). Callers must serialize vacuum with active writers:
    a writer between write and commit looks exactly like an orphan
    (same fence a real table format draws — VACUUM vs retention
    window). Returns the number of files deleted.
    """
    referenced: set[str] = set()
    for v in list_versions(path):
        referenced.update(_manifest(path, v))
    orphans = [f for f in _data_files(path, fmt) if f not in referenced]
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    deleted = 0
    for f in orphans:
        p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + f)
        if p.getFileSystem(hconf).delete(p, False):
            deleted += 1
    return deleted
