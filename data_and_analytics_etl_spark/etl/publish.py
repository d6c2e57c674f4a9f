"""Write–Audit–Publish: stage files, gate on data quality, then commit.

The Iceberg/Netflix WAP pattern mapped onto the engine's versioned
append-only store (etl/versioning.py): because readers pin manifests
(``read_version``), newly written data files are INVISIBLE until
``commit_version`` publishes them — so "staging" needs no second
location. ``write_audit_publish``:

1. **write** the batch into the table directory (append mode; the
   files exist but no manifest references them);
2. **audit** exactly the files this write produced (never the
   DataFrame that was *planned* — recomputation could differ; the
   audit must certify the bytes readers will see) with a
   :func:`~..operators.profile.check_constraints` suite;
3. **publish** via ``commit_version`` when every check's violation
   rate is within bound — or **roll back** by deleting the staged
   files, leaving the store byte-identical to the previous version.

Concurrency inherits the versioning fence: the manifest publishes via
an exclusive link, so two WAP writers cannot corrupt the log. But the
staging DOMAIN is shared — "staged" is computed as on-disk files minus
the last manifest, so a concurrent writer mid-stage (or a crashed
writer's orphans — run ``vacuum_unreferenced`` first) would be swept
into this writer's audit and rollback. Serialize WAP writers per
table, the same fence vacuum draws; the exclusive-link commit protects
the log, not another writer's unpublished bytes.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..operators.profile import check_constraints
from .versioning import _data_files, _manifest, commit_version, list_versions


class QualityGateError(RuntimeError):
    """Audit failed: the staged batch was rolled back, the published
    table is untouched. ``audit`` holds the per-check rows."""

    def __init__(self, msg: str, audit: list):
        super().__init__(msg)
        self.audit = audit


def write_audit_publish(spark: SparkSession, df: DataFrame, path: str,
                        checks: dict[str, Column],
                        max_violation_rate: float = 0.0,
                        fmt: str = "parquet") -> tuple[int, DataFrame]:
    """Stage ``df``, audit the staged files, publish or roll back.

    Returns ``(version, audit_df)`` on success; raises
    :class:`QualityGateError` (staged files removed) on failure.
    The audit DataFrame has check_constraints' shape: one row per
    check — (check, n_rows, n_violations, violation_rate).
    """
    versions = list_versions(path)
    before = set(_manifest(path, versions[-1])) if versions else set()
    df.write.mode("append").format(fmt).save(path)
    staged = [f for f in _data_files(path, fmt) if f not in before]
    if not staged:
        raise ValueError("write produced no data files to audit")
    staged_df = spark.read.format(fmt).load(
        [os.path.join(path, f) for f in staged])
    audit = check_constraints(staged_df, checks)
    audit_rows = audit.collect()  # bounded: one row per declared check
    failed = [r for r in audit_rows
              if r["violation_rate"] is not None
              and r["violation_rate"] > max_violation_rate]
    if failed:
        # roll back through the Hadoop FileSystem API (the merge.py
        # purge rule): os.unlink only works on a POSIX mount; on an
        # object store it would no-op and leave unmanifested garbage
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        for f in staged:
            p = jvm.org.apache.hadoop.fs.Path(
                path.rstrip("/") + "/" + f)
            p.getFileSystem(hconf).delete(p, False)
        names = ", ".join(r["check"] for r in failed)
        raise QualityGateError(
            f"audit failed ({names}); staged batch rolled back, table "
            f"still at version {versions[-1] if versions else 0}",
            audit_rows)
    version = commit_version(path, fmt=fmt)
    return version, audit
