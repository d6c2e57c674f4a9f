"""Incremental-ingest checkpoint manifest.

The reference persists its watermark as a bare ``last_successful_job_time``
txt object in S3 next to the data (CommCareAPIHandler.py:75-79, 87-94,
105-112) and advances it only AFTER every page of the window has landed
(:251-262) — at-least-once delivery with downstream dedup expected.

This manifest keeps those semantics, engine-side:
- one small JSON file per dataset under ``<root>/_checkpoint/``;
- `commit()` is called by the ingest driver strictly after the sink write
  returns (write-then-commit — a crash between the two replays the
  window, it never loses it);
- commits are atomic (temp file + rename) so a torn write can't corrupt
  the watermark.

State is tiny (one timestamp + run metadata), deliberately NOT a Spark
dataset: it is read/written by the driver once per run, exactly like the
reference's txt object.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

ISO = "%Y-%m-%dT%H:%M:%S.%f"


class CheckpointManifest:
    def __init__(self, root: str, dataset: str):
        self.dir = os.path.join(root, "_checkpoint")
        self.path = os.path.join(self.dir, f"{dataset}.json")

    def read_watermark(self) -> dt.datetime | None:
        """Last committed window end, or None on first run
        (ref NoSuchKey -> skip dataset, CommCareAPIHandler.py:268-272 —
        here: full-history initial load instead)."""
        try:
            with open(self.path) as f:
                state = json.load(f)
        except FileNotFoundError:
            return None
        return dt.datetime.strptime(state["watermark"], ISO)

    def commit(self, watermark: dt.datetime, **meta) -> None:
        """Atomically persist the new watermark (write-then-commit: the
        caller must have finished writing data for the window first).
        Merges over existing state so orthogonal keys (``api_limit``)
        survive watermark advances."""
        self._merge({"watermark": watermark.strftime(ISO), **meta})

    def read_api_limit(self) -> int | None:
        """Stored adaptive page-size limit from the previous run, or None.

        The reference persists ``api_limit`` next to its watermark and
        seeds the next run's first request from it
        (CommCareAPIHandler.py:96-103,114-121); this is that key in the
        same manifest.
        """
        v = self.history().get("api_limit")
        return int(v) if v is not None else None

    def store_api_limit(self, limit: int) -> None:
        """Persist the last computed page limit for the next run's seed.

        Safe to call from the one designated scan task (rest_datasource
        stores from the FIRST window partition only): the write is an
        atomic rename, and it merges so a concurrent driver-side
        ``commit`` can't be lost — last writer wins per key.
        """
        self._merge({"api_limit": int(limit)})

    def _merge(self, updates: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        state = self.history()
        state.update(updates)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f)
            os.replace(tmp, self.path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def history(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}
