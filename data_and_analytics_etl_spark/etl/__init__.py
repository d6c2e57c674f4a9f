"""ETL layer: the Spark-native replacement for the reference's Lambda
dataflow (SURVEY §2.1 Tier A).

Components:
- checkpoint: watermark manifest with write-then-commit ordering
  (ref CommCareAPIHandler.py:87-121, 251-262)
- sink: hourly-partitioned, size-capped batch sink (ref :71-73,
  util.py:43-85)
- ingest: incremental windowed ingest with lag + dual-format timestamp
  normalization (ref :65-69, :158-162, :236-238)
- rest: paginated REST source / per-record REST sink with error budget
  (ref :207-262, :298-326, :44-56)
"""

from .checkpoint import CheckpointManifest  # noqa: F401
from .errors import ErrorBudget, ErrorBudgetExceeded  # noqa: F401
from .ingest import incremental_ingest, normalize_timestamp  # noqa: F401
from .sink import write_partitioned  # noqa: F401
