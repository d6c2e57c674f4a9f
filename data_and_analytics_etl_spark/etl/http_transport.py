"""Real HTTP transport for the REST source/sink, plus adaptive page sizing.

Re-expresses the reference's network layer Spark-side:

- ``process_response`` semantics (ref util.py:13-27): 2xx returns parsed
  JSON; anything else raises :class:`HttpError` carrying the status code,
  reason, and response details when the body parses as JSON.
- Bounded error handling (ref CommCareAPIHandler.py:44-56 ``APIErrorMax``):
  the transport retries transient failures (connection errors, 429, 5xx)
  with exponential backoff up to ``max_retries``; permanent 4xx failures
  raise immediately — retrying them would just burn the budget.
- Verb support for the push path (ref :298-305 ``_make_request`` with
  method-from-config, :321): POST/PUT/PATCH with a JSON body.
- Adaptive request sizing (ref util.py:43-85 ``APILimitCalculator``):
  measure a page, then resize the per-request ``limit`` toward a target
  page byte size with a grace factor and a hard cap — expressed here as
  a small pure-arithmetic class each scan PARTITION applies locally
  (the reference resizes once per Lambda; partition-local is the same
  loop at executor granularity).

The transports produced here are plain callables matching the injectable
``Transport`` contract of ``etl/rest.py`` / ``etl/rest_datasource.py``
(``params dict -> envelope dict``), so everything downstream — the
driver-side source, the partition-parallel DataSource, the per-record
sink — works identically over a fake or a live server.

Construct sessions lazily/executor-side (see ``rest_datasource.py``
``module:attr`` resolution): a ``requests.Session`` must never ride a
pickle to a worker.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable

__all__ = [
    "HttpError", "process_response", "HttpTransport", "http_pusher",
    "AdaptiveLimit",
]


class HttpError(Exception):
    """Non-2xx response, with the status code preserved for policy.

    Mirrors the reference's APIError (util.py:20-27): message carries
    code + reason + parsed details when available, ``status_code`` lets
    callers branch (retryable vs permanent).
    """

    def __init__(self, message: str, status_code: int):
        super().__init__(message)
        self.status_code = status_code


def process_response(response) -> dict:
    """2xx -> parsed JSON body; else raise HttpError (ref util.py:13-27)."""
    if response.ok:
        return response.json()
    try:
        details = response.json()
        msg = (f"Request failed! Code: {response.status_code}. "
               f"Reason: {response.reason}. Details: {details}")
    except ValueError:
        msg = f"Request failed! Code: {response.status_code}."
    raise HttpError(msg, response.status_code)


#: Statuses worth retrying: throttling + transient server errors.
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


class HttpTransport:
    """Paginated-GET transport: ``params -> envelope`` over live HTTP.

    One instance per partition/process. Auth follows the reference's
    header scheme (CommCareAPIHandler.py:42-43): ``ApiKey <token>``
    with a JSON content type.

    Retry policy: transient failures (connection errors and
    ``RETRY_STATUSES``) back off exponentially (``backoff * 2**attempt``)
    and retry up to ``max_retries`` times; other HTTP errors raise
    immediately. This subsumes the reference's count-3-then-raise
    (:44-56) but distinguishes retryable from permanent, which the
    reference's blanket counter does not.
    """

    def __init__(self, url: str, token: str | None = None,
                 headers: dict | None = None, timeout: float = 30.0,
                 max_retries: int = 3, backoff: float = 0.2,
                 session=None):
        self.url = url
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff = backoff
        self.headers = {"Content-Type": "application/json"}
        if token:
            self.headers["Authorization"] = f"ApiKey {token}"
        if headers:
            self.headers.update(headers)
        self._session = session

    @property
    def session(self):
        if self._session is None:
            import requests
            self._session = requests.Session()
        return self._session

    def _request_with_retry(self, method: str, url: str, **kwargs) -> dict:
        import requests
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                resp = self.session.request(
                    method, url, headers=self.headers,
                    timeout=self.timeout, **kwargs)
                return process_response(resp)
            except HttpError as e:
                if e.status_code not in RETRY_STATUSES:
                    raise  # permanent (auth, not-found, bad request)
                last = e
            except requests.exceptions.RequestException as e:
                last = e  # connection reset / timeout: transient
            if attempt < self.max_retries:
                time.sleep(self.backoff * (2 ** attempt))
        raise HttpError(
            f"Request failed after {self.max_retries + 1} attempts: {last}",
            getattr(last, "status_code", -1))

    def __call__(self, params: dict) -> dict:
        """GET one page. ``None``-valued params are dropped (the
        reference builds its param dict the same way, :180-200)."""
        clean = {k: v for k, v in params.items() if v is not None}
        return self._request_with_retry("GET", self.url, params=clean)


def http_pusher(url: str, token: str | None = None,
                timeout: float = 30.0, max_retries: int = 3,
                backoff: float = 0.2) -> Callable[[dict], dict]:
    """Build a push callable for ``rest_sink``: one JSON request per row.

    The sink hands it ``{"method": m, "payload": row}``; the verb comes
    from config exactly as the reference's ``request_method`` does
    (CommCareAPIHandler.py:321); POST/PUT/PATCH all flow through the
    same retry/response policy as the GET path (:298-305).
    """
    # The returned closure is typically shipped to executors
    # (rest_sink.foreachPartition); embed this module in the pickle so
    # workers outside the repo can unpickle HttpTransport. Guarded: when
    # this function itself runs inside a worker that received the module
    # BY VALUE (e.g. RestWriter.__init__ on the Python planner), the
    # module key is absent from sys.modules — nothing to register then,
    # the closure is already travelling by value.
    import sys

    from pyspark import cloudpickle
    _mod = sys.modules.get(__name__)
    if _mod is not None:
        cloudpickle.register_pickle_by_value(_mod)

    transport = HttpTransport(url, token=token, timeout=timeout,
                              max_retries=max_retries, backoff=backoff)

    def push(req: dict) -> dict:
        method = req.get("method", "POST").upper()
        if method not in ("POST", "PUT", "PATCH"):
            raise ValueError(f"unsupported push method {method!r}")
        return transport._request_with_retry(
            method, url, json=req.get("payload"))

    return push


class AdaptiveLimit:
    """Resize the per-request row ``limit`` toward a target page size.

    The reference's APILimitCalculator (util.py:43-85): given the byte
    size of a page fetched at ``current_limit``, the next limit is

        int((target_mb / measured_mb) * current_limit * grace)

    capped at ``max_limit`` — target 16 MB (a downstream-loader ceiling),
    grace 0.5 (headroom for record-size variance), cap 10_000. Bytes
    convert at 1 MB = 1e6 (the reference's arithmetic, :66).

    Stateless arithmetic — each scan partition measures its own first
    page and applies the result to subsequent requests.
    """

    def __init__(self, target_mb: float = 16.0, grace: float = 0.5,
                 max_limit: int = 10_000):
        self.target_mb = target_mb
        self.grace = grace
        self.max_limit = max_limit

    def new_limit(self, current_limit: int, measured_bytes: int) -> int:
        size_mb = measured_bytes / 1_000_000
        if size_mb <= 0:
            return self.max_limit
        raw = (self.target_mb / size_mb) * float(current_limit)
        return max(1, min(int(raw * self.grace), self.max_limit))

    @staticmethod
    def measure(envelope: dict) -> int:
        """Page size proxy: the JSON-serialized envelope byte length
        (the reference measures the S3 object it just wrote; the
        serialized envelope is the same payload one hop earlier)."""
        return len(json.dumps(envelope).encode("utf-8"))
