"""Live-HTTP tests for the REST transport tier.

A stdlib ``http.server`` fixture plays the API: paginated GET envelopes,
fault injection (transient 503s, permanent 404s, throttling 429s), and
a POST/PATCH sink that records received payloads. The reference's
network behaviors (process_response, retry budget, verb-from-config —
util.py:13-27, CommCareAPIHandler.py:44-56, :298-321) are asserted
against real sockets, not mocks.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from data_and_analytics_etl_spark.etl.http_transport import (AdaptiveLimit,
                                                             HttpError,
                                                             HttpTransport,
                                                             http_pusher)

TOTAL = 25  # rows the fake API serves


class _ApiHandler(BaseHTTPRequestHandler):
    """Envelope-serving fake API with scripted failures."""

    server_version = "FakeAPI/1.0"

    def log_message(self, *a):  # silence test output
        pass

    def _send(self, code: int, body: dict | str, json_body: bool = True):
        data = (json.dumps(body) if json_body else str(body)).encode()
        self.send_response(code)
        self.send_header("Content-Type",
                         "application/json" if json_body else "text/plain")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        state = self.server.state
        state["gets"].append(q)
        if url.path == "/flaky":
            # first two calls fail transiently, third succeeds
            state["flaky_calls"] += 1
            if state["flaky_calls"] <= 2:
                self._send(503, {"error": "warming up"})
                return
        elif url.path == "/throttle":
            state["throttle_calls"] += 1
            if state["throttle_calls"] <= 1:
                self._send(429, {"error": "slow down"})
                return
        elif url.path == "/missing":
            self._send(404, {"error": "no such endpoint"})
            return
        elif url.path == "/broken":
            self._send(500, "not json at all", json_body=False)
            return
        # paginated data: ids [cursor, cursor+limit) of the requested
        # window [lo, hi) — defaults to [0, TOTAL) (the DataSource's
        # partition-parallel pull sends lo/hi per sub-window)
        win_hi = int(q.get("hi", TOTAL))
        lo = int(q.get("cursor") or q.get("lo") or 0)
        limit = int(q.get("limit", 10))
        hi = min(lo + limit, win_hi)
        objects = [{"id": i, "k": (i * 31) % 97} for i in range(lo, hi)]
        self._send(200, {"meta": {"next": str(hi) if hi < win_hi else "",
                                  "limit": limit},
                         "objects": objects})

    def _sink(self, method: str):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n)) if n else None
        self.server.state["pushed"].append((method, payload))
        self._send(200, {"ok": True, "method": method})

    def do_POST(self):
        self._sink("POST")

    def do_PATCH(self):
        self._sink("PATCH")

    def do_PUT(self):
        self._sink("PUT")


@pytest.fixture()
def api_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    srv.state = {"gets": [], "pushed": [], "flaky_calls": 0,
                 "throttle_calls": 0}
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base, srv.state
    finally:
        srv.shutdown()
        srv.server_close()


class TestTransport:
    def test_paginated_get_walks_all_pages(self, api_server):
        base, state = api_server
        t = HttpTransport(f"{base}/data")
        seen, cursor = [], None
        while True:
            env = t({"limit": 10, "cursor": cursor})
            seen.extend(o["id"] for o in env["objects"])
            cursor = env["meta"]["next"] or None
            if not cursor:
                break
        assert seen == list(range(TOTAL))
        assert len(state["gets"]) == 3  # 10 + 10 + 5

    def test_auth_and_content_headers_sent(self, api_server):
        base, _ = api_server
        t = HttpTransport(f"{base}/data", token="sekrit")
        assert t.headers["Authorization"] == "ApiKey sekrit"
        assert t.headers["Content-Type"] == "application/json"
        t({"limit": 5})  # and the server accepts them

    def test_none_params_dropped(self, api_server):
        base, state = api_server
        HttpTransport(f"{base}/data")({"limit": 5, "cursor": None})
        assert "cursor" not in state["gets"][-1]

    def test_transient_5xx_retried_until_success(self, api_server):
        base, state = api_server
        t = HttpTransport(f"{base}/flaky", backoff=0.01)
        env = t({"limit": 10})
        assert env["objects"]          # succeeded on third attempt
        assert state["flaky_calls"] == 3

    def test_429_throttling_retried(self, api_server):
        base, state = api_server
        t = HttpTransport(f"{base}/throttle", backoff=0.01)
        assert t({"limit": 10})["objects"]
        assert state["throttle_calls"] == 2

    def test_permanent_4xx_raises_immediately(self, api_server):
        base, state = api_server
        t = HttpTransport(f"{base}/missing", backoff=0.01)
        with pytest.raises(HttpError) as ei:
            t({"limit": 10})
        assert ei.value.status_code == 404
        assert "no such endpoint" in str(ei.value)  # JSON details surfaced
        assert state["gets"][-1]  # exactly one attempt...
        assert sum(1 for _ in state["gets"]) == 1

    def test_retry_budget_exhausts_with_http_error(self, api_server):
        base, _ = api_server
        t = HttpTransport(f"{base}/broken", max_retries=2, backoff=0.01)
        with pytest.raises(HttpError) as ei:
            t({"limit": 10})
        assert "after 3 attempts" in str(ei.value)

    def test_connection_error_retries_then_raises(self):
        # nothing listens on this port
        t = HttpTransport("http://127.0.0.1:1/data", max_retries=1,
                          backoff=0.01, timeout=0.5)
        with pytest.raises(HttpError):
            t({"limit": 1})


class TestPusher:
    def test_post_and_patch_deliver_payloads(self, api_server):
        base, state = api_server
        push = http_pusher(f"{base}/sink")
        push({"method": "POST", "payload": {"id": 1, "v": "a"}})
        push({"method": "PATCH", "payload": {"id": 2, "v": "b"}})
        assert state["pushed"] == [("POST", {"id": 1, "v": "a"}),
                                   ("PATCH", {"id": 2, "v": "b"})]

    def test_unsupported_verb_rejected(self, api_server):
        base, _ = api_server
        push = http_pusher(f"{base}/sink")
        with pytest.raises(ValueError):
            push({"method": "DELETE", "payload": {}})

    def test_rest_sink_pushes_rows_through_live_server(self, api_server,
                                                       spark):
        from data_and_analytics_etl_spark.etl.rest import rest_sink
        base, state = api_server
        df = spark.range(6).selectExpr("id", "id * 2 AS v").coalesce(2)
        rest_sink(df, http_pusher(f"{base}/sink"), method="POST")
        got = sorted(p["id"] for _, p in state["pushed"])
        assert got == list(range(6))


class TestRestSourceOverHttp:
    def test_rest_source_end_to_end(self, api_server, spark):
        from data_and_analytics_etl_spark.etl.rest import rest_source
        base, _ = api_server
        df = rest_source(spark, HttpTransport(f"{base}/data"),
                         params={"limit": 10}, schema="id bigint, k bigint")
        rows = sorted(r.id for r in df.collect())
        assert rows == list(range(TOTAL))

    def test_datasource_write_pushes_per_record(self, api_server, spark):
        """`df.write.format("rest")` — the declarative push path: every
        row lands on the live server as one JSON request."""
        from data_and_analytics_etl_spark.etl.rest_datasource import register
        base, state = api_server
        register(spark)
        df = spark.range(5).selectExpr("id", "id * 3 AS v").coalesce(2)
        (df.write.format("rest")
         .option("transport", "http").option("url", f"{base}/sink")
         .option("method", "POST").mode("append").save())
        got = sorted(p["id"] for _, p in state["pushed"])
        assert got == list(range(5))
        assert all(m == "POST" for m, _ in state["pushed"])

    def test_datasource_http_transport_partition_parallel(self, api_server,
                                                          spark):
        """`format("rest").option("transport", "http")`: N partitions
        pull N sub-windows from a LIVE server concurrently; the union
        must equal the synthetic-transport scan of the same window."""
        from data_and_analytics_etl_spark.etl.rest_datasource import register
        base, state = api_server
        register(spark)
        df = (spark.read.format("rest")
              .option("transport", "http").option("url", f"{base}/data")
              .option("start", 0).option("end", TOTAL)
              .option("limit", 7).option("num_partitions", 3).load())
        rows = sorted(map(tuple, df.collect()))
        assert rows == [(i, (i * 31) % 97) for i in range(TOTAL)]
        # every request carried a sub-window, not the full range
        windows = {(g.get("lo"), g.get("hi")) for g in state["gets"]
                   if "hi" in g}
        assert len(windows) >= 3


class TestAdaptiveLimit:
    """The reference's APILimitCalculator arithmetic (util.py:43-85)."""

    def test_halves_toward_target_with_grace(self):
        # 8 MB page at limit 5000: (16/8) * 5000 * 0.5 = 5000
        assert AdaptiveLimit().new_limit(5000, 8_000_000) == 5000

    def test_oversized_page_shrinks_limit(self):
        # 32 MB page at limit 1000: (16/32) * 1000 * 0.5 = 250
        assert AdaptiveLimit().new_limit(1000, 32_000_000) == 250

    def test_tiny_page_grows_limit(self):
        # 0.1 MB at limit 100: (16/0.1) * 100 * 0.5 = 8000 < cap
        assert AdaptiveLimit().new_limit(100, 100_000) == 8000

    def test_cap_applies(self):
        # 0.05 MB at limit 100 -> 16000, capped at 10000
        assert AdaptiveLimit().new_limit(100, 50_000) == 10_000

    def test_floor_is_one(self):
        assert AdaptiveLimit().new_limit(1, 1_000_000_000) == 1

    def test_measure_is_serialized_length(self):
        env = {"meta": {"next": ""}, "objects": [{"id": 1}]}
        assert AdaptiveLimit.measure(env) == len(json.dumps(env).encode())


class TestDataSourceAdaptive:
    def test_adaptive_scan_resizes_after_first_page(self, spark):
        """Synthetic transport through the DataSource with adaptive=true:
        rows must be identical to the static scan (sizing only changes
        page boundaries, never content)."""
        from data_and_analytics_etl_spark.etl.rest_datasource import register
        register(spark)
        static = (spark.read.format("rest").option("transport", "synthetic")
                  .option("start", 0).option("end", 500)
                  .option("limit", 20).option("num_partitions", 2).load())
        adaptive = (spark.read.format("rest").option("transport", "synthetic")
                    .option("start", 0).option("end", 500)
                    .option("limit", 20).option("num_partitions", 2)
                    .option("adaptive", "true").option("target_mb", "0.001")
                    .load())
        assert sorted(map(tuple, static.collect())) == \
            sorted(map(tuple, adaptive.collect()))

    def test_adaptive_limit_persists_across_runs(self, spark, tmp_path):
        """Cross-run state reuse (ref CommCareAPIHandler.py:96-121): run 1
        measures and stores its adapted limit in the checkpoint manifest;
        run 2's reader must SEED from the stored value instead of
        re-probing from the default."""
        from data_and_analytics_etl_spark.etl.checkpoint import \
            CheckpointManifest
        from data_and_analytics_etl_spark.etl.rest_datasource import (
            RestReader, register)
        register(spark)
        root = str(tmp_path)
        opts = {"transport": "synthetic", "start": "0", "end": "500",
                "limit": "20", "num_partitions": "2",
                "adaptive": "true", "target_mb": "0.001",
                "checkpoint_root": root, "dataset": "events"}
        run1 = spark.read.format("rest").options(**opts).load()
        rows1 = sorted(map(tuple, run1.collect()))
        stored = CheckpointManifest(root, "events").read_api_limit()
        assert stored is not None and stored != 20  # measured + persisted
        # second run: no explicit limit -> reader seeds from the manifest
        opts2 = {k: v for k, v in opts.items() if k != "limit"}
        seeded = RestReader(opts2)
        assert seeded.limit == stored
        run2 = spark.read.format("rest").options(**opts2).load()
        assert sorted(map(tuple, run2.collect())) == rows1
        # an explicit limit option still wins over the stored seed
        explicit = RestReader({**opts2, "limit": "7"})
        assert explicit.limit == 7
        # and the watermark commit path preserves the stored limit
        import datetime as dt
        m = CheckpointManifest(root, "events")
        m.commit(dt.datetime(2024, 1, 1), rows=5)
        assert m.read_api_limit() == stored
        assert m.read_watermark() == dt.datetime(2024, 1, 1)

    def test_param_options_reach_every_request(self, spark, monkeypatch):
        """`param.<name>` options must ride every request — the archived-
        records/config-switch analog (ref :32-39,185-188)."""
        from data_and_analytics_etl_spark.etl import rest_datasource as rd
        seen: list[dict] = []

        def spy(params):
            seen.append(dict(params))
            return rd.synthetic_transport(params)

        # patch BEFORE constructing: built-in transports resolve in
        # __init__ (driver-side) since the foreign-cwd pickling fix
        monkeypatch.setattr(rd, "resolve_transport",
                            lambda spec, cfg=None: spy)
        reader = rd.RestReader({"transport": "synthetic", "start": "0",
                                "end": "50", "limit": "25",
                                "param.include_archived": "true",
                                "param.specifier": "x"})
        rows = list(reader.read(rd.WindowPartition(0, 50)))
        assert len(rows) == 50
        assert seen, "spy transport never called"
        assert all(p["include_archived"] == "true" for p in seen)
        assert all(p["specifier"] == "x" for p in seen)


_FOREIGN_CWD_SCRIPT = r"""
import sys, threading, json
sys.path.insert(0, "@REPO@")
from http.server import BaseHTTPRequestHandler, HTTPServer

class H(BaseHTTPRequestHandler):
    def _reply(self, body):
        self.send_response(200)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)
    def do_GET(self):
        from urllib.parse import urlparse, parse_qs
        q = parse_qs(urlparse(self.path).query)
        lo = int(q.get('cursor', q.get('lo', ['0']))[0])
        hi = int(q.get('hi', ['20'])[0])
        limit = int(q.get('limit', ['5'])[0])
        ph = min(lo + limit, hi)
        self._reply(json.dumps(
            {"meta": {"next": str(ph) if ph < hi else ""},
             "objects": [{"id": i, "k": (i * 31) % 97}
                         for i in range(lo, ph)]}).encode())
    def do_POST(self):
        self.rfile.read(int(self.headers.get('Content-Length', 0)))
        self._reply(b'{"ok": true}')
    def log_message(self, *a): pass

srv = HTTPServer(('127.0.0.1', 0), H)
threading.Thread(target=srv.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{srv.server_address[1]}/api"

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[2]')
         .config('spark.ui.enabled', 'false').getOrCreate())
from data_and_analytics_etl_spark.etl.rest_datasource import register
register(spark)
df = (spark.read.format("rest").option("transport", "http")
      .option("url", url).option("start", 0).option("end", 40)
      .option("limit", 7).option("num_partitions", 4).load())
rows = df.collect()
assert len(rows) == 40 and all(r.k == (r.id * 31) % 97 for r in rows)
out = spark.createDataFrame([(1, 2), (3, 4)], "id bigint, k bigint")
(out.write.format("rest").option("transport", "http").option("url", url)
 .option("method", "POST").mode("append").save())
print("FOREIGN_CWD_OK")
"""


def test_http_transport_from_foreign_cwd(tmp_path):
    """The r3-advice scenario: Python planner/executor workers do NOT
    share the driver's sys.path, so any runtime package import inside
    the DataSource dies with ModuleNotFoundError when the launch
    directory isn't the repo. pytest masks this (workers inherit the
    repo cwd) — so drive the whole read+write in a subprocess from a
    temp cwd, with only an explicit sys.path insert on the DRIVER."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c",
         _FOREIGN_CWD_SCRIPT.replace("@REPO@", repo)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FOREIGN_CWD_OK" in proc.stdout
