"""Property-based tests (hypothesis) for the engine's pure contracts.

Pure-Python properties run at full example counts; properties that
need a Spark job batch all generated data into ONE DataFrame per
example and cap examples, keeping the suite fast.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from data_and_analytics_etl_spark.operators.sampling import _hex_threshold


class TestHexThreshold:
    @given(st.floats(min_value=0.0, max_value=1.0))
    def test_threshold_is_monotone_in_frac(self, frac):
        lower = _hex_threshold(max(0.0, frac - 1 / 256))
        assert _hex_threshold(frac) >= lower

    @given(st.integers(min_value=0, max_value=256))
    def test_quantization_roundtrip(self, k):
        t = _hex_threshold(k / 256)
        if k >= 256:
            assert t == "g0"  # sorts after every 2-hex bucket
        else:
            assert int(t, 16) == k

    @given(st.floats(min_value=0.0, max_value=1.0))
    def test_threshold_sorts_correctly_vs_all_buckets(self, frac):
        # strict '<' against the threshold keeps exactly round(256*frac)
        # of the 256 equally-likely buckets
        t = _hex_threshold(frac)
        kept = sum(1 for b in range(256) if format(b, "02x") < t)
        assert kept == round(frac * 256)


def _morton_decode(z: int, n: int, bits: int) -> tuple[int, ...]:
    vals = [0] * n
    for b in range(bits):
        for i in range(n):
            vals[i] |= ((z >> (b * n + i)) & 1) << b
    return tuple(vals)


class TestMortonKey:
    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                    min_size=1, max_size=50, unique=True))
    def test_interleave_is_bijective(self, pairs):
        from data_and_analytics_etl_spark.operators.layout import zorder_key
        from data_and_analytics_etl_spark.session import get_spark
        spark = get_spark("prop-morton")
        df = spark.createDataFrame(pairs, ["x", "y"])
        rows = df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")], bits=8)).collect()
        for r in rows:
            assert _morton_decode(r["z"], 2, 8) == (r["x"], r["y"])


def _funnel_reference(events, stages):
    """Brute-force per-user funnel over (user, ts, type) tuples."""
    out = {}
    by_user = {}
    for u, ts, typ in events:
        by_user.setdefault(u, []).append((ts, typ))
    for u, evs in by_user.items():
        evs.sort()
        times, last = [], None
        for stage in stages:
            cand = [t for t, typ in evs
                    if typ == stage and (last is None or t > last)]
            if not cand:
                break
            last = min(cand)
            times.append(last)
        if times:
            out[u] = times
    return out


class TestFunnelProperty:
    @settings(max_examples=5, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 5),                      # user
                  st.integers(0, 10_000),                 # ts offset sec
                  st.sampled_from(["view", "click", "buy", "other"])),
        min_size=1, max_size=120, unique=True))
    def test_matches_bruteforce_reference(self, raw):
        from data_and_analytics_etl_spark.operators.funnel import (
            funnel_stages)
        from data_and_analytics_etl_spark.session import get_spark
        spark = get_spark("prop-funnel")
        base = dt.datetime(2024, 1, 1)
        events = [(u, base + dt.timedelta(seconds=s), t) for u, s, t in raw]
        stages = ["view", "click", "buy"]
        want = _funnel_reference(events, stages)
        df = spark.createDataFrame(events, ["user_id", "ts", "event_type"])
        got = {}
        for r in funnel_stages(df, "user_id", "ts", "event_type",
                               stages).collect():
            ts = [r["t1"], r["t2"], r["t3"]]
            got[r["user_id"]] = [t for t in ts if t is not None]
            assert r["stage"] == len(got[r["user_id"]])
        assert got == want
