"""Probe-fingerprint fast-lane invariants (queries/fingerprint.py).

The cache may only ever skip a probe that is TEXTUALLY identical —
these tests pin the reachability properties that make a fingerprint
match safe: function-body imports are seen, transitive imports close,
the substrate is always included, and any reachable file's content
change flips the fingerprint.
"""

from __future__ import annotations

import os

from data_and_analytics_etl_spark.queries import REGISTRY
from data_and_analytics_etl_spark.queries import fingerprint as fp


def _closure_of(probe: str) -> set[str]:
    import inspect
    spec = REGISTRY[probe]
    fn = getattr(spec.fn, "__wrapped__", spec.fn)
    mod = os.path.abspath(inspect.getsourcefile(fn))
    return {os.path.relpath(p, fp.REPO_ROOT) for p in fp._closure(mod)}


def test_function_body_imports_are_reached():
    # drift_ks_exact imports operators.profile INSIDE the probe body;
    # the file-level scan must still see it
    pkg = "data_and_analytics_etl_spark"
    assert f"{pkg}/operators/profile.py" in _closure_of("drift_ks_exact")


def test_transitive_imports_close():
    # llmdata probes -> operators.dedup -> operators.text
    pkg = "data_and_analytics_etl_spark"
    cl = _closure_of("dedup_exact")
    assert f"{pkg}/operators/dedup.py" in cl
    assert f"{pkg}/operators/text.py" in cl


def test_unrelated_modules_stay_out():
    # the TPC-H module must not depend on the profile operators: an
    # edit to drift_ks must never invalidate q1's cache entry
    pkg = "data_and_analytics_etl_spark"
    assert f"{pkg}/operators/profile.py" not in \
        _closure_of("q1_pricing_summary")


def test_substrate_always_in_fingerprint(monkeypatch):
    """catalog.py/session.py/registry.py changes must flip EVERY
    probe's fingerprint even for probes that never import them
    directly."""
    spec = REGISTRY["q1_pricing_summary"]
    before = fp.probe_fingerprint(spec)
    cat = os.path.join(fp.PKG_ROOT, "catalog.py")
    monkeypatch.setitem(fp._file_sha_cache, cat, "0" * 64)
    after = fp.probe_fingerprint(spec)
    assert before != after


def test_reachable_content_change_flips_fingerprint(monkeypatch):
    spec = REGISTRY["drift_ks_exact"]
    before = fp.probe_fingerprint(spec)
    prof = os.path.join(fp.PKG_ROOT, "operators", "profile.py")
    monkeypatch.setitem(fp._file_sha_cache, prof, "f" * 64)
    assert fp.probe_fingerprint(spec) != before


def test_oracle_text_is_part_of_the_fingerprint():
    import copy
    spec = REGISTRY["q1_pricing_summary"]
    before = fp.probe_fingerprint(spec)
    mutated = copy.replace(spec, oracle=spec.oracle + " -- changed") \
        if hasattr(copy, "replace") else None
    if mutated is None:  # dataclasses.replace fallback
        import dataclasses
        mutated = dataclasses.replace(spec, oracle=spec.oracle + " --x")
    assert fp.probe_fingerprint(mutated) != before


def test_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(fp, "CACHE_PATH", str(tmp_path / "c.json"))
    cache = fp.load_cache()
    assert cache == {}
    fp.record_green(cache, "/sf/0.01", "p1", "abcd")
    fp.write_cache(cache)
    again = fp.load_cache()
    assert fp.cached_green(again, "/sf/0.01", "p1", "abcd")
    assert not fp.cached_green(again, "/sf/0.001", "p1", "abcd")
    assert not fp.cached_green(again, "/sf/0.01", "p1", "ffff")


def test_module_object_imports_are_reached():
    """`from . import checkpoint` / `from ..etl import rest_datasource`
    import MODULE OBJECTS: resolving only the package __init__ would
    silently drop the real file from the closure. The imported names
    must resolve as module files too."""
    pkg = "data_and_analytics_etl_spark"
    cl = _closure_of("rest_datasource_scan")
    assert f"{pkg}/etl/rest_datasource.py" in cl
    # ingest.py does `from . import checkpoint, http_transport`
    assert f"{pkg}/etl/checkpoint.py" in cl or \
        f"{pkg}/etl/http_transport.py" in cl


def test_plain_internal_imports_are_reached(tmp_path):
    """`import data_and_analytics_etl_spark.operators.text` (no `from`)
    must enter the closure — r8 advice #2: the one import shape the
    original regex missed would have broken the cache silently the day
    someone introduced it."""
    f = tmp_path / "probe_mod.py"
    f.write_text("import data_and_analytics_etl_spark.operators.text\n")
    fp._closure_cache.clear()
    cl = {os.path.relpath(p, fp.REPO_ROOT)
          for p in fp._closure(str(f))}
    assert "data_and_analytics_etl_spark/operators/text.py" in cl


def test_verifier_is_part_of_every_fingerprint():
    """The comparator (vhash / canon) lives in scripts/verify_probes.py
    and tests/oracle.py; a cached green is a claim about THAT
    comparator, so both files must be in the ALWAYS set — changing the
    comparison logic re-judges every probe (r8 advice #1)."""
    spec = next(iter(REGISTRY.values()))
    before = fp.probe_fingerprint(spec)
    assert os.path.join("scripts", "verify_probes.py") in fp.ALWAYS_REPO
    assert os.path.join("tests", "oracle.py") in fp.ALWAYS_REPO
    # and they actually reach the hash: flip content via the sha cache
    target = os.path.join(fp.REPO_ROOT, "tests", "oracle.py")
    fp._file_sha_cache[target] = "0" * 64
    try:
        assert fp.probe_fingerprint(spec) != before
    finally:
        fp._file_sha_cache.pop(target, None)


def test_no_dynamic_internal_imports_in_package():
    """The closure scan sees `from X import Y` and `import X` only; a
    dynamic importlib/__import__ load of a package-internal module
    would escape it (under-invalidation). Lint: no package file may
    dynamically import by a package-internal literal — external
    transports (etl/rest_datasource.py module:attr strings) stay
    allowed because they name THIRD-PARTY modules."""
    bad = []
    for root, _dirs, files in os.walk(fp.PKG_ROOT):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            with open(path, encoding="utf-8") as f:
                text = f.read()
            for pat in ('import_module("data_and_analytics_etl_spark',
                        "import_module('data_and_analytics_etl_spark",
                        '__import__("data_and_analytics_etl_spark',
                        "__import__('data_and_analytics_etl_spark"):
                if pat in text:
                    bad.append(os.path.relpath(path, fp.REPO_ROOT))
    assert not bad, (
        f"dynamic package-internal imports escape the fingerprint "
        f"closure: {bad} — use a static import instead")
