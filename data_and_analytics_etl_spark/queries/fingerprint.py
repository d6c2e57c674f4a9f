"""Probe fingerprints: the changed-probe-only fast lane (r7 verdict
task 8).

At 304 probes a full DuckDB-oracle sweep costs ~30 minutes, growing
linearly with the registry. The fix is a content-addressed cache: each
probe's fingerprint hashes every source file that could change its
result — the module DEFINING the probe (covers the probe body, its
module-level helpers, and the oracle text), the package-internal
IMPORT CLOSURE of that module (covers the operators/etl/streaming code
the probe executes), and the always-shared substrate (catalog.py,
session.py, the registry wrapper). A probe whose fingerprint matches a
committed green record is provably textually identical to the version
that earned the record, so re-running it buys nothing; any edit to any
reachable file changes the fingerprint and forces a re-run.

Deliberately COARSE in one direction (editing one probe in a module
invalidates every probe in that module — a re-run of a file's worth of
probes costs minutes, not the half hour of the full registry) and
NEVER stale in the other (there is no dynamic dispatch in the probe
call graph: probes reach code only through imports this scan sees).

The cache (VERIFY_CACHE.json, committed) is keyed (sf_dir, probe) ->
fingerprint and written ONLY by scripts/verify_probes.py after a green
comparison; tests/test_queries.py consults it unless
FULL_ORACLE_SWEEP=1 (the round-close invocation, which re-earns every
record).
"""

from __future__ import annotations

import hashlib
import json
import os
import re

PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPO_ROOT = os.path.dirname(PKG_ROOT)
CACHE_PATH = os.path.join(REPO_ROOT, "VERIFY_CACHE.json")

#: substrate every probe runs through regardless of imports
ALWAYS = ("catalog.py", "session.py", os.path.join("queries",
                                                   "registry.py"))

#: the VERIFIER itself (comparison logic, canonical value hash) — a
#: cached green is a claim about a specific comparator, so changing
#: the comparator must invalidate every record and force a re-judge
#: under the new standard (r8 advice #1). Repo-root-relative.
ALWAYS_REPO = (os.path.join("scripts", "verify_probes.py"),
               os.path.join("tests", "oracle.py"))

#: Internal imports must match one of these two shapes; a third shape
#: (importlib strings, __import__) would escape the closure scan —
#: tests/test_fingerprint.py lints the package for strays (r8 advice
#: #2: under-invalidation is the one failure mode this cache must
#: never have).
_IMPORT_PAT = re.compile(
    r"^\s*from\s+(\.{1,2}[\w\.]*|data_and_analytics_etl_spark[\w\.]*)"
    r"\s+import\s+([\w\s,()]*)", re.MULTILINE)
#: Captures the FULL module list of a plain-import line so comma forms
#: (`import os, data_and_analytics_etl_spark.operators.text`) can't
#: escape the closure scan (r9 advice #5) — the consumer greps the
#: captured tail for package modules.
_PLAIN_IMPORT_PAT = re.compile(
    r"^\s*import\s+([\w\.\s,]+)", re.MULTILINE)
_PKG_MODULE_PAT = re.compile(r"data_and_analytics_etl_spark[\w\.]*")

_file_sha_cache: dict[str, str] = {}
_closure_cache: dict[str, frozenset[str]] = {}


def _sha(path: str) -> str:
    if path not in _file_sha_cache:
        with open(path, "rb") as f:
            _file_sha_cache[path] = hashlib.sha256(f.read()).hexdigest()
    return _file_sha_cache[path]


def _resolve(ref: str, from_dir: str) -> str | None:
    """Dotted import ref -> package .py file path (or None if external
    / not a file we track). `.x` resolves against the importing file's
    directory, `..x` against its parent, absolute against the repo."""
    if ref.startswith("data_and_analytics_etl_spark"):
        parts = ref.split(".")[1:]
        base = PKG_ROOT
    elif ref.startswith(".."):
        parts = [p for p in ref[2:].split(".") if p]
        base = os.path.dirname(from_dir)
    else:  # single leading dot
        parts = [p for p in ref[1:].split(".") if p]
        base = from_dir
    cand = os.path.join(base, *parts) + ".py" if parts else None
    if cand and os.path.isfile(cand):
        return cand
    # `from .. import x` / module-package imports -> __init__.py
    init = os.path.join(base, *parts, "__init__.py")
    return init if os.path.isfile(init) else None


def _closure(path: str) -> frozenset[str]:
    """Package-internal import closure of a source file (BFS over the
    import statements' resolved files)."""
    if path in _closure_cache:
        return _closure_cache[path]
    seen: set[str] = set()
    frontier = [path]
    while frontier:
        p = frontier.pop()
        if p in seen:
            continue
        seen.add(p)
        with open(p, encoding="utf-8") as f:
            text = f.read()
        for m in _PLAIN_IMPORT_PAT.finditer(text):
            for mod in _PKG_MODULE_PAT.findall(m.group(1)):
                dep = _resolve(mod, os.path.dirname(p))
                if dep and dep not in seen:
                    frontier.append(dep)
        for m in _IMPORT_PAT.finditer(text):
            ref, names = m.group(1), m.group(2)
            dep = _resolve(ref, os.path.dirname(p))
            if dep and dep not in seen:
                frontier.append(dep)
            # `from . import checkpoint` / `from ..etl import
            # rest_datasource`: the imported NAMES may themselves be
            # module files under the referenced package — resolving
            # only the package's __init__.py would silently drop the
            # real dependency from the closure (under-invalidation,
            # the one failure mode the cache must never have)
            for name in re.findall(r"\w+", names):
                sub = _resolve(ref.rstrip(".") + "." + name
                               if not ref.endswith(".")
                               else ref + name, os.path.dirname(p))
                if sub and sub not in seen:
                    frontier.append(sub)
    out = frozenset(seen)
    _closure_cache[path] = out
    return out


def probe_fingerprint(spec) -> str:
    """Content fingerprint of a registered QuerySpec: defining module +
    import closure + substrate + oracle text."""
    import inspect

    fn = getattr(spec.fn, "__wrapped__", spec.fn)
    mod_file = inspect.getsourcefile(fn)
    files: set[str] = set()
    if mod_file and os.path.isfile(mod_file):
        files |= _closure(os.path.abspath(mod_file))
    for rel in ALWAYS:
        p = os.path.join(PKG_ROOT, rel)
        if os.path.isfile(p):
            files.add(p)
    for rel in ALWAYS_REPO:
        p = os.path.join(REPO_ROOT, rel)
        if os.path.isfile(p):
            files.add(p)
    h = hashlib.sha256()
    for p in sorted(files):
        h.update(os.path.relpath(p, REPO_ROOT).encode())
        h.update(_sha(p).encode())
    h.update((spec.oracle or "<rows-only>").encode())
    return h.hexdigest()[:16]


def load_cache() -> dict:
    if not os.path.exists(CACHE_PATH):
        return {}
    with open(CACHE_PATH) as f:
        return json.load(f)


def cached_green(cache: dict, sf_dir: str, name: str,
                 fingerprint: str) -> bool:
    return cache.get(sf_dir, {}).get(name) == fingerprint


def record_green(cache: dict, sf_dir: str, name: str,
                 fingerprint: str) -> None:
    cache.setdefault(sf_dir, {})[name] = fingerprint


def write_cache(cache: dict) -> None:
    with open(CACHE_PATH, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
