"""Mechanical re-pin bookkeeping (VERDICT r6 tasks #5/#7).

Builds a static call/reference graph over the whole
``cdc_extractor_spark`` package — nodes are module-level functions,
classes, and constants; edges are textual references (bare names
within a module, ``alias.attr`` across modules) — and fingerprints
every node by the SHA-1 of its source segment.

The driver-green ledger rule: a query's driver-green CORRECTNESS row
stays creditable only while every node REACHABLE from its query
function (plus its oracle SQL string) is byte-identical to the state
at the window freeze.  ``tests/test_window_bookkeeping.py`` compares
the committed baseline (``tests/helper_fingerprints.json``, written at
each round's freeze with ``python -m tests.helper_graph --write``)
against the working tree: any drifted node forces every dependent
driver-green query into DRIVER_WINDOW (or an explicit REPINS entry),
so stale driver credit cannot survive a refactor unnoticed.

Textual reference matching is deliberately CONSERVATIVE (docstring
mentions create edges too): false edges only ever force an extra
re-pin, never hide one.
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import json
import pkgutil
import re
import types
from pathlib import Path

PACKAGE = "cdc_extractor_spark"
BASELINE = Path(__file__).parent / "helper_fingerprints.json"


def _sha(text: str) -> str:
    return hashlib.sha1(text.encode()).hexdigest()


def _package_modules() -> dict[str, types.ModuleType]:
    pkg = importlib.import_module(PACKAGE)
    mods = {PACKAGE: pkg}
    for info in pkgutil.walk_packages(pkg.__path__, prefix=PACKAGE + "."):
        mods[info.name] = importlib.import_module(info.name)
    return mods


def _source_of(obj) -> str | None:
    for candidate in (obj, getattr(obj, "func", None)):
        if candidate is None:
            continue
        try:
            return inspect.getsource(candidate)
        except (OSError, TypeError):
            continue
    return None


def _resolve_from(mname: str, node: ast.ImportFrom) -> str | None:
    """Absolute module path an ``ImportFrom`` pulls from (PEP 328)."""
    if node.level == 0:
        return node.module
    parts = mname.split(".")
    # a module's level-1 base is its own package (parts[:-1])
    base = parts[: len(parts) - node.level]
    if not base:
        return None
    return ".".join(base + ([node.module] if node.module else []))


def build_graph():
    """Return (fingerprints, edges): ``{node_id: sha}`` and
    ``{node_id: set(node_id)}``.  node_id = "module:Name"."""
    mods = _package_modules()
    node_src: dict[str, str] = {}
    mod_names: dict[str, dict[str, str]] = {}  # module -> {name: node_id}
    mod_trees: dict[str, tuple[str, ast.Module | None]] = {}

    # pass 1: defined functions/classes + module-level constants
    for mname, mod in mods.items():
        names: dict[str, str] = {}
        for aname, obj in vars(mod).items():
            if isinstance(obj, types.ModuleType):
                continue
            owner = getattr(obj, "__module__", None)
            if owner is None and hasattr(obj, "func"):  # pandas_udf
                owner = getattr(obj.func, "__module__", None)
            if owner != mname:
                continue
            src = _source_of(obj)
            if src is None:
                continue
            nid = f"{mname}:{aname}"
            node_src[nid] = src
            names[aname] = nid
        try:
            msrc = inspect.getsource(mod)
            tree = ast.parse(msrc)
        except (OSError, SyntaxError):
            msrc, tree = "", None
        mod_trees[mname] = (msrc, tree)
        if tree is not None:
            # module-level constants (BASE_MS, DDL strings, thresholds)
            # — values a function body only NAMES, so they need their
            # own fingerprint node
            for stmt in tree.body:
                targets = []
                if isinstance(stmt, ast.Assign):
                    targets = [
                        t.id for t in stmt.targets if isinstance(t, ast.Name)
                    ]
                elif isinstance(stmt, ast.AnnAssign) and isinstance(
                    stmt.target, ast.Name
                ):
                    targets = [stmt.target.id]
                seg = ast.get_source_segment(msrc, stmt) or ""
                for t in targets:
                    if t.startswith("__") or t in names:
                        continue
                    nid = f"{mname}:{t}"
                    node_src[nid] = seg
                    names[t] = nid
        mod_names[mname] = names

    # pass 2: imports — module aliases (``from .functions import dedup``,
    # including FUNCTION-LOCAL ``from .sources import pyds``) and
    # imported object names (``from .sources.changes import changes_df``)
    mod_aliases: dict[str, dict[str, str]] = {}
    mod_imported: dict[str, dict[str, str]] = {}  # localname -> node_id
    for mname in mods:
        aliases: dict[str, str] = {}
        imported: dict[str, str] = {}
        _, tree = mod_trees[mname]
        if tree is not None:
            for node in ast.walk(tree):
                if not isinstance(node, ast.ImportFrom):
                    continue
                base = _resolve_from(mname, node)
                if base is None or not base.startswith(PACKAGE):
                    continue
                for al in node.names:
                    local = al.asname or al.name
                    submod = f"{base}.{al.name}"
                    if submod in mods:
                        aliases[local] = submod
                    elif al.name in mod_names.get(base, {}):
                        imported[local] = mod_names[base][al.name]
        # module objects bound at module level (``import x`` forms)
        for aname, obj in vars(mods[mname]).items():
            if isinstance(obj, types.ModuleType) and obj.__name__.startswith(
                PACKAGE
            ):
                aliases.setdefault(aname, obj.__name__)
        mod_aliases[mname] = aliases
        mod_imported[mname] = imported

    # pass 3: textual reference edges
    edges: dict[str, set[str]] = {}
    for nid, src in node_src.items():
        mname = nid.split(":", 1)[0]
        out: set[str] = set()
        local = {**mod_names.get(mname, {}), **mod_imported.get(mname, {})}
        for name, target in local.items():
            if target == nid:
                continue
            if re.search(rf"(?<![\w.]){re.escape(name)}\b", src):
                out.add(target)
        for alias, tmod in mod_aliases.get(mname, {}).items():
            for m in re.finditer(
                rf"(?<![\w.]){re.escape(alias)}\.(\w+)", src
            ):
                target = mod_names.get(tmod, {}).get(m.group(1))
                if target:
                    out.add(target)
        edges[nid] = out

    fingerprints = {nid: _sha(src) for nid, src in node_src.items()}
    return fingerprints, edges


def query_reach(edges) -> dict[str, list[str]]:
    """{query_name: sorted reachable node_ids} from each registered
    query function (the query node itself included)."""
    from cdc_extractor_spark import queries as qmod

    out: dict[str, list[str]] = {}
    qmodname = qmod.__name__
    # map function object -> node id by name lookup in queries module
    fn_node = {}
    for aname, obj in vars(qmod).items():
        if callable(obj) and getattr(obj, "__module__", None) == qmodname:
            fn_node[obj] = f"{qmodname}:{aname}"
    for qname, fn in qmod.QUERIES.items():
        start = fn_node.get(fn)
        reach: set[str] = set()
        stack = [start] if start else []
        while stack:
            cur = stack.pop()
            if cur in reach:
                continue
            reach.add(cur)
            stack.extend(edges.get(cur, ()))
        out[qname] = sorted(reach)
    return out


def oracle_fingerprints() -> dict[str, str]:
    from cdc_extractor_spark.queries import ORACLES

    return {name: _sha(sql) for name, sql in ORACLES.items()}


def driver_green() -> list[str]:
    """Names with a full-hash-green row in any committed
    CORRECTNESS_r*.json artifact.  Only git-TRACKED artifacts count
    (ADVICE r7): an untracked/unreviewed artifact sitting in the
    worktree at ``--write`` time must not silently grant frozen
    credit.  Falls back to the plain glob only when git itself is
    unavailable (e.g. an exported tree)."""
    import glob
    import json as _json
    import subprocess

    repo = Path(__file__).parent.parent
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        files = [str(repo / line) for line in out.split()]
    except (OSError, subprocess.CalledProcessError):
        files = sorted(glob.glob(str(repo / "CORRECTNESS_r*.json")))
    green: set[str] = set()
    for f in files:
        for name, rec in _json.load(open(f)).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                green.add(name)
    return sorted(green)


def snapshot() -> dict:
    """Freeze-time state: fingerprints + reach graph + the green-credit
    ledger AS OF THE FREEZE.  The bookkeeping tests read credit from
    the committed baseline, not the live artifacts, so a new
    CORRECTNESS_r{N}.json landing mid-round doesn't silently flip the
    window/ledger invariants — credit only moves at the next explicit
    ``--write`` (each round's window freeze)."""
    fingerprints, edges = build_graph()
    return {
        "nodes": fingerprints,
        "query_reach": query_reach(edges),
        "oracles": oracle_fingerprints(),
        "driver_green": driver_green(),
    }


if __name__ == "__main__":
    import sys

    snap = snapshot()
    if "--write" in sys.argv:
        BASELINE.write_text(json.dumps(snap, indent=0, sort_keys=True))
        print(
            f"wrote {BASELINE}: {len(snap['nodes'])} nodes, "
            f"{len(snap['query_reach'])} queries"
        )
    else:
        print(
            f"{len(snap['nodes'])} nodes, "
            f"{len(snap['query_reach'])} queries (dry run; --write to save)"
        )
