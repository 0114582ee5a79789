"""Machine-derived driver-sample staleness audit (VERDICT r7 directive #2).

Three rounds of hand-maintained rotation each left a "see-saw remainder":
source/oracle edits landing AFTER the rotation commit on queries the next
driver sample did not cover, so their newest driver row pre-dated their
newest change.  This tool derives staleness from git instead of memory:

  for every registered query:
    spans   = source span of the query fn
            + spans of every package function/class it transitively calls
            + spans of module-level constants it references
            + span of its ORACLES entry (dict literal or subscript assign)
            + spans of constants interpolated into f-string oracles
              (one level, following ImportFrom to the defining module)
    changed = newest commit touching any span (whole-file `git blame
              --line-porcelain`, max committer-time over the span's lines);
              a dirty working-tree file counts as "changed now"
    tested  = snapshot commit of the newest CORRECTNESS_r*.json round whose
              entry for the query is green (hash-green, or the declared
              rows-only non-empty pass); the snapshot is the FIRST PARENT of
              the artifact commit that last touched that CORRECTNESS file,
              because the driver runs verify on the end-of-round snapshot
              and commits artifacts on top
    stale   = `changed` is NOT an ancestor of `tested` (checked by position
              in `git rev-list --first-parent HEAD`; linear history)

Exit contract (CLI): exit 0 iff every stale query is covered by the pending
DRIVER_SAMPLE_PRIORITY (i.e. the next driver round will re-prove it); the
pytest wrapper (tests/test_staleness.py) asserts the same invariant, so the
end-of-round suite run fails loudly if a post-rotation edit escapes the
sample.  `--suggest` prints a stale-first 50-name priority list (stale
queries first, then least-recently-sampled) to seed the next rotation.

Spans are an over-approximation by design: resolving co_names against
package modules can pull in extra helpers, and f-string constant resolution
falls back to a whole-statement span — false "stale" is safe (query gets
re-sampled), false "fresh" is the failure mode this tool exists to kill.
"""

from __future__ import annotations

import ast
import glob
import inspect
import json
import os
import re
import subprocess
import sys
import types
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_DIR = os.path.join(REPO, "redshift_to_lakehouse_migration_spark")
PKG_NAME = "redshift_to_lakehouse_migration_spark"

sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args],
        check=True, capture_output=True, text=True,
    ).stdout


# ---------------------------------------------------------------- git layer

@lru_cache(maxsize=None)
def rev_order() -> dict[str, int]:
    """sha -> position in first-parent history (0 = HEAD = newest)."""
    shas = _git("rev-list", "--first-parent", "HEAD").split()
    return {s: i for i, s in enumerate(shas)}


@lru_cache(maxsize=None)
def blame_lines(relpath: str) -> list[tuple[str, int]]:
    """Per-line (sha, committer_time) for HEAD's version of relpath."""
    out = _git("blame", "--line-porcelain", "HEAD", "--", relpath)
    lines: list[tuple[str, int]] = []
    sha, ctime = None, 0
    meta: dict[str, int] = {}  # sha -> committer-time (porcelain elides dups)
    for ln in out.splitlines():
        if re.match(r"^[0-9a-f]{40} ", ln):
            sha = ln.split()[0]
        elif ln.startswith("committer-time "):
            meta[sha] = int(ln.split()[1])
        elif ln.startswith("\t"):
            lines.append((sha, meta.get(sha, 0)))
    return lines


@lru_cache(maxsize=None)
def docstring_lines(relpath: str) -> frozenset[int]:
    """Line numbers occupied by module/class/function docstrings.
    Docstring edits are non-semantic; without this exclusion a
    documentation pass over a shared helper (e.g. the r8 add_salt
    retry-determinism caveat) would churn its dependent queries into
    the sample for nothing."""
    with open(os.path.join(REPO, relpath)) as f:
        tree = ast.parse(f.read())
    lines: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = getattr(node, "body", [])
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                lines.update(range(body[0].lineno,
                                   body[0].end_lineno + 1))
    return frozenset(lines)


@lru_cache(maxsize=None)
def dirty_files() -> frozenset[str]:
    out = _git("status", "--porcelain")
    paths = set()
    for ln in out.splitlines():
        p = ln[3:]
        if " -> " in p:
            p = p.split(" -> ")[-1]
        paths.add(p.strip().strip('"'))
    return frozenset(paths)


def newest_commit_for_spans(
    spans: set[tuple[str, int, int]],
) -> tuple[str | None, bool]:
    """(newest sha touching any span line, any_span_file_dirty)."""
    order = rev_order()
    best_sha, best_pos = None, len(order) + 1
    dirty = False
    for relpath, start, end in spans:
        if relpath in dirty_files():
            dirty = True
        lines = blame_lines(relpath)
        doc = docstring_lines(relpath)
        for lineno in range(max(1, start), min(end, len(lines)) + 1):
            if lineno in doc:
                continue
            sha, _t = lines[lineno - 1]
            pos = order.get(sha, -1)  # unknown sha: treat as newest
            if pos < best_pos:
                best_sha, best_pos = sha, pos
    return best_sha, dirty


# --------------------------------------------------- correctness-round layer

def round_snapshots() -> dict[int, str]:
    """round number -> snapshot sha the driver tested that round."""
    snaps: dict[int, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rel = os.path.basename(path)
        artifact = _git("log", "-1", "--format=%H", "--", rel).strip()
        if not artifact:
            continue
        snaps[int(m.group(1))] = _git(
            "rev-parse", f"{artifact}^").strip()
    return snaps


def _row_green(row: dict) -> bool:
    if row.get("rows_match") and row.get("hash_match"):
        return True
    # declared rows-only: driver records err=no_oracle with a row count
    return (row.get("err") == "no_oracle"
            and row.get("spark_rows") is not None)


def newest_green_round() -> dict[str, int]:
    """query name -> newest round with a green (or rows-only) driver row."""
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and _row_green(row):
                newest[name] = max(newest.get(name, -1), rnd)
    return newest


# ------------------------------------------------------------- span mapping

def _relpath(path: str) -> str:
    return os.path.relpath(os.path.abspath(path), REPO)


def _in_package(path: str | None) -> bool:
    return bool(path) and os.path.abspath(path).startswith(PKG_DIR + os.sep)


@lru_cache(maxsize=None)
def module_ast_maps(relpath: str) -> tuple[dict, dict, dict]:
    """(defs, oracle_spans, import_from) for one module file.

    defs: top-level NAME -> (start, end, {names referenced within}) for
      both assignments and function/class definitions.
    oracle_spans: oracle key -> (start, end, {names referenced in value}).
      Covers both the `ORACLES = {...}` literal and `ORACLES["k"] = ...`.
    import_from:  local NAME -> (source module relpath, original name).
    """
    with open(os.path.join(REPO, relpath)) as f:
        tree = ast.parse(f.read())
    defs: dict[str, tuple[int, int, frozenset[str]]] = {}
    oracles: dict[str, tuple[int, int, frozenset[str]]] = {}
    imports: dict[str, tuple[str, str]] = {}
    pkg_parts = os.path.dirname(relpath).split(os.sep)

    def value_names(node: ast.AST) -> frozenset[str]:
        return frozenset(
            n.id for n in ast.walk(node) if isinstance(n, ast.Name))

    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.level >= 0:
            if node.level:
                base = pkg_parts[:len(pkg_parts) - (node.level - 1)]
            else:
                base = (node.module or "").split(".")
                if base[:1] != [PKG_NAME]:
                    continue
            mod = ".".join(filter(None, [*base, node.module or ""])) \
                if node.level else (node.module or "")
            mod_rel = mod.replace(".", os.sep)
            for cand in (mod_rel + ".py",
                         os.path.join(mod_rel, "__init__.py")):
                if os.path.exists(os.path.join(REPO, cand)):
                    for alias in node.names:
                        imports[alias.asname or alias.name] = \
                            (cand, alias.name)
                    break
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            defs[node.name] = (
                node.lineno, node.end_lineno, value_names(node))
        if not isinstance(node, ast.Assign):
            continue
        for tgt in node.targets:
            if isinstance(tgt, ast.Name):
                defs[tgt.id] = (
                    node.lineno, node.end_lineno, value_names(node.value))
                if tgt.id == "ORACLES" and isinstance(node.value, ast.Dict):
                    for k, v in zip(node.value.keys, node.value.values):
                        if isinstance(k, ast.Constant):
                            oracles[k.value] = (
                                k.lineno, v.end_lineno, value_names(v))
            elif (isinstance(tgt, ast.Subscript)
                  and isinstance(tgt.value, ast.Name)
                  and tgt.value.id == "ORACLES"
                  and isinstance(tgt.slice, ast.Constant)):
                oracles[tgt.slice.value] = (
                    node.lineno, node.end_lineno, value_names(node.value))
    return defs, oracles, imports


def oracle_spans(name: str) -> set[tuple[str, int, int]]:
    """Spans defining ORACLES[name]: the statement itself plus the
    transitive closure of module-level names it references (constants,
    SQL-builder helpers like `_cos_sql`), followed across ImportFrom."""
    from redshift_to_lakehouse_migration_spark.queries import _MODULES
    spans: set[tuple[str, int, int]] = set()
    work: list[tuple[str, str]] = []  # (module relpath, name)
    seen: set[tuple[str, str]] = set()
    for mod in _MODULES:
        rel = _relpath(mod.__file__)
        _, oracles, _ = module_ast_maps(rel)
        if name not in oracles:
            continue
        start, end, refs = oracles[name]
        spans.add((rel, start, end))
        work.extend((rel, r) for r in refs)
    while work:
        rel, ref = work.pop()
        if (rel, ref) in seen:
            continue
        seen.add((rel, ref))
        defs, _, imports = module_ast_maps(rel)
        if ref in defs:
            start, end, inner = defs[ref]
            spans.add((rel, start, end))
            work.extend((rel, r) for r in inner)
        elif ref in imports:
            src_rel, orig = imports[ref]
            work.append((src_rel, orig))
    return spans


def _code_objects(fn) -> list[types.CodeType]:
    out, work = [], [fn.__code__]
    while work:
        code = work.pop()
        out.append(code)
        work.extend(c for c in code.co_consts
                    if isinstance(c, types.CodeType))
    return out


def _source_span(obj) -> tuple[str, int, int] | None:
    try:
        path = inspect.getsourcefile(obj)
        lines, start = inspect.getsourcelines(obj)
    except (TypeError, OSError):
        return None
    if not _in_package(path):
        return None
    return (_relpath(path), start, start + len(lines) - 1)


def _local_imports(fn) -> list[tuple[object, str]]:
    """(resolved object, original name) for every function-LOCAL
    ImportFrom targeting a package module.  These never appear in
    fn.__globals__ (they bind at call time), so the globals-based name
    resolution is blind to them — `from ..skew import salted_groupby`
    inside a query fn was invisible until this pass (found live: the
    skew.py edit did not mark events_salted_type_totals stale)."""
    import importlib
    import textwrap
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return []
    out: list[tuple[types.ModuleType, object, str]] = []
    mod_parts = fn.__module__.split(".")
    for node in ast.walk(tree):
        if not isinstance(node, ast.ImportFrom):
            continue
        if node.level:
            base = mod_parts[:-node.level]
        else:
            base = []
        target = ".".join(filter(None, [*base, node.module or ""]))
        if not target.startswith(PKG_NAME):
            continue
        try:
            mod = importlib.import_module(target)
        except ImportError:
            continue
        for alias in node.names:
            obj = getattr(mod, alias.name, None)
            if obj is None:
                # `from ..llm import kmeans` where the submodule was never
                # imported in this process: the package has no attribute
                # until the submodule import runs — run it
                try:
                    obj = importlib.import_module(
                        f"{target}.{alias.name}")
                except ImportError:
                    continue
            out.append((mod, obj, alias.name))
    return out


def closure_spans(fn) -> set[tuple[str, int, int]]:
    """Spans of fn + every package function/class it transitively reaches,
    plus module-level constants its code names."""
    spans: set[tuple[str, int, int]] = set()
    seen: set[int] = set()
    work = [fn]
    while work:
        cur = work.pop()
        cur = inspect.unwrap(cur)
        if id(cur) in seen:
            continue
        seen.add(id(cur))
        span = _source_span(cur)
        if span:
            spans.add(span)
        if inspect.isclass(cur):
            for attr in vars(cur).values():
                if callable(attr) or isinstance(
                        attr, (staticmethod, classmethod, property)):
                    inner = getattr(attr, "__func__",
                                    getattr(attr, "fget", attr))
                    if callable(inner):
                        work.append(inner)
            continue
        if not inspect.isfunction(cur):
            continue
        names: set[str] = set()
        for code in _code_objects(cur):
            names.update(code.co_names)
            names.update(code.co_freevars)
        globalns = cur.__globals__
        cells = {}
        if cur.__closure__:
            cells = dict(zip(cur.__code__.co_freevars,
                             (c.cell_contents for c in cur.__closure__
                              if True)))
        pkg_modules: list[types.ModuleType] = []
        mod_rel = _relpath(globalns.get("__file__", "")) \
            if _in_package(globalns.get("__file__")) else None
        for nm in names:
            obj = cells.get(nm, globalns.get(nm))
            if obj is None:
                continue
            if isinstance(obj, types.ModuleType):
                if _in_package(getattr(obj, "__file__", None)):
                    pkg_modules.append(obj)
            elif inspect.isfunction(obj) or inspect.isclass(obj):
                if _in_package(
                        getattr(sys.modules.get(obj.__module__), "__file__",
                                None)):
                    work.append(obj)
            elif mod_rel:
                # module-level constant referenced by name
                defs, _, _ = module_ast_maps(mod_rel)
                if nm in defs:
                    start, end, _refs = defs[nm]
                    spans.add((mod_rel, start, end))
        # function-local `from ..x import y` bindings (not in globals)
        for src_mod, obj, orig in _local_imports(cur):
            if isinstance(obj, types.ModuleType):
                if _in_package(getattr(obj, "__file__", None)):
                    pkg_modules.append(obj)
            elif inspect.isfunction(obj) or inspect.isclass(obj):
                if _in_package(
                        getattr(sys.modules.get(obj.__module__), "__file__",
                                None)):
                    work.append(obj)
            elif _in_package(getattr(src_mod, "__file__", None)):
                # locally-imported module-level constant
                src_rel = _relpath(src_mod.__file__)
                defs, _, _ = module_ast_maps(src_rel)
                if orig in defs:
                    start, end, _refs = defs[orig]
                    spans.add((src_rel, start, end))
        # attribute access through package modules (`quality.run_checks`)
        for mod in pkg_modules:
            m_rel = _relpath(mod.__file__)
            spans.add((m_rel, 0, 0))  # marker: module imported; no lines
            spans.discard((m_rel, 0, 0))
            for nm in names:
                obj = getattr(mod, nm, None)
                if obj is not None and (
                        inspect.isfunction(obj) or inspect.isclass(obj)):
                    work.append(obj)
    return spans


# ----------------------------------------------------------------- audit

SAMPLE_SIZE = 50  # driver samples the first 50 registry entries


def audit() -> tuple[dict[str, dict], dict]:
    """Returns (per-query report, global-span report).

    A span reached by MORE queries than the driver sample holds (e.g.
    session.py's get_spark, tables.py's load) can never be re-proven by
    rotation — a change there would mark >50 queries stale against a
    50-slot sample.  Those "global" spans are the replica's job (the
    in-repo 98/98 oracle run executed on HEAD each round), so they are
    excluded from per-query staleness and reported separately with
    whether they changed after the newest driver snapshot.
    """
    from redshift_to_lakehouse_migration_spark.queries import (
        DRIVER_SAMPLE_PRIORITY, QUERIES)
    order = rev_order()
    snaps = round_snapshots()
    greens = newest_green_round()
    pending = set(DRIVER_SAMPLE_PRIORITY)

    all_spans = {
        name: closure_spans(fn) | oracle_spans(name)
        for name, fn in QUERIES.items()
    }
    coverage: dict[tuple[str, int, int], int] = {}
    for spans in all_spans.values():
        for sp in spans:
            coverage[sp] = coverage.get(sp, 0) + 1
    global_spans = {sp for sp, n in coverage.items() if n > SAMPLE_SIZE}

    report: dict[str, dict] = {}
    for name in QUERIES:
        spans = all_spans[name] - global_spans
        changed_sha, dirty = newest_commit_for_spans(spans)
        rnd = greens.get(name)
        if rnd is None or rnd not in snaps:
            stale = True
            tested_sha = None
        else:
            tested_sha = snaps[rnd]
            # stale iff newest change is strictly newer than the snapshot
            stale = dirty or (
                changed_sha is not None
                and order.get(changed_sha, -1) < order[tested_sha])
        report[name] = {
            "stale": stale,
            "dirty": dirty,
            "changed": (changed_sha or "")[:12],
            "newest_round": rnd,
            "tested_snapshot": (tested_sha or "")[:12],
            "in_pending_sample": name in pending,
            "n_spans": len(spans),
            "n_global_spans": len(all_spans[name] & global_spans),
        }

    newest_snap = snaps[max(snaps)] if snaps else None
    g_changed_sha, g_dirty = newest_commit_for_spans(global_spans)
    global_report = {
        "spans": sorted(
            {f"{p}:{a}-{b}(cov={coverage[(p, a, b)]})"
             for p, a, b in global_spans}),
        "changed": (g_changed_sha or "")[:12],
        "dirty": g_dirty,
        "changed_after_newest_snapshot": bool(
            g_dirty or (g_changed_sha and newest_snap
                        and order.get(g_changed_sha, -1)
                        < order[newest_snap])),
    }
    return report, global_report


def _bench_costs() -> dict[str, float]:
    """Per-query medians for cheap-first tier ordering — missing entries
    sort last within their tier.

    Preferred source: BENCH_FULL_LATEST.json (complete medians map,
    written by every bench run since r8 — the recorder's BENCH_r*.json
    keeps only the last 2000 stdout chars and lost the alphabetically-
    first ~40 medians every round r2–r7).  Fallback: regex name/number
    pairs out of the newest recorder tail, stopping at the
    `entry_started_s` key if present so start OFFSETS cannot overwrite
    medians of the same name."""
    full_path = os.path.join(REPO, "BENCH_FULL_LATEST.json")
    try:
        with open(full_path) as f:
            queries = json.load(f).get("queries", {})
        if queries:
            return {n: float(v) for n, v in queries.items()}
    except (json.JSONDecodeError, OSError, TypeError, ValueError):
        pass
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not paths:
        return {}
    try:
        with open(paths[-1]) as f:
            tail = json.load(f).get("tail", "")
    except (json.JSONDecodeError, OSError):
        return {}
    tail = tail.split('"entry_started_s"')[0]
    return {m.group(1): float(m.group(2)) for m in
            re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)}


def suggest_priority(report: dict[str, dict],
                     size: int = SAMPLE_SIZE) -> list[str]:
    """Stale-first, then least-recently-sampled; cheapest-first within
    each tier (newest bench medians) so an early driver timeout costs
    the fewest rows."""
    from redshift_to_lakehouse_migration_spark.queries import QUERIES
    costs = _bench_costs()
    stale = sorted((n for n in QUERIES if report[n]["stale"]),
                   key=lambda n: costs.get(n, float("inf")))
    rest = sorted((n for n in QUERIES if not report[n]["stale"]),
                  key=lambda n: ((report[n]["newest_round"] or -1),
                                 costs.get(n, float("inf"))))
    return (stale + rest)[:size]


def main(argv: list[str]) -> int:
    report, global_report = audit()
    stale = {n: r for n, r in report.items() if r["stale"]}
    uncovered = {n for n, r in stale.items() if not r["in_pending_sample"]}
    if "--suggest" in argv:
        for n in suggest_priority(report):
            print(n)
        return 0
    if "--json" in argv:
        print(json.dumps({"queries": report, "global": global_report},
                         indent=2))
    else:
        w = max(len(n) for n in report)
        for n, r in sorted(report.items(),
                           key=lambda kv: (not kv[1]["stale"], kv[0])):
            flag = ("STALE" + ("+dirty" if r["dirty"] else "")
                    if r["stale"] else "fresh")
            cover = ("sampled-next" if r["in_pending_sample"]
                     else "NOT-IN-SAMPLE")
            print(f"{n:<{w}}  {flag:<11}  r{r['newest_round']}"
                  f"  changed@{r['changed']}  {cover}")
        print("\nglobal spans (coverage > sample size; replica-gated):")
        for sp in global_report["spans"]:
            print(f"  {sp}")
        print(f"  newest change {global_report['changed']}; "
              f"after newest driver snapshot: "
              f"{global_report['changed_after_newest_snapshot']}"
              + (" (DIRTY)" if global_report["dirty"] else ""))
    print(f"\n{len(stale)} stale / {len(report)} queries; "
          f"{len(uncovered)} stale-and-uncovered", file=sys.stderr)
    return 1 if uncovered else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
