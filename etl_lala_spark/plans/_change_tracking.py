"""Change-aware recheck pinning: detect queries whose implementing code
changed after their last driver green (round-10 verdict task 1).

The driver materializes a CORRECTNESS row for the first 50 registry
entries per round, so WHICH queries re-earn a hard signal is the
rotation's choice. Staleness by round age alone misses the case that
matters most: a query whose implementing module was refactored AFTER its
last green (e.g. ``sinks/versioned.py`` hardened in r7 while its family's
greens date to r5). This module computes, purely statically, a
DEPENDENCY FINGERPRINT per registered query — the sha256 of the query
function's own source (decorators included, so oracle SQL counts)
plus the source of everything it reaches through ``etl_lala_spark``
imports (function-level granularity within a module, whole-file for
``import module`` style) — and compares today's fingerprint against the
fingerprint at the git tree the driver actually tested (the ``round N:
verdict/...`` boundary commit holds the exact tested code). A mismatch
pins the query into the next driver window.

Everything is derived state: CORRECTNESS_r*.json gives each query's last
green round, ``git show`` gives the tested tree, and the AST gives the
dependency closure — no hand-maintained module->query map to rot. Old
trees' fingerprints are immutable per commit, so they cache in
``_fp_cache.json`` (committed; computed once per boundary commit ever).
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
from collections import deque
from typing import Callable

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_CACHE_PATH = os.path.join(os.path.dirname(__file__), "_fp_cache.json")
_PKG = "etl_lala_spark"

# The files whose @register decorators define the query surface. Derived
# from plans/__init__.py's _PLAN_MODULES at import time (single source of
# truth); files absent in an old tree simply contribute nothing there.


def _plan_files() -> list[str]:
    from etl_lala_spark.plans import _PLAN_MODULES

    return [m.replace(".", "/") + ".py" for m in _PLAN_MODULES]


# --- per-file static model ----------------------------------------------------


class _FileInfo:
    __slots__ = ("rel", "src", "lines", "tree", "top", "imports", "ok")

    def __init__(self, rel: str, src: str | None):
        self.rel = rel
        self.src = src
        self.ok = src is not None
        self.top: dict[str, ast.AST] = {}
        self.imports: dict[str, tuple[str, str | None]] = {}
        self.lines: list[str] = []
        self.tree = None
        if not self.ok:
            return
        try:
            self.tree = ast.parse(src)
        except SyntaxError:
            self.ok = False
            return
        self.lines = src.splitlines()
        pkg_parts = _pkg_parts(rel)
        for node in self.tree.body:
            for name, bound in _import_bindings(node, pkg_parts):
                self.imports[name] = bound
            for name in _defined_names(node):
                self.top[name] = node


def _pkg_parts(rel: str) -> list[str]:
    """The PACKAGE path a module's relative imports resolve against: the
    dotted path minus the module's own name (``operators/web.py`` lives in
    package ``etl_lala_spark.operators``); a package's ``__init__.py`` IS
    its package. ``from . import x`` at level=1 then resolves to
    ``pkg_parts`` itself, level=2 to its parent, etc. Both cases drop the
    final path segment (a module sheds its own name; ``__init__`` sheds
    the marker)."""
    return rel[: -len(".py")].split("/")[:-1]


def _defined_names(node: ast.AST):
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        yield node.name
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                yield t.id
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        yield node.target.id


def _import_bindings(node: ast.AST, pkg_parts: list[str]):
    """Yield (bound_name, (module_dotted, member_or_None)) for imports of
    this package; members are resolved to module-vs-name later, against
    the tree being fingerprinted."""
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.name == _PKG or a.name.startswith(_PKG + "."):
                yield (a.asname or a.name.split(".")[0], (a.name, None))
    elif isinstance(node, ast.ImportFrom):
        if node.level:
            base = pkg_parts[: len(pkg_parts) - node.level + 1]
            mod = ".".join(base + ([node.module] if node.module else []))
        else:
            mod = node.module or ""
        if mod == _PKG or mod.startswith(_PKG + "."):
            for a in node.names:
                if a.name == "*":
                    continue
                yield (a.asname or a.name, (mod, a.name))


def _segment(info: _FileInfo, node: ast.AST) -> str:
    start = node.lineno
    for d in getattr(node, "decorator_list", []) or []:
        start = min(start, d.lineno)
    return "\n".join(info.lines[start - 1 : node.end_lineno])


def _uses(node: ast.AST) -> tuple[dict[str, set[str]], set[str]]:
    """(attr_uses, bare_uses): names used as ``name.attr`` with the set of
    attrs touched, vs names used bare. Lets a ``from pkg.operators import
    text`` alias trace at MEMBER granularity (only the functions actually
    called) instead of pinning on any edit anywhere in the module; a bare
    use of the alias (passed around as an object) falls back to the whole
    module."""
    attrs: dict[str, set[str]] = {}
    attr_base_ids: set[int] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.setdefault(n.value.id, set()).add(n.attr)
            attr_base_ids.add(id(n.value))
    bare = {
        n.id
        for n in ast.walk(node)
        if isinstance(n, ast.Name) and id(n) not in attr_base_ids
    }
    return attrs, bare


def _local_imports(node: ast.AST, pkg_parts: list[str]):
    for n in ast.walk(node):
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            yield from _import_bindings(n, pkg_parts)


# --- fingerprinting one tree --------------------------------------------------


class _Tree:
    """A source tree seen through a read(relpath)->str|None callback —
    the working tree or a git commit — plus the traced-file cache."""

    def __init__(self, read: Callable[[str], str | None]):
        self._read = read
        self._files: dict[str, _FileInfo] = {}

    def file(self, rel: str) -> _FileInfo:
        if rel not in self._files:
            self._files[rel] = _FileInfo(rel, self._read(rel))
        return self._files[rel]

    def resolve_module(self, dotted: str) -> str | None:
        rel = dotted.replace(".", "/")
        for cand in (rel + ".py", rel + "/__init__.py"):
            if self.file(cand).ok:
                return cand
        return None

    def resolve_binding(
        self, bound: tuple[str, str | None]
    ) -> tuple[str, str | None] | None:
        """(module_dotted, member|None) -> (relpath, name|None)."""
        mod, member = bound
        if member is None:
            rel = self.resolve_module(mod)
            return (rel, None) if rel else None
        sub = self.resolve_module(mod + "." + member)
        if sub:
            return (sub, None)  # `from pkg.ops import ml` — ml is a module
        rel = self.resolve_module(mod)
        return (rel, member) if rel else None


def _closure_items(tree: _Tree, rel: str, node: ast.AST) -> list[tuple]:
    """Trace the dependency closure of one top-level def: its own source
    segment, every same-file top-level name it references, and every
    package import it (or its file, for names it references) binds —
    followed transitively across files. Returns (relpath, name, text)."""
    items: list[tuple] = []
    seen: set[tuple] = set()
    work: deque[tuple[str, str | None, ast.AST | None]] = deque()
    work.append((rel, getattr(node, "name", "<node>"), node))
    seen.add((rel, getattr(node, "name", "<node>")))

    def push(item: tuple[str, str | None]):
        if item not in seen:
            seen.add(item)
            work.append((item[0], item[1], None))

    while work:
        frel, fname, fnode = work.popleft()
        info = tree.file(frel)
        if not info.ok:
            items.append((frel, fname or "<module>", "<missing>"))
            continue
        pkg_parts = _pkg_parts(frel)
        if fname is None:
            # whole-module dependency: file content + its package imports
            items.append((frel, "<module>", info.src))
            for bound in info.imports.values():
                r = tree.resolve_binding(bound)
                if r:
                    push(r)
            continue
        if fnode is None:
            fnode = info.top.get(fname)
        if fnode is None:
            bound = info.imports.get(fname)
            if bound:
                r = tree.resolve_binding(bound)
                if r:
                    push(r)
            else:
                items.append((frel, fname, "<unresolved>"))
            continue
        items.append((frel, fname, _segment(info, fnode)))
        attr_uses, bare_uses = _uses(fnode)
        bindings = dict(info.imports)
        bindings.update(dict(_local_imports(fnode, pkg_parts)))

        def push_binding(bname: str, bound: tuple[str, str | None]):
            r = tree.resolve_binding(bound)
            if r is None:
                return
            rel2, member = r
            if member is None and bname not in bare_uses and bname in attr_uses:
                # module alias only ever used as alias.attr: member grain
                for a in sorted(attr_uses[bname]):
                    push((rel2, a))
            else:
                push(r)

        for n in set(bare_uses) | set(attr_uses):
            if n in info.top and info.top[n] is not fnode:
                push((frel, n))
            elif n in bindings:
                push_binding(n, bindings[n])
    return items


def _register_name(node: ast.AST) -> str | None:
    for d in getattr(node, "decorator_list", []) or []:
        if (
            isinstance(d, ast.Call)
            and isinstance(d.func, ast.Name)
            and d.func.id == "register"
            and d.args
            and isinstance(d.args[0], ast.Constant)
            and isinstance(d.args[0].value, str)
        ):
            return d.args[0].value
    return None


def fingerprints(read: Callable[[str], str | None]) -> dict[str, str]:
    """qname -> sha256 dependency fingerprint for every @register-ed query
    findable in the tree behind ``read``."""
    tree = _Tree(read)
    out: dict[str, str] = {}
    for rel in _plan_files():
        info = tree.file(rel)
        if not info.ok:
            continue
        for node in info.tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            qname = _register_name(node)
            if not qname:
                continue
            items = _closure_items(tree, rel, node)
            blob = "\n\x00".join(
                f"{f}:{n}\n{t}" for f, n, t in sorted(items)
            )
            out[qname] = hashlib.sha256(blob.encode()).hexdigest()
    return out


# --- trees: working copy and round-boundary commits ---------------------------


def _working_reader() -> Callable[[str], str | None]:
    def read(rel: str) -> str | None:
        try:
            with open(os.path.join(_REPO, rel), encoding="utf-8") as fh:
                return fh.read()
        except OSError:
            return None

    return read


def _git_reader(sha: str) -> Callable[[str], str | None]:
    def read(rel: str) -> str | None:
        p = subprocess.run(
            ["git", "-C", _REPO, "show", f"{sha}:{rel}"],
            capture_output=True,
            text=True,
        )
        return p.stdout if p.returncode == 0 else None

    return read


def boundary_commits() -> dict[int, str]:
    """round -> sha of the driver's ``round N: verdict/...`` commit, whose
    tree is exactly the code that round's CORRECTNESS rows were run on
    (the judge only adds the report files on top of the tested tree)."""
    p = subprocess.run(
        ["git", "-C", _REPO, "log", "--format=%H%x00%s"],
        capture_output=True,
        text=True,
    )
    if p.returncode != 0:
        return {}
    out: dict[int, str] = {}
    for line in p.stdout.splitlines():
        sha, _, subj = line.partition("\x00")
        m = re.match(r"round (\d+): verdict", subj)
        if m:
            out.setdefault(int(m.group(1)), sha)  # newest-first log
    return out


def _load_cache() -> dict:
    try:
        with open(_CACHE_PATH, encoding="utf-8") as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _store_cache(cache: dict) -> None:
    tmp = _CACHE_PATH + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(cache, fh, indent=0, sort_keys=True)
    os.replace(tmp, _CACHE_PATH)


_CURRENT_MEMO: dict[str, str] | None = None


def stale_queries(last_green_round: dict[str, int]) -> set[str]:
    """Names whose dependency fingerprint today differs from their
    fingerprint at the boundary commit of their last driver-green round —
    i.e. the code under them changed after the evidence was recorded."""
    global _CURRENT_MEMO
    if _CURRENT_MEMO is None:
        _CURRENT_MEMO = fingerprints(_working_reader())
    current = _CURRENT_MEMO
    bounds = boundary_commits()
    cache = _load_cache()
    dirty = False
    stale: set[str] = set()
    for rnd in sorted({r for r in last_green_round.values()}):
        sha = bounds.get(rnd)
        if sha is None:
            continue
        if sha not in cache:
            cache[sha] = fingerprints(_git_reader(sha))
            dirty = True
        old = cache[sha]
        for q, g in last_green_round.items():
            if g != rnd:
                continue
            if q in old and q in current and old[q] != current[q]:
                stale.add(q)
    if dirty:
        try:
            _store_cache(cache)
        except OSError:
            pass
    return stale
