"""Mechanically compute the driver re-verify set for a round window.

VERDICT r05 item #1: "compute the affected set mechanically (entries whose
module files changed since their last green CORRECTNESS round — git diff,
not prose)".  File-level diffing is too coarse — query and operator modules
grow additively every round, so a file-level rule marks ~150/243 entries
stale.  This script diffs at SYMBOL level instead:

  * For each source file at each round's gate ref and at HEAD, hash every
    top-level ``def``, ``class``, and single-name assignment (the
    ``QUERIES = {...}`` dict literal is exploded into one pseudo-symbol per
    entry so an oracle-SQL edit taints exactly that entry).
  * Build a name-reference graph at HEAD (``from X import y`` and
    ``import X as K; K.attr`` both resolve to cross-module edges).
  * An entry is STALE for round N iff its ``QUERIES[name]`` pseudo-symbol
    transitively references any symbol whose hash differs between round
    N's gate state and HEAD.

Conservative fallbacks: a change in a module's non-import residue
(module-level statements that aren't defs/classes/assignments) taints every
symbol in that module; a bare module reference without attribute access is
ignored (the repo's style is ``from pkg import mod as M; M.fn(...)``,
which IS resolved).

Usage:  PYTHONPATH=/root/repo python scripts/compute_reverify.py [--json]
"""

from __future__ import annotations

import ast
import hashlib
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Code state each round's gate checked = parent of the round's artifact commit.
GATE_STATE = {
    1: "f7fefee^",
    2: "ed0df45^",
    3: "027f3bc^",
    4: "62eb1ad^",
    5: "b02210f^",
    6: "c7f6390^",
    7: "b11ac1b^",
    8: "31679e1^",
    9: "011e29f^",
    10: "f8b2ced^",
}

Sym = tuple[str, str]  # (module dotted name, symbol name)


def latest_green() -> dict[str, int]:
    """entry -> latest round where the driver recorded it green."""
    out: dict[str, int] = {}
    for rnd in sorted(GATE_STATE):
        p = REPO / f"CORRECTNESS_r{rnd:02d}.json"
        if not p.exists():
            continue
        for name, row in json.loads(p.read_text()).items():
            if row.get("err"):
                continue
            if row.get("rows_match") and (
                row.get("hash_match") is not False
            ) and (row.get("schema_match") is not False):
                out[name] = rnd
    return out


def git_show(ref: str, path: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{ref}:{path}"],
        cwd=REPO, capture_output=True, text=True,
    )
    return r.stdout if r.returncode == 0 else None


def pkg_files(ref: str) -> list[str]:
    r = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", ref, "hash_db_spark"],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    return [p for p in r.stdout.split() if p.endswith(".py")]


def mod_name(path: str) -> str:
    m = path[:-3].replace("/", ".")
    return m[: -len(".__init__")] if m.endswith(".__init__") else m


def _seg(src: str, node: ast.AST) -> str:
    return ast.get_source_segment(src, node) or ""


def symbol_hashes(src: str, module: str) -> dict[Sym, str]:
    """Hash every top-level symbol; explode QUERIES dict literals per-entry."""
    out: dict[Sym, str] = {}
    try:
        tree = ast.parse(src)
    except SyntaxError:
        out[(module, "<residue>")] = hashlib.sha1(src.encode()).hexdigest()
        return out
    residue: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[(module, node.name)] = hashlib.sha1(
                _seg(src, node).encode()
            ).hexdigest()
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            if len(targets) == 1 and isinstance(targets[0], ast.Name):
                name = targets[0].id
                val = node.value
                if (
                    name in ("QUERIES", "PASSTHROUGH")
                    and isinstance(val, ast.Dict)
                    and all(
                        isinstance(k, ast.Constant) and isinstance(k.value, str)
                        for k in val.keys
                    )
                ):
                    for k, v in zip(val.keys, val.values):
                        out[(module, f"QUERIES[{k.value}]")] = hashlib.sha1(
                            _seg(src, v).encode()
                        ).hexdigest()
                else:
                    out[(module, name)] = hashlib.sha1(
                        _seg(src, node).encode()
                    ).hexdigest()
            else:
                residue.append(_seg(src, node))
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            continue  # resolution changes surface through the symbols they feed
        elif isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # docstring
        else:
            residue.append(_seg(src, node))
    if residue:
        out[(module, "<residue>")] = hashlib.sha1(
            "\n".join(residue).encode()
        ).hexdigest()
    return out


def _names_used(node: ast.AST) -> tuple[set[str], set[tuple[str, str]]]:
    """(bare names loaded, (base, attr) attribute heads) inside a node."""
    bare: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.add((n.value.id, n.attr))
        elif isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
            bare.add(n.id)
    return bare, attrs


def reference_graph(
    files: list[str], read=lambda p: (REPO / p).read_text()
) -> tuple[dict[Sym, set[Sym]], dict[Sym, str]]:
    """HEAD-state symbol graph: edges + hashes, package-internal only."""
    hashes: dict[Sym, str] = {}
    per_mod_syms: dict[str, set[str]] = {}
    parsed: dict[str, tuple[str, ast.Module]] = {}
    for path in files:
        src = read(path)
        module = mod_name(path)
        try:
            parsed[module] = (src, ast.parse(src))
        except SyntaxError:
            continue
        h = symbol_hashes(src, module)
        hashes.update(h)
        per_mod_syms[module] = {s for (_, s) in h}
    edges: dict[Sym, set[Sym]] = {}
    for module, (src, tree) in parsed.items():
        # import alias -> dotted module (package-internal), name -> (mod, sym)
        mod_alias: dict[str, str] = {}
        name_alias: dict[str, Sym] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith("hash_db_spark"):
                        mod_alias[(a.asname or a.name.split(".")[0])] = a.name
            elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith("hash_db_spark"):
                for a in node.names:
                    sub = f"{node.module}.{a.name}"
                    if sub in per_mod_syms:
                        mod_alias[a.asname or a.name] = sub
                    else:
                        name_alias[a.asname or a.name] = (node.module, a.name)

        def resolve(bare: set[str], attrs: set[tuple[str, str]], module=module) -> set[Sym]:
            deps: set[Sym] = set()
            local = per_mod_syms.get(module, set())
            for n in bare:
                if n in local:
                    deps.add((module, n))
                elif n in name_alias:
                    deps.add(name_alias[n])
            for base, attr in attrs:
                if base in mod_alias:
                    deps.add((mod_alias[base], attr))
                elif base in name_alias:
                    deps.add(name_alias[base])  # attr on imported object
            return deps

        src_, tree_ = parsed[module]
        for node in tree_.body:
            syms: list[tuple[Sym, ast.AST]] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                syms.append(((module, node.name), node))
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                if len(targets) == 1 and isinstance(targets[0], ast.Name):
                    name = targets[0].id
                    val = node.value
                    if (
                        name in ("QUERIES", "PASSTHROUGH")
                        and isinstance(val, ast.Dict)
                        and all(
                            isinstance(k, ast.Constant) and isinstance(k.value, str)
                            for k in val.keys
                        )
                    ):
                        for k, v in zip(val.keys, val.values):
                            syms.append(((module, f"QUERIES[{k.value}]"), v))
                    else:
                        syms.append(((module, name), node))
            for sym, n in syms:
                bare, attrs = _names_used(n)
                deps = resolve(bare, attrs)
                # residue taints everything in its module
                if (module, "<residue>") in hashes:
                    deps.add((module, "<residue>"))
                edges[sym] = {d for d in deps if d in hashes and d != sym}
    return edges, hashes


def changed_symbols(ref: str, head_hashes: dict[Sym, str]) -> set[Sym]:
    """Symbols whose hash at HEAD differs from (or is absent relative to
    a present-different definition at) the gate ref."""
    old: dict[Sym, str] = {}
    for path in pkg_files(ref):
        src = git_show(ref, path)
        if src is not None:
            old.update(symbol_hashes(src, mod_name(path)))
    changed = set()
    for sym, h in head_hashes.items():
        if sym in old and old[sym] != h:
            changed.add(sym)
    # deleted symbols: only matter if something at HEAD still referenced
    # them, which resolve() can't produce (they're not in head hashes).
    return changed


def taint(
    roots: dict[str, list[Sym]], edges: dict[Sym, set[Sym]], changed: set[Sym]
) -> set[str]:
    """Entries whose pseudo-symbol transitively reaches a changed symbol.

    Implemented as a reverse-edge BFS from the changed set: a symbol is
    tainted iff it IS changed or any forward path from it hits a changed
    symbol, which is exactly reverse-reachability from ``changed``.  Unlike
    the original memoized DFS (which cached False results computed while
    ancestors were still on the stack, making the answer depend on root
    visit order in cyclic graphs — ADVICE r07 medium), BFS over the
    transposed graph is order-independent and sound in cycles.
    """
    rev: dict[Sym, set[Sym]] = {}
    for sym, deps in edges.items():
        for d in deps:
            rev.setdefault(d, set()).add(sym)
    tainted: set[Sym] = set(changed)
    stack: list[Sym] = list(changed)
    while stack:
        cur = stack.pop()
        for parent in rev.get(cur, ()):
            if parent not in tainted:
                tainted.add(parent)
                stack.append(parent)
    return {e for e, syms in roots.items() if any(s in tainted for s in syms)}


def main() -> None:
    green = latest_green()
    files = pkg_files("HEAD")
    edges, head_hashes = reference_graph(files)
    # entry -> its QUERIES[...] pseudo-symbol, plus the module's plain
    # QUERIES symbol when the registry dict is built by comprehension
    # (ansi_queries: PASSTHROUGH literal + QUERIES comprehension).
    roots: dict[str, list[Sym]] = {}
    for (module, symname) in head_hashes:
        if symname.startswith("QUERIES[") and symname.endswith("]"):
            syms = [(module, symname)]
            if (module, "QUERIES") in head_hashes:
                syms.append((module, "QUERIES"))
            roots[symname[8:-1]] = syms
    missing = [e for e in green if e not in roots]
    if missing:
        print(f"WARNING: green entries with no QUERIES literal found: {missing}")

    stale: dict[str, tuple[int, str]] = {}
    for rnd, ref in GATE_STATE.items():
        ents = [e for e, g in green.items() if g == rnd and e in roots]
        if not ents:
            continue
        ch = changed_symbols(ref, head_hashes)
        t = taint({e: roots[e] for e in ents}, edges, ch)
        for e in t:
            stale[e] = (rnd, "")
    never = sorted(set(roots) - set(green))
    fresh = sorted(set(roots) - set(stale) - set(never))
    by_round: dict[int, int] = {}
    for e, (rnd, _) in stale.items():
        by_round[rnd] = by_round.get(rnd, 0) + 1
    result = {
        "total": len(roots),
        "never_checked": never,
        "stale": sorted(stale, key=lambda e: (stale[e][0], e)),
        "stale_by_round": by_round,
        "fresh": len(fresh),
    }
    if "--json" in sys.argv:
        print(json.dumps(result, indent=1))
    else:
        print(f"total entries: {result['total']}")
        print(f"never driver-checked: {len(never)} {never}")
        print(f"fresh (green + unchanged deps): {len(fresh)}")
        print(f"stale: {len(stale)}  by last-green round: {by_round}")
        for e in result["stale"]:
            print(f"  {e} (green r{stale[e][0]:02d})")


if __name__ == "__main__":
    main()
