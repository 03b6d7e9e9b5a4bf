"""Unit tests for scripts/compute_reverify.py's taint computation.

ADVICE r07 (medium): the original memoized DFS cached False reachability
results computed while ancestors were still on the DFS stack, so in cyclic
reference graphs the taint set depended on root visit order.  The repro
below is the exact shape from the advice: two entries rooted at the two
halves of a 2-cycle where only one half has an edge to the changed symbol.
The sound answer is that BOTH entries are tainted, regardless of order.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "compute_reverify.py"
spec = importlib.util.spec_from_file_location("compute_reverify", SCRIPT)
_mod = importlib.util.module_from_spec(spec)
sys.modules.setdefault("compute_reverify", _mod)
spec.loader.exec_module(_mod)
taint = _mod.taint

A = ("m", "A")
B = ("m", "B")
C = ("m", "C")
D = ("m", "D")


def test_cycle_taint_is_order_independent():
    # A <-> B cycle; only B has the edge out to the changed symbol C.
    edges = {A: {B}, B: {A, C}, C: set()}
    changed = {C}
    fwd = taint({"e1": [B], "e2": [A]}, edges, changed)
    rev = taint({"e2": [A], "e1": [B]}, edges, changed)
    assert fwd == rev == {"e1", "e2"}


def test_cycle_with_no_path_to_changed_stays_fresh():
    edges = {A: {B}, B: {A}, C: {D}, D: set()}
    fwd = taint({"e1": [A], "e2": [C]}, edges, {D})
    assert fwd == {"e2"}


def test_changed_root_is_tainted_directly():
    assert taint({"e1": [A]}, {}, {A}) == {"e1"}
    assert taint({"e1": [A]}, {}, set()) == set()


def test_three_cycle_all_reach_changed():
    # A -> B -> C(cycle back to A), C -> D changed; every root tainted in
    # every visit order (permutation sweep).
    edges = {A: {B}, B: {C}, C: {A, D}, D: set()}
    import itertools

    roots = {"ea": [A], "eb": [B], "ec": [C]}
    for perm in itertools.permutations(roots):
        got = taint({k: roots[k] for k in perm}, edges, {D})
        assert got == {"ea", "eb", "ec"}, perm
