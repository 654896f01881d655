"""Detect registered keys whose plan source changed since a git rev.

Usage:
    python scripts/detect_changed_keys.py <base-rev> [--mark]

For every key in the registry, compares the key's decorated plan
function (decorators included — the oracle SQL lives there) AND every
same-module helper function reachable from it (AST call graph, the
q_rfm_approx-via-_rfm case) between <base-rev> and the WORKING TREE.
Keys that differ are the candidates for `rotate_grade_order.py
--mark-changed` (VERDICT r13 #2: a key whose plan or oracle changed
after its latest driver grade has effectively zero evidence).

`--mark` marks every detected key via mark_changed (stamped with the
current working round), then prints the rotation reminder. The base
rev MUST be the immediately-preceding round's end-of-round snapshot:
with that base, any detected change happened THIS round, so marking
at the current round is exact. An OLDER base over-marks — it flags
keys changed AND validly re-graded in between, fronting them
needlessly.

Limitations (stated, not silent): cross-MODULE helpers (e.g. a shared
function in tables.py) are not traced — a change there should be
marked by hand for the keys it feeds; decorator-level constants
defined at module scope (grids, literal banks) are traced only if
referenced via a function chain. When in doubt, mark by hand — an
extra marker costs one re-grade; a missed one costs a round of false
evidence (the r13 q_rfm case).
"""

from __future__ import annotations

import ast
import inspect
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _module_fdefs(tree: ast.Module) -> dict[str, ast.FunctionDef]:
    """MODULE-LEVEL functions only (tree.body, not ast.walk): a nested
    def sharing a top-level helper's name must not shadow it — nested
    defs are already covered by their enclosing function's span (r14
    review; binaryfiles.py alone has 4 nested 'mapper' defs)."""
    return {
        n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
    }


def _functions_of(src: str) -> dict[str, str]:
    """name -> decorated source span per module-level function."""
    out: dict[str, str] = {}
    lines = src.split("\n")
    for node in _module_fdefs(ast.parse(src)).values():
        start = min(
            [node.lineno] + [d.lineno for d in node.decorator_list]
        )
        out[node.name] = "\n".join(lines[start - 1:node.end_lineno])
    return out


def _reachable(
    fdefs: dict[str, ast.FunctionDef], root: str
) -> set[str]:
    """root plus every same-module module-level function transitively
    REFERENCED from it. Collects every ast.Name matching a module
    function — not just call-position names — because Arrow kernels
    are passed BY REFERENCE (applyInPandas(_sessionize_pdf, ...),
    mapInPandas(fn, ...)) and a call-only walk misses them entirely
    (r14 review: _reachable('q_stateful_sessions') came back as just
    the root while all its logic lives in the referenced kernel)."""
    seen: set[str] = set()

    def walk(name: str) -> None:
        if name in seen or name not in fdefs:
            return
        seen.add(name)
        for node in ast.walk(fdefs[name]):
            if isinstance(node, ast.Name) and node.id in fdefs:
                walk(node.id)
            elif (isinstance(node, ast.Attribute)
                  and node.attr in fdefs):
                walk(node.attr)

    walk(root)
    return seen


def _git_show(rev: str, rel: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{rev}:{rel}"],
        capture_output=True, text=True, cwd=REPO,
    )
    return r.stdout if r.returncode == 0 else None


def detect(base_rev: str) -> list[tuple[str, int, str]]:
    """(key, latest_evidence_round, via) for keys whose reachable plan
    source differs between base_rev and the working tree."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from rotate_grade_order import latest_evidence

    import flexcalc_spark.registry as reg

    reg.load_all()
    latest = latest_evidence()

    # group keys by module file so each file is read/parsed once
    by_file: dict[str, list[tuple[str, str]]] = {}
    for k, fn in reg.QUERIES.items():
        f = fn
        while hasattr(f, "__wrapped__"):
            f = f.__wrapped__
        rel = os.path.relpath(inspect.getmodule(f).__file__, REPO)
        by_file.setdefault(rel, []).append(
            (k, f.__qualname__.split(".")[0])
        )

    changed: list[tuple[str, int, str]] = []
    for rel, keys in sorted(by_file.items()):
        new_src = open(os.path.join(REPO, rel)).read()
        old_src = _git_show(base_rev, rel)
        new_fns = _functions_of(new_src)
        old_fns = _functions_of(old_src) if old_src is not None else {}
        fdefs = _module_fdefs(ast.parse(new_src))  # parse ONCE per file
        for k, root in keys:
            hits = sorted(
                n
                for n in _reachable(fdefs, root)
                if old_fns.get(n) != new_fns.get(n)
            )
            if old_src is None or hits:
                changed.append(
                    (k, latest.get(k, 0),
                     "new file" if old_src is None else ", ".join(hits))
                )
    return changed


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 1:
        raise SystemExit(
            "usage: detect_changed_keys.py <base-rev> [--mark]"
        )
    base = args[0]
    changed = detect(base)
    if not changed:
        print(f"no registered key's plan source changed vs {base}")
        return 0
    print(f"keys whose plan source changed vs {base}:")
    stale = []
    for k, ev, via in sorted(changed):
        print(f"  {k}  [evidence r{ev}]  via: {via}")
        stale.append(k)
    if "--mark" in sys.argv:
        from rotate_grade_order import mark_changed

        import flexcalc_spark.registry as reg

        mark_changed(stale, list(reg.QUERIES), REPO)
        print(f"marked changed: {', '.join(stale)}")
        print("now run: python scripts/rotate_grade_order.py --apply")
    else:
        print(
            "mark with: python scripts/rotate_grade_order.py "
            "--mark-changed " + " ".join(stale)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
