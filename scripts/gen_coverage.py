"""Regenerate COVERAGE.md from the registry (the source of truth).

Usage: python scripts/gen_coverage.py  (writes /root/repo/COVERAGE.md)

Kept as a checked-in script (CLAUDE.md previously pointed at a git-log
heredoc) so every round regenerates the inventory the same way.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flexcalc_spark import registry  # noqa: E402


def main() -> None:
    registry.load_all()
    n = len(registry.QUERIES)
    n_oracle = len(registry.ORACLES)
    fams: dict[str, list[str]] = defaultdict(list)
    for key, meta in registry.META.items():
        fams[meta["family"] or "misc"].append(key)

    lines = [
        "# COVERAGE — implemented operator inventory (auto-generated from the registry)",
        "",
        "Regenerate: `python scripts/gen_coverage.py`. Source of truth: "
        "`flexcalc_spark/registry.py`.",
        f"**{n} graded keys, {n_oracle} oracle-checked, {n - n_oracle} rows-only.**",
        "Every key is a `queries()` entry; `oracle` = hash-checked against DuckDB at sf0.01,",
        "`rows-only` = no ANSI-SQL twin exists (hash-seeded sketches / approx / streaming-only",
        "semantics) — each rows-only key has a dedicated recall/equivalence test instead",
        "(tests/test_recall.py, tests/test_streaming.py, tests/test_properties.py).",
        "",
    ]
    for fam in sorted(fams):
        keys = sorted(fams[fam])
        lines.append(f"## {fam} ({len(keys)} keys)")
        lines.append("")
        lines.append("| key | check | 100 TB posture |")
        lines.append("|---|---|---|")
        for key in keys:
            meta = registry.META[key]
            check = "rows-only" if meta["rows_only"] else "oracle"
            notes = meta["scale_notes"] or "—"
            lines.append(f"| `{key}` | {check} | {notes} |")
        lines.append("")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines).rstrip() + "\n")
    print(f"wrote {out}: {n} keys / {n_oracle} oracles / {len(fams)} families")


if __name__ == "__main__":
    main()
