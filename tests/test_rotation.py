"""The GRADE_ORDER rotation tool (scripts/rotate_grade_order.py):
VERDICT r11/r12 both flagged the hand-applied rotation as a logistics
hazard; these tests pin the automated policy so the one-command flow
stays trustworthy across rounds."""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from rotate_grade_order import (  # noqa: E402
    REGISTRY,
    format_literal,
    latest_evidence,
    read_grade_order,
    rotate,
)


def test_current_order_is_the_rotation_fixed_point():
    """The checked-in GRADE_ORDER must BE the stalest-first rotation of
    itself under the checked-in CORRECTNESS history — i.e. the applied
    rotation and the tool agree (this is how the round-12 hand-built
    order was validated against the script, both directions)."""
    order = read_grade_order(open(REGISTRY).read())
    latest = latest_evidence()
    assert rotate(order, latest) == order, (
        "GRADE_ORDER is stale for the CORRECTNESS history on disk "
        "(expected right after the driver drops a new CORRECTNESS_r*.json)"
        " — run: python scripts/rotate_grade_order.py --apply"
    )
    assert len(order) == len(set(order))


def test_rotation_policy_synthetic():
    """Never-graded keys lead; evidence tiers ascend; relative order is
    preserved inside each tier (the round-10 tail-append policy)."""
    order = ["a", "b", "c", "d", "e", "f"]
    latest = {"a": 9, "b": 6, "c": 9, "d": 6, "f": 7}  # e never graded
    got = rotate(order, latest)
    assert got == ["e", "b", "d", "f", "a", "c"]


def test_literal_roundtrip():
    """format_literal output parses back to the identical list (the
    rewrite path cannot corrupt the registry)."""
    order = read_grade_order(open(REGISTRY).read())
    lit = format_literal(order)
    parsed = ast.literal_eval(lit.split("=", 1)[1])
    assert parsed == order


def test_apply_rewrites_registry_and_comment(tmp_path, monkeypatch):
    """--apply must leave a parseable registry whose GRADE_ORDER is the
    expected permutation AND regenerate the descriptive comment (the
    hand-written 'Round-N front' paragraph would otherwise go stale)."""
    import shutil

    import rotate_grade_order as rgo

    tmp_reg = tmp_path / "registry.py"
    shutil.copy(rgo.REGISTRY, tmp_reg)
    order = read_grade_order(open(rgo.REGISTRY).read())
    # fabricate evidence that moves the current front-2 to the back
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    fake[order[1]] = 99
    monkeypatch.setattr(rgo, "REGISTRY", str(tmp_reg))
    monkeypatch.setattr(rgo, "latest_evidence", lambda: fake)
    monkeypatch.setattr(sys, "argv", ["rotate_grade_order.py", "--apply"])
    assert rgo.main() == 0
    new_src = open(tmp_reg).read()
    new_order = read_grade_order(new_src)      # also proves it parses
    assert new_order == order[2:] + order[:2]
    assert "Rotation applied by scripts/rotate_grade_order.py" in new_src
    assert "Round-12 front" not in new_src      # stale paragraph gone
    ast.parse(new_src)


def test_apply_twice_leaves_one_comment_block(tmp_path, monkeypatch):
    """ADVICE r12: the regeneration used to strip only '# Round-' blocks,
    so each --apply appended another 'Rotation applied by' block while
    the previous one went stale in place. Two applies must leave exactly
    one tool-owned block (fails on the pre-fix code: two blocks)."""
    import shutil

    import rotate_grade_order as rgo

    tmp_reg = tmp_path / "registry.py"
    shutil.copy(rgo.REGISTRY, tmp_reg)
    order = read_grade_order(open(rgo.REGISTRY).read())
    monkeypatch.setattr(rgo, "REGISTRY", str(tmp_reg))
    monkeypatch.setattr(sys, "argv", ["rotate_grade_order.py", "--apply"])
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: fake)
    assert rgo.main() == 0
    fake2 = dict(fake)
    fake2[order[1]] = 98
    monkeypatch.setattr(rgo, "latest_evidence", lambda: fake2)
    assert rgo.main() == 0
    new_src = open(tmp_reg).read()
    assert new_src.count("Rotation applied by") == 1
    assert read_grade_order(new_src) == order[2:] + [order[1], order[0]]
    ast.parse(new_src)


def test_apply_with_last_key_quoted_above_literal(tmp_path, monkeypatch):
    """ADVICE r12: lit_end used to be computed from the FIRST file-wide
    occurrence of the quoted last key — a quoted mention above the
    GRADE_ORDER literal made the splice land before lit_start and corrupt
    the file (fails on the pre-fix code: garbled duplicate assignment)."""
    import shutil

    import rotate_grade_order as rgo

    tmp_reg = tmp_path / "registry.py"
    shutil.copy(rgo.REGISTRY, tmp_reg)
    order = read_grade_order(open(rgo.REGISTRY).read())
    src = open(tmp_reg).read()
    # plant a quoted mention of the last key ABOVE the literal
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = f'_DOC_NOTE = "{order[-1]}"  # planted mention\n'
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    monkeypatch.setattr(rgo, "REGISTRY", str(tmp_reg))
    monkeypatch.setattr(sys, "argv", ["rotate_grade_order.py", "--apply"])
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: fake)
    assert rgo.main() == 0
    new_src = open(tmp_reg).read()
    ast.parse(new_src)                          # file must still parse
    assert read_grade_order(new_src) == order[1:] + [order[0]]
    assert new_src.count("GRADE_ORDER: list[str] = [") == 1
