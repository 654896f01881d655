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
    assert rotate(order, latest) == order
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
