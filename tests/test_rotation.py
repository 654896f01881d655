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
