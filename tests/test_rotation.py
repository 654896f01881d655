"""The GRADE_ORDER rotation tool (scripts/rotate_grade_order.py):
VERDICT r11/r12 both flagged the hand-applied rotation as a logistics
hazard; these tests pin the automated policy so the one-command flow
stays trustworthy across rounds."""

from __future__ import annotations

import ast
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from rotate_grade_order import (  # noqa: E402
    CHANGED_MANIFEST,
    REGISTRY,
    format_literal,
    latest_evidence,
    mark_changed,
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


@pytest.fixture
def apply_env(tmp_path, monkeypatch):
    """A copy of the real registry in tmp plus a helper running --apply
    against it with fabricated evidence (shared by every apply test —
    r13 review: the scaffold had been copy-pasted three times)."""
    import shutil

    import rotate_grade_order as rgo

    tmp_reg = tmp_path / "registry.py"
    shutil.copy(rgo.REGISTRY, tmp_reg)
    monkeypatch.setattr(rgo, "REGISTRY", str(tmp_reg))
    monkeypatch.setattr(sys, "argv", ["rotate_grade_order.py", "--apply"])

    def apply(fake: dict) -> None:
        monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
        assert rgo.main() == 0

    return tmp_reg, apply


def test_apply_rewrites_registry_and_comment(apply_env):
    """--apply must leave a parseable registry whose GRADE_ORDER is the
    expected permutation AND regenerate the descriptive comment (the
    hand-written 'Round-N front' paragraph would otherwise go stale)."""
    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    # fabricate evidence that moves the current front-2 to the back
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    fake[order[1]] = 99
    apply(fake)
    new_src = open(tmp_reg).read()
    new_order = read_grade_order(new_src)      # also proves it parses
    assert new_order == order[2:] + order[:2]
    assert "Rotation applied by scripts/rotate_grade_order.py" in new_src
    assert "Round-12 front" not in new_src      # stale paragraph gone
    ast.parse(new_src)


def test_apply_twice_leaves_one_comment_block(apply_env):
    """ADVICE r12: the regeneration used to strip only '# Round-' blocks,
    so each --apply appended another 'Rotation applied by' block while
    the previous one went stale in place. Two applies must leave exactly
    one tool-owned block (fails on the pre-fix code: two blocks)."""
    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    apply(fake)
    fake[order[1]] = 98
    apply(fake)
    new_src = open(tmp_reg).read()
    assert new_src.count("Rotation applied by") == 1
    assert read_grade_order(new_src) == order[2:] + [order[1], order[0]]
    ast.parse(new_src)


def test_apply_with_last_key_quoted_above_literal(apply_env):
    """ADVICE r12: lit_end used to be computed from the FIRST file-wide
    occurrence of the quoted last key — a quoted mention above the
    GRADE_ORDER literal made the splice land before lit_start and corrupt
    the file (fails on the pre-fix code: garbled duplicate assignment)."""
    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    # plant a quoted mention of the last key ABOVE the literal
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = f'_DOC_NOTE = "{order[-1]}"  # planted mention\n'
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    apply(fake)
    new_src = open(tmp_reg).read()
    ast.parse(new_src)                          # file must still parse
    assert read_grade_order(new_src) == order[1:] + [order[0]]
    assert new_src.count("GRADE_ORDER: list[str] = [") == 1
    # the stale tool block is stripped even with code between it and
    # the literal (signature-matched sub, not adjacency) — exactly one
    # tool block remains
    assert new_src.count("Rotation applied by") == 1
    assert '_DOC_NOTE = "' in new_src          # planted code survives


def test_apply_never_deletes_code_above_literal(apply_env):
    """r13 review: the comment-strip regex used to match the FIRST
    '# Round-' block anywhere above the literal and truncate everything
    from it — a doc comment followed by real code would get that CODE
    silently deleted from registry.py (fails on the pre-fix code: the
    sentinel assignment vanishes)."""
    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = (
        "# Round-13 working note\n"
        "# (a human doc comment, NOT the tool block)\n"
        "\n"
        "_SENTINEL_CODE = 13\n"
    )
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    apply(fake)
    new_src = open(tmp_reg).read()
    ast.parse(new_src)
    assert "_SENTINEL_CODE = 13" in new_src     # code NOT deleted
    assert "# Round-13 working note" in new_src  # non-adjacent: kept
    assert read_grade_order(new_src) == order[1:] + [order[0]]


def test_apply_refuses_strip_inside_string_literal(apply_env, monkeypatch):
    """r13 review pass 2: the signature strip runs over raw text, so a
    verbatim copy of the tool block inside a STRING literal above the
    GRADE_ORDER literal would have its lines deleted while both write
    guards pass (the file still parses, the order is unchanged). The
    AST-equality guard must refuse the rewrite (fails on the pre-guard
    code: the corrupted file is silently written)."""
    import rotate_grade_order as rgo

    tmp_reg, _apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = (
        '_ROTATION_DOC = """example of the tool-written block:\n'
        "# Rotation applied by scripts/rotate_grade_order.py from\n"
        "# CORRECTNESS history through rN.\n"
        "# Front of the next graded window: q_x, ...\n"
        '"""\n'
    )
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    before = open(tmp_reg).read()
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
    with pytest.raises(SystemExit, match="altered code or string"):
        rgo.main()
    assert open(tmp_reg).read() == before       # registry untouched


def test_apply_refuses_when_strip_breaks_string_delimiter(apply_env,
                                                          monkeypatch):
    """r13 review pass 4: if the stripped lines CARRY a string's closing
    triple-quote, ast.parse(head) raises SyntaxError before the
    AST-equality check — that must surface as the same SystemExit
    refusal, never a traceback (fails on the code BEFORE the
    except-SyntaxError guard landed — i.e. on 39951c5, where it
    escapes as an uncaught SyntaxError; verified there)."""
    import rotate_grade_order as rgo

    tmp_reg, _apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = (
        '_ROTATION_DOC2 = """doc whose closing quotes sit on a line\n'
        "# Rotation applied by scripts/rotate_grade_order.py from\n"
        '# Front of the next graded window: q_x, ..."""\n'
    )
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    before = open(tmp_reg).read()
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
    with pytest.raises(SystemExit, match="altered code or string"):
        rgo.main()
    assert open(tmp_reg).read() == before       # registry untouched


def test_apply_ignores_literal_mention_in_comment(apply_env):
    """r13 review pass 5: text-based anchoring (src.index) resolved
    lit_start at a COMMENT containing the literal's header verbatim,
    and the splice then silently deleted the code between that comment
    and the real literal with every guard passing. AST anchoring
    (literal_span) cannot be fooled (fails on the pre-fix code: the
    sentinel assignment vanishes while --apply reports success)."""
    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    lit_start = src.index("GRADE_ORDER: list[str] = [")
    planted = (
        "# the list GRADE_ORDER: list[str] = [...] below is "
        "tool-rotated\n"
        "_SENTINEL_BETWEEN = 42\n"
    )
    open(tmp_reg, "w").write(src[:lit_start] + planted + src[lit_start:])
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    apply(fake)
    new_src = open(tmp_reg).read()
    ast.parse(new_src)
    assert "_SENTINEL_BETWEEN = 42" in new_src  # code NOT deleted
    assert read_grade_order(new_src) == order[1:] + [order[0]]


def test_wrong_anchor_names_itself(apply_env, monkeypatch):
    """The defensive pre-strip parse guard must blame the ANCHOR, not
    the comment strip, when the text before the (mis-located) literal
    span does not parse — simulated via a literal_span that points
    mid-statement."""
    import rotate_grade_order as rgo

    tmp_reg, _apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    _real_start, real_end = rgo.literal_span(src)
    # a span that starts mid-statement: right after a "def " keyword,
    # so the prefix cannot parse
    bad_start = src.index("def ") + 4
    monkeypatch.setattr(rgo, "literal_span",
                        lambda s: (bad_start, real_end))
    before = open(tmp_reg).read()
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
    with pytest.raises(SystemExit, match="anchor is wrong"):
        rgo.main()
    assert open(tmp_reg).read() == before       # registry untouched


def test_duplicate_grade_order_assignment_refused(apply_env,
                                                  monkeypatch):
    """r13 review pass 6: with two GRADE_ORDER assignments in the file,
    rewriting the FIRST leaves the stale second one winning at import
    time while every guard passes (read_grade_order reads the first) —
    the tool must refuse outright (fails on the pre-fix code: --apply
    reports success)."""
    import rotate_grade_order as rgo

    tmp_reg, _apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    dup = '\nGRADE_ORDER = ["stale_override"]\n'
    open(tmp_reg, "w").write(src + dup)
    before = open(tmp_reg).read()
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
    with pytest.raises(SystemExit, match="2 GRADE_ORDER assignments"):
        rgo.main()
    assert open(tmp_reg).read() == before       # registry untouched


def test_chained_rebind_refused_local_name_ignored(apply_env,
                                                   monkeypatch):
    """r13 review pass 7: a chained module-level rebind (A = GRADE_ORDER
    = [...]) must trip the duplicate refusal (it wins at import time),
    while a function-LOCAL variable of the same name must NOT (both
    fail on the pre-fix code: the chained form applied 'successfully',
    the local form refused spuriously)."""
    import rotate_grade_order as rgo

    tmp_reg, apply = apply_env
    order = read_grade_order(open(tmp_reg).read())
    src = open(tmp_reg).read()
    fake = {k: 1 for k in order}
    fake[order[0]] = 99
    # (a) harmless local: apply must succeed
    open(tmp_reg, "w").write(
        src + '\ndef _helper():\n    GRADE_ORDER = ["local"]\n'
        "    return GRADE_ORDER\n")
    apply(fake)
    assert read_grade_order(open(tmp_reg).read()) == \
        order[1:] + [order[0]]
    # (b) chained module-level rebind: must refuse, file untouched
    open(tmp_reg, "w").write(
        src + '\n_STALE = GRADE_ORDER = ["stale_override"]\n')
    before = open(tmp_reg).read()
    monkeypatch.setattr(rgo, "latest_evidence", lambda: dict(fake))
    with pytest.raises(SystemExit, match="2 GRADE_ORDER assignments"):
        rgo.main()
    assert open(tmp_reg).read() == before


def test_failed_latest_grade_fronts_the_key(tmp_path):
    """r13 review: mere presence in CORRECTNESS_r*.json counted as
    evidence regardless of pass/fail, so a key FAILING in the latest
    round rotated to the TAIL (freshest) instead of the front. A real
    failure must reset the key to evidence round 0; the rows-only
    'no_oracle' label must NOT (fails on the pre-fix code: q_bad gets
    round 2)."""
    import json

    r1 = {"q_ok": {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None},
          "q_bad": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None}}
    r2 = {"q_bad": {"rows_match": True, "schema_match": True,
                    "hash_match": False, "err": None},
          "q_err": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "SparkException: boom"},
          "q_rows_only": {"rows_match": None, "schema_match": None,
                          "hash_match": None, "err": "no_oracle"}}
    (tmp_path / "CORRECTNESS_r1.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(r2))
    latest = latest_evidence(str(tmp_path))
    assert latest["q_ok"] == 1
    assert latest["q_bad"] == 0        # failed latest grade -> front
    assert latest["q_err"] == 0        # driver error -> front
    assert latest["q_rows_only"] == 2  # rows-only label is not failure
    order = ["q_ok", "q_bad", "q_err", "q_rows_only"]
    assert rotate(order, latest) == ["q_bad", "q_err", "q_ok",
                                     "q_rows_only"]


def test_changed_key_fronts_until_regraded(tmp_path):
    """VERDICT r13 #2: a key whose plan/oracle was rewritten AFTER its
    latest driver grade has effectively zero evidence — q_rfm was
    rewritten in r13 with evidence r10 and would have waited ~2 more
    rounds. A CHANGED_KEYS.json entry key -> round-changed must reset
    evidence to 0 while the latest grade predates the change, and must
    STOP mattering once the driver re-grades at >= that round (fails on
    the pre-fix code: q_changed keeps round 2 and rotates tailward)."""
    import json

    r2 = {"q_changed": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None},
          "q_ok": {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(r2))
    (tmp_path / CHANGED_MANIFEST).write_text(
        json.dumps({"q_changed": 3}))
    latest = latest_evidence(str(tmp_path))
    assert latest["q_changed"] == 0   # grade r2 < changed r3 -> front
    assert latest["q_ok"] == 2
    assert rotate(["q_ok", "q_changed"], latest) == ["q_changed", "q_ok"]
    # the driver re-grades it in r3 (end-of-round tree covers the
    # change): fresh evidence wins, the marker goes inert
    r3 = {"q_changed": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None}}
    (tmp_path / "CORRECTNESS_r3.json").write_text(json.dumps(r3))
    latest = latest_evidence(str(tmp_path))
    assert latest["q_changed"] == 3
    assert rotate(["q_ok", "q_changed"], latest) == ["q_ok", "q_changed"]


def test_mark_changed_records_current_round_and_refuses_unknown(tmp_path):
    """--mark-changed stamps keys with the CURRENT working round
    (latest CORRECTNESS round + 1), keeps the max on re-marking, and
    refuses unknown keys outright (a typo must not silently lose the
    change marker)."""
    import json

    (tmp_path / "CORRECTNESS_r7.json").write_text(json.dumps(
        {"q_a": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None}}))
    entries = mark_changed(["q_a"], ["q_a", "q_b"], str(tmp_path))
    assert entries == {"q_a": 8}
    on_disk = json.load(open(tmp_path / CHANGED_MANIFEST))
    assert on_disk == {"q_a": 8}
    # re-marking never lowers the recorded round
    (tmp_path / CHANGED_MANIFEST).write_text(json.dumps({"q_a": 9}))
    entries = mark_changed(["q_a", "q_b"], ["q_a", "q_b"], str(tmp_path))
    assert entries == {"q_a": 9, "q_b": 8}
    with pytest.raises(SystemExit, match="unknown keys"):
        mark_changed(["q_typo"], ["q_a", "q_b"], str(tmp_path))
    assert json.load(open(tmp_path / CHANGED_MANIFEST)) == \
        {"q_a": 9, "q_b": 8}                     # refusal wrote nothing


def test_prune_inert_changed_markers(tmp_path):
    """--apply prunes manifest entries whose key was re-graded at or
    after its changed round (inert markers — the driver grades the
    end-of-round tree) and keeps the still-active ones."""
    import json

    from rotate_grade_order import prune_inert_changed

    (tmp_path / "CORRECTNESS_r9.json").write_text(json.dumps(
        {"q_regraded": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "err": None},
         "q_stale": {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None}}))
    (tmp_path / CHANGED_MANIFEST).write_text(json.dumps(
        {"q_regraded": 9,    # graded r9 >= changed r9 -> inert
         "q_stale": 10,      # graded r9 < changed r10 -> active
         "q_never": 10}))    # never graded -> active
    pruned = prune_inert_changed(str(tmp_path))
    assert pruned == ["q_regraded"]
    assert json.load(open(tmp_path / CHANGED_MANIFEST)) == \
        {"q_never": 10, "q_stale": 10}
    # idempotent: nothing left to prune
    assert prune_inert_changed(str(tmp_path)) == []
