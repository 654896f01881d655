"""The tables.table() scan memo (r14 continuation session).

Each test here fails on a specific weakening of the memo (the r13
"a regression test must fail on the code it guards against" rule):

- hit/identity      -> fails if the memo is removed
- rewrite miss      -> fails if the signature drops mtime/size
- inode miss        -> fails if the signature drops st_ino (same-size
                       os.replace with the old mtime copied back)
- nested in-place   -> fails if the directory signature goes back to
                       direct-children-only (in-place rewrite of a
                       nested part file leaves the parent dir entry
                       untouched)
- liveness probe    -> fails if pyspark renames the private attrs
                       _session_live leans on (the memo would silently
                       disable and the construction win evaporate)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from flexcalc_spark import tables


def _write(path: str, vals: list[int]) -> None:
    pq.write_table(pa.table({"v": pa.array(vals, type=pa.int64())}), path)


def test_memo_returns_same_object_for_unchanged_files(spark):
    a = tables.table(spark, "/root/testdata/sf0.001", "nation")
    b = tables.table(spark, "/root/testdata/sf0.001", "nation")
    assert a is b


def test_rewrite_at_same_path_is_a_miss(spark, tmp_path):
    sf = str(tmp_path)
    _write(os.path.join(sf, "events.parquet"), [1, 2, 3])
    first = tables.table(spark, sf, "events")
    assert first.count() == 3
    _write(os.path.join(sf, "events.parquet"), [7, 8, 9, 10])
    second = tables.table(spark, sf, "events")
    assert second is not first
    assert sorted(r.v for r in second.collect()) == [7, 8, 9, 10]


def test_same_size_same_mtime_swap_is_a_miss(spark, tmp_path):
    # os.replace a pre-written same-size file and copy the ORIGINAL
    # mtime back: (mtime_ns, size) alone cannot see this — only the
    # inode can.
    sf = str(tmp_path)
    path = os.path.join(sf, "events.parquet")
    alt = os.path.join(sf, "alt.bin")
    _write(path, [1])
    _write(alt, [2])
    st = os.stat(path)
    if os.path.getsize(alt) != st.st_size:
        pytest.skip("parquet writer produced unequal sizes")
    first = tables.table(spark, sf, "events")
    assert [r.v for r in first.collect()] == [1]
    os.replace(alt, path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert os.stat(path).st_size == st.st_size
    assert os.stat(path).st_mtime_ns == st.st_mtime_ns
    second = tables.table(spark, sf, "events")
    assert second is not first
    assert [r.v for r in second.collect()] == [2]


def test_nested_in_place_rewrite_is_a_miss(spark, tmp_path):
    # Partitioned-style layout: the rewritten bytes live one directory
    # down, and an in-place truncate+write keeps the file's inode and
    # the PARENT directory's mtime — only a recursive signature sees
    # the nested file's new mtime/size.
    sf = str(tmp_path)
    layout = os.path.join(sf, "events.parquet", "day=1")
    os.makedirs(layout)
    part = os.path.join(layout, "part-0.parquet")
    _write(part, [1, 2])
    first = tables.table(spark, sf, "events")
    assert first.count() == 2
    ino = os.stat(part).st_ino
    _write(part, [5, 6, 7])  # open(..., 'wb'): same inode, same parent
    assert os.stat(part).st_ino == ino
    second = tables.table(spark, sf, "events")
    assert second is not first
    assert sorted(r.v for r in second.collect()) == [5, 6, 7]


def test_missing_path_skips_memo_and_raises_sparks_error(spark, tmp_path):
    with pytest.raises(Exception) as exc:
        tables.table(spark, str(tmp_path), "events").count()
    assert "PATH_NOT_FOUND" in str(exc.value) or "Path does not exist" in str(
        exc.value
    )


def test_session_liveness_probe_sees_the_live_session(spark):
    # If a pyspark upgrade renames sparkContext._jsc, _session_live
    # returns False for every session and the memo silently disables —
    # this assertion is the canary.
    assert tables._session_live(spark) is True


def test_memo_lives_on_the_session_object_not_in_the_module(spark):
    # The module must hold no global strong reference to plans: the
    # only store is the per-session attribute (a pure cycle the GC can
    # reclaim with the session). Guards against reintroducing a
    # module-level registry whose values pin dead sessions' JVM state.
    tables.table(spark, "/root/testdata/sf0.001", "nation")
    assert isinstance(getattr(spark, tables._SCAN_MEMO_ATTR), dict)
    assert not any(
        isinstance(getattr(tables, n), dict) and getattr(tables, n)
        for n in dir(tables)
        if n.startswith("_SCAN_MEMO") and n != "_SCAN_MEMO_ATTR"
    )
