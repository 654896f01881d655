"""Avro codec: pure-Python spec implementation vs the official Java one.

Verification standard (SURVEY §5.2, raised from the JPEG lockstep
trick): Spark's classpath ships the real Apache Avro core jar
(avro-1.12.1), so the cross-implementation tests below round-trip
record-exact in BOTH directions against ``org.apache.avro`` via py4j —
files we write are read by ``DataFileReader``/``GenericDatumReader``,
files ``DataFileWriter`` writes are read by our decoder, under the
``null``, ``deflate``, ``snappy`` and ``zstandard`` codecs (the
latter two exercising snappycodec.py / zstdcodec.py inside the
container framing).
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from flexcalc_spark.sources import avrocodec as av

DOC_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "namespace": "fx",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "n", "type": "int"},
        {"name": "score", "type": "double"},
    ],
}


def _docs(n=200):
    return [
        {
            "doc_id": 2**40 + i,
            "text": (f"héllo ☃ {i}" if i % 3 else None),
            "n": -i,
            "score": i * 0.125,
        }
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# pure-Python unit tests (no JVM)
# ---------------------------------------------------------------------------


def test_zigzag_edge_values():
    for n in (0, -1, 1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63)):
        b = av.zigzag_encode(n)
        d, p = av.zigzag_decode(b, 0)
        assert (d, p) == (n, len(b))


def test_zigzag_known_bytes():
    # worked examples from the Avro spec's encoding table
    assert av.zigzag_encode(0) == b"\x00"
    assert av.zigzag_encode(-1) == b"\x01"
    assert av.zigzag_encode(1) == b"\x02"
    assert av.zigzag_encode(-2) == b"\x03"
    assert av.zigzag_encode(-64) == b"\x7f"
    assert av.zigzag_encode(64) == b"\x80\x01"


FULL_SCHEMA = {
    "type": "record",
    "name": "Every",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "double"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "K", "symbols": ["A", "B", "C"]},
        },
        {"name": "blob", "type": "bytes"},
        {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
        {"name": "f", "type": "float"},
        {"name": "flag", "type": "boolean"},
        {"name": "child", "type": ["null", "Every"]},  # recursive reference
    ],
}

FULL_RECORDS = [
    {
        "l": 2**62,
        "s": "héllo ☃",
        "tags": ["a", ""],
        "props": {"x": 1.5, "": -2.25},
        "kind": "B",
        "blob": b"\x00\xff",
        "fp": b"abcd",
        "f": 1.25,
        "flag": True,
        "child": {
            "l": -1,
            "s": None,
            "tags": [],
            "props": {},
            "kind": "A",
            "blob": b"",
            "fp": b"zzzz",
            "f": -2.5,
            "flag": False,
            "child": None,
        },
    },
    {
        "l": 0,
        "s": None,
        "tags": [],
        "props": {},
        "kind": "C",
        "blob": b"x",
        "fp": b"0000",
        "f": 0.0,
        "flag": False,
        "child": None,
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy", "bzip2",
                                   "xz", "zstandard"])
def test_container_roundtrip_full_type_system(codec):
    data = av.write_container(FULL_SCHEMA, FULL_RECORDS * 300, codec=codec,
                              max_block_records=128)
    schema, back = av.read_container(data)
    assert back == FULL_RECORDS * 300
    assert schema["name"] == "Every"


def test_multi_block_and_empty_file():
    data = av.write_container(DOC_SCHEMA, _docs(10), max_block_records=3)
    # 10 records at 3/block -> 4 blocks, each sync-framed
    assert data.count(av._sync_marker(
        json.dumps(DOC_SCHEMA, separators=(",", ":"), sort_keys=True))) == 5
    _, back = av.read_container(data)
    assert back == _docs(10)
    _, empty = av.read_container(av.write_container(DOC_SCHEMA, []))
    assert empty == []


def test_negative_block_count_read():
    """The spec's size-prefixed (negative count) array/map block variant
    must decode — hand-craft one since our writer never emits it."""
    names: dict = {}
    inner = bytearray()
    av._encode("string", "a", inner, names)
    av._encode("string", "b", inner, names)
    buf = bytearray()
    buf += av.zigzag_encode(-2)  # 2 items, size-prefixed
    buf += av.zigzag_encode(len(inner))
    buf += inner
    buf += av.zigzag_encode(0)
    val, pos = av._decode({"type": "array", "items": "string"}, bytes(buf), 0, names)
    assert val == ["a", "b"] and pos == len(buf)


def test_corrupt_container_raises():
    good = av.write_container(DOC_SCHEMA, _docs(5))
    with pytest.raises(ValueError):
        av.read_container(b"NotAvro" + good)
    # flip a byte inside the trailing sync marker -> framing mismatch
    bad = bytearray(good)
    bad[-8] ^= 0xFF
    with pytest.raises(ValueError):
        av.read_container(bytes(bad))
    with pytest.raises(ValueError):
        av.read_container(good[: len(good) - 10])


def test_unknown_codec_raises_notimplemented():
    with pytest.raises(NotImplementedError):
        av.write_container(DOC_SCHEMA, [], codec="lz4")


def test_snappy_crc_mismatch_raises():
    data = bytearray(av.write_container(DOC_SCHEMA, _docs(5), codec="snappy"))
    # the 4 bytes before the trailing sync are the block CRC
    data[-17] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        av.read_container(bytes(data))


# ---------------------------------------------------------------------------
# cross-implementation: the official Java Avro on Spark's classpath
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy", "bzip2",
                                   "xz", "zstandard"])
def test_java_reads_our_files(spark, codec):
    jvm = spark._jvm
    data = av.write_container(DOC_SCHEMA, _docs(), codec=codec,
                              max_block_records=64)
    path = os.path.join(tempfile.gettempdir(), f"fx_avro_ours_{codec}.avro")
    with open(path, "wb") as fh:
        fh.write(data)
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
    got = []
    while dfr.hasNext():
        r = dfr.next()
        t = r.get("text")
        got.append(
            {
                "doc_id": r.get("doc_id"),
                "text": None if t is None else str(t),
                "n": r.get("n"),
                "score": r.get("score"),
            }
        )
    dfr.close()
    os.unlink(path)
    assert got == _docs()


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy", "bzip2",
                                   "xz", "zstandard"])
def test_our_reader_reads_java_files(spark, codec):
    jvm = spark._jvm
    jsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(DOC_SCHEMA))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jsch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    elif codec == "snappy":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.snappyCodec())
    elif codec == "bzip2":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.bzip2Codec())
    elif codec == "xz":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.xzCodec(6))
    elif codec == "zstandard":
        dfw.setCodec(
            jvm.org.apache.avro.file.CodecFactory.zstandardCodec(3))
    path = os.path.join(tempfile.gettempdir(), f"fx_avro_java_{codec}.avro")
    dfw.create(jsch, jvm.java.io.File(path))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    for rec in _docs():
        jr = GR(jsch)
        jr.put("doc_id", jvm.java.lang.Long(rec["doc_id"]))
        jr.put("text", rec["text"])
        jr.put("n", rec["n"])
        jr.put("score", rec["score"])
        dfw.append(jr)
    dfw.close()
    with open(path, "rb") as fh:
        _, back = av.read_container(fh.read())
    os.unlink(path)
    assert back == _docs()


# ---------------------------------------------------------------------------
# the graded Spark round-trip key
# ---------------------------------------------------------------------------


def test_q_source_avro_matches_oracle(spark, duck):
    from flexcalc_spark.registry import ORACLES, QUERIES
    from tests.conftest import SF_DIR

    got = {
        tuple(r)
        for r in QUERIES["q_source_avro"](spark, SF_DIR)
        .orderBy("lang", "source")
        .collect()
    }
    exp = {tuple(r) for r in duck.execute(ORACLES["q_source_avro"]).fetchall()}
    assert got == exp and len(got) > 0


def test_namespace_inherited_fullname_reference():
    """A nested named type without its own namespace INHERITS the
    enclosing one (spec name-resolution), so a fullname reference like
    'ns.Inner' must resolve — Java Avro emits such references
    (round-10 review finding)."""
    schema = {
        "type": "record",
        "name": "Outer",
        "namespace": "ns",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "Inner",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
            {"name": "b", "type": ["null", "ns.Inner"]},
        ],
    }
    recs = [
        {"a": {"x": 1}, "b": {"x": 2}},
        {"a": {"x": 3}, "b": None},
    ]
    _, back = av.read_container(av.write_container(schema, recs))
    assert back == recs


def test_field_defaults_convert_json_per_spec():
    """Record-field defaults are JSON values per the Avro spec: a
    bytes/fixed default is a JSON string in ISO-8859-1 (one char per
    byte), and a union default is written against the FIRST branch
    (ADVICE r10). The writer must convert, not bytes(str)-crash."""
    schema = {
        "type": "record",
        "name": "D",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "raw", "type": "bytes", "default": "\u00ff\u0000A"},
            {
                "name": "fx",
                "type": {"type": "fixed", "name": "F2", "size": 2},
                "default": "\u0001\u0002",
            },
            {"name": "opt", "type": ["null", "string"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"},
             "default": ["x"]},
            # the first-branch rule with a LATER strict-matching branch:
            # the JSON integer 0 must encode as double (branch 0), not
            # long (branch 1) — the round-11 review finding
            {"name": "v", "type": ["double", "long"], "default": 0},
        ],
    }
    # the record omits every defaulted field
    _, back = av.read_container(av.write_container(schema, [{"id": 7}]))
    assert back == [
        {"id": 7, "raw": b"\xff\x00A", "fx": b"\x01\x02",
         "opt": None, "tags": ["x"], "v": 0.0}
    ]
    assert isinstance(back[0]["v"], float)


def test_malformed_default_raises_typed_valueerror():
    """A bytes default that is not a JSON string must raise ValueError
    (the module's typed contract), never TypeError from bytes(str)."""
    schema = {
        "type": "record",
        "name": "B",
        "fields": [{"name": "raw", "type": "bytes", "default": 123}],
    }
    with pytest.raises(ValueError, match="default"):
        av.write_container(schema, [{}])


def test_union_int_promotes_to_double_branch():
    """An int datum against ['null','double'] takes the double branch
    (spec-sanctioned int->double promotion); with an int/long branch
    present the strict match still wins."""
    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "v", "type": ["null", "double"]},
            {"name": "w", "type": ["double", "long"]},
        ],
    }
    _, back = av.read_container(
        av.write_container(schema, [{"v": 3, "w": 4}])
    )
    assert back == [{"v": 3.0, "w": 4}]
    assert isinstance(back[0]["v"], float)
    assert isinstance(back[0]["w"], int)


def test_java_reads_our_default_encodings(spark):
    """Gold-standard check of the round-11 default-conversion path: a
    container whose records OMIT every defaulted field must read back
    through the official Java Avro with the spec-converted values —
    latin-1 bytes, first-branch union (double, not long), containers."""
    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "Dflt",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "raw", "type": "bytes", "default": "\u00ff\u0000A"},
            {"name": "opt", "type": ["null", "string"], "default": None},
            {"name": "v", "type": ["double", "long"], "default": 0},
            {"name": "tags", "type": {"type": "array", "items": "string"},
             "default": ["x", "y"]},
        ],
    }
    data = av.write_container(schema, [{"id": 7}, {"id": 8}])
    path = os.path.join(tempfile.gettempdir(), "fx_avro_defaults.avro")
    with open(path, "wb") as fh:
        fh.write(data)
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader
    )
    got = []
    while dfr.hasNext():
        r = dfr.next()
        raw = r.get("raw")  # java.nio.ByteBuffer
        n = raw.remaining()
        bs = bytes(raw.get(i) % 256 for i in range(n))
        got.append(
            {
                "id": r.get("id"),
                "raw": bs,
                "opt": r.get("opt"),
                "v": r.get("v"),
                "tags": [str(t) for t in r.get("tags")],
            }
        )
    dfr.close()
    os.unlink(path)
    assert got == [
        {"id": i, "raw": b"\xff\x00A", "opt": None, "v": 0.0,
         "tags": ["x", "y"]}
        for i in (7, 8)
    ]
    assert all(isinstance(r["v"], float) for r in got)


# ---------------------------------------------------------------------------
# logical types (round 11)
# ---------------------------------------------------------------------------

LOGICAL_SCHEMA = {
    "type": "record",
    "name": "LT",
    "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "tsm", "type": {"type": "long",
                                 "logicalType": "timestamp-millis"}},
        {"name": "lts", "type": {"type": "long",
                                 "logicalType": "local-timestamp-micros"}},
        {"name": "t", "type": {"type": "long",
                               "logicalType": "time-micros"}},
        {"name": "amt", "type": {"type": "bytes", "logicalType": "decimal",
                                 "precision": 10, "scale": 2}},
        {"name": "famt", "type": {"type": "fixed", "name": "D8", "size": 8,
                                  "logicalType": "decimal",
                                  "precision": 18, "scale": 4}},
        {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "opt_ts", "type": ["null", {"type": "long",
                                   "logicalType": "timestamp-micros"}]},
        {"name": "mystery", "type": {"type": "int",
                                     "logicalType": "no-such-type"}},
    ],
}


def _logical_records():
    import datetime as dt
    import decimal as dec
    import uuid

    utc = dt.timezone.utc
    return [
        {
            "d": dt.date(2024, 2, 29),
            "ts": dt.datetime(2024, 2, 29, 12, 34, 56, 789012, tzinfo=utc),
            "tsm": dt.datetime(2024, 2, 29, 12, 34, 56, 789000, tzinfo=utc),
            "lts": dt.datetime(2024, 2, 29, 12, 34, 56, 789012),
            "t": dt.time(23, 59, 59, 999999),
            "amt": dec.Decimal("-12345.67"),
            "famt": dec.Decimal("99999999999999.9999"),
            "u": uuid.UUID("12345678-1234-5678-1234-567812345678"),
            "opt_ts": dt.datetime(1969, 12, 31, 23, 59, 59, tzinfo=utc),
            "mystery": 7,
        },
        {
            "d": dt.date(1969, 1, 1),  # pre-epoch (negative days)
            "ts": dt.datetime(1902, 1, 1, tzinfo=utc),
            "tsm": dt.datetime(2100, 1, 1, tzinfo=utc),
            "lts": dt.datetime(1970, 1, 1),
            "t": dt.time(0, 0, 0),
            "amt": dec.Decimal("0.00"),
            "famt": dec.Decimal("-0.0001"),
            "u": uuid.UUID(int=0),
            "opt_ts": None,
            "mystery": -7,
        },
    ]


def test_logical_types_roundtrip():
    """All recognized logical types round-trip as rich Python values
    (timestamps aware UTC, local naive, decimal exact incl. negatives
    and fixed-width); unrecognized annotations pass through as base."""
    recs = _logical_records()
    _, back = av.read_container(av.write_container(LOGICAL_SCHEMA, recs))
    for want, got in zip(recs, back):
        for k, v in want.items():
            if k == "u":
                assert got[k] == str(v), k  # uuid stays str on read
            else:
                assert got[k] == v, (k, got[k], v)


def test_logical_raw_values_pass_through_on_write():
    """Raw base-typed values (ints/bytes) still encode under logical
    schemas — files written against the raw convention keep working."""
    import datetime as dt
    import decimal as dec

    raw = {
        "d": 19782, "ts": 1709210096789012, "tsm": 1709210096789,
        "lts": 1709210096789012, "t": 86399999999,
        "amt": (-901575).to_bytes(3, "big", signed=True),  # -> -9015.75
        "famt": (12345).to_bytes(8, "big", signed=True),
        "u": "12345678-1234-5678-1234-567812345678",
        "opt_ts": None, "mystery": 1,
    }
    _, back = av.read_container(av.write_container(LOGICAL_SCHEMA, [raw]))
    utc = dt.timezone.utc
    assert back[0]["d"] == dt.date(1970, 1, 1) + dt.timedelta(days=19782)
    assert back[0]["ts"] == dt.datetime.fromtimestamp(
        1709210096.789012, tz=utc
    )
    assert back[0]["amt"] == dec.Decimal("-9015.75")
    assert back[0]["famt"] == dec.Decimal("1.2345")


def test_logical_decimal_scale_overflow_raise():
    import decimal as dec

    with pytest.raises(ValueError, match="scale"):
        av.write_container(
            LOGICAL_SCHEMA,
            [dict(_logical_records()[0], amt=dec.Decimal("1.234"))],
        )


def test_java_roundtrips_logical_raw_encoding(spark):
    """Cross-implementation pin: the official Java Avro (no conversions
    registered) must read our logical-typed container as the expected
    RAW base values, and a Java-written raw container must decode to
    the rich values here — proving the wire encoding is the spec's."""
    import datetime as dt
    import decimal as dec

    jvm = spark._jvm
    schema = {
        "type": "record",
        "name": "JL",
        "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "amt", "type": {"type": "bytes",
                                     "logicalType": "decimal",
                                     "precision": 10, "scale": 2}},
        ],
    }
    utc = dt.timezone.utc
    recs = [{
        "d": dt.date(2024, 2, 29),
        "ts": dt.datetime(2024, 2, 29, 12, 0, 0, 500000, tzinfo=utc),
        "amt": dec.Decimal("-12345.67"),
    }]
    data = av.write_container(schema, recs)
    path = os.path.join(tempfile.gettempdir(), "fx_avro_logical.avro")
    with open(path, "wb") as fh:
        fh.write(data)
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader
    )
    r = dfr.next()
    assert r.get("d") == (dt.date(2024, 2, 29) - dt.date(1970, 1, 1)).days
    assert r.get("ts") == int(
        (dt.datetime(2024, 2, 29, 12, 0, 0, 500000, tzinfo=utc)
         - dt.datetime(1970, 1, 1, tzinfo=utc)).total_seconds() * 1e6
    )
    raw = r.get("amt")
    n = raw.remaining()
    amt_bytes = bytes(raw.get(i) % 256 for i in range(n))
    assert int.from_bytes(amt_bytes, "big", signed=True) == -1234567
    assert not dfr.hasNext()
    dfr.close()
    os.unlink(path)
    # reverse direction: Java writes raw base values, we decode rich
    jsch = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jsch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    path2 = os.path.join(tempfile.gettempdir(), "fx_avro_logical_j.avro")
    dfw.create(jsch, jvm.java.io.File(path2))
    GR = jvm.org.apache.avro.generic.GenericData.Record
    jr = GR(jsch)
    jr.put("d", jvm.java.lang.Integer(19782))
    jr.put("ts", jvm.java.lang.Long(1709210096789012))
    jr.put("amt", jvm.java.nio.ByteBuffer.wrap(
        bytearray((-1234567).to_bytes(3, "big", signed=True))
    ))
    dfw.append(jr)
    dfw.close()
    with open(path2, "rb") as fh:
        _, back = av.read_container(fh.read())
    os.unlink(path2)
    assert back[0]["d"] == dt.date(1970, 1, 1) + dt.timedelta(days=19782)
    assert back[0]["ts"] == dt.datetime.fromtimestamp(
        1709210096.789012, tz=utc
    )
    assert back[0]["amt"] == dec.Decimal("-12345.67")


# ---------------------------------------------------------------------------
# schema resolution (round 11): reader schema != writer schema
# ---------------------------------------------------------------------------


def test_schema_resolution_rules():
    """The spec's evolution rules on one writer/reader pair: field add
    (reader default), field drop, alias rename, int->double promotion,
    string<->bytes promotion, union widening, enum reader-default."""
    writer = {
        "type": "record",
        "name": "Evt",
        "fields": [
            {"name": "id", "type": "int"},
            {"name": "old_name", "type": "string"},
            {"name": "gone", "type": "long"},
            {"name": "tag", "type": "string"},
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["A", "B", "ZZZ"]}},
            {"name": "v", "type": "string"},
        ],
    }
    reader = {
        "type": "record",
        "name": "Evt",
        "fields": [
            {"name": "id", "type": "double"},            # int -> double
            {"name": "name", "type": "string",
             "aliases": ["old_name"]},                   # rename
            {"name": "added", "type": "long", "default": 42},
            {"name": "tag", "type": "bytes"},            # string -> bytes
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["A", "B"],
                                      "default": "A"}},
            {"name": "v", "type": ["null", "string"]},   # union widening
        ],
    }
    recs = [
        {"id": 3, "old_name": "x", "gone": 9, "tag": "t",
         "kind": "ZZZ", "v": "s"},
    ]
    schema, back = av.read_container(
        av.write_container(writer, recs), reader_schema=reader
    )
    assert schema == reader
    assert back == [{"id": 3.0, "name": "x", "added": 42, "tag": b"t",
                     "kind": "A", "v": "s"}]
    assert isinstance(back[0]["id"], float)
    # missing field without default is a typed error
    bad_reader = {
        "type": "record", "name": "Evt",
        "fields": [{"name": "nope", "type": "long"}],
    }
    with pytest.raises(ValueError, match="nope"):
        av.read_container(av.write_container(writer, recs),
                          reader_schema=bad_reader)


def test_schema_resolution_matches_java(spark):
    """Cross-implementation: Java's GenericDatumReader(writer, reader)
    must produce the same resolved records our _adapt does on the same
    container bytes (promotions + added-default + dropped field)."""
    jvm = spark._jvm
    writer = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string"},
            {"name": "gone", "type": "boolean"},
        ],
    }
    reader = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "long", "default": -5},
        ],
    }
    recs = [{"a": i, "b": f"s{i}", "gone": bool(i % 2)} for i in range(7)]
    data = av.write_container(writer, recs)
    _, ours = av.read_container(data, reader_schema=reader)
    path = os.path.join(tempfile.gettempdir(), "fx_avro_resolve.avro")
    with open(path, "wb") as fh:
        fh.write(data)
    jw = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(writer))
    jr = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(reader))
    gdr = jvm.org.apache.avro.generic.GenericDatumReader(jw, jr)
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), gdr
    )
    theirs = []
    while dfr.hasNext():
        rec = dfr.next()
        theirs.append(
            {"a": rec.get("a"), "b": str(rec.get("b")), "c": rec.get("c")}
        )
    dfr.close()
    os.unlink(path)
    assert ours == theirs


def test_spark_avro_logical_timestamp_roundtrip(spark, tmp_path):
    """End-to-end Spark sink -> source with a timestamp-micros logical
    field: DataFrame timestamps survive the container round-trip
    exactly (write converts pandas Timestamps to micros, read converts
    back to aware-UTC datetimes that Arrow maps onto TimestampType)."""
    import datetime as dt

    schema = {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
        ],
    }
    rows = [(i, dt.datetime(2024, 1, 1, 12, 0, i % 60, i * 7 % 1000000))
            for i in range(50)]
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp")
    out = str(tmp_path / "av")
    os.makedirs(out, exist_ok=True)
    av.write_avro(df.repartition(2), out, schema, codec="deflate").collect()
    back = av.read_avro(spark, out, "event_id bigint, ts timestamp")
    got = sorted((r.event_id, r.ts) for r in back.collect())
    assert got == sorted(rows)


def test_spark_avro_evolving_directory(spark, tmp_path):
    """A directory holding containers written under TWO schema versions
    reads as one relation under a reader schema (the parquet
    q_source_evolving story for Avro): the v1 files get the added
    field's default, the v2 files keep their values."""
    v1 = {
        "type": "record", "name": "D",
        "fields": [{"name": "doc_id", "type": "long"},
                   {"name": "lang", "type": "string"}],
    }
    v2 = {
        "type": "record", "name": "D",
        "fields": [{"name": "doc_id", "type": "long"},
                   {"name": "lang", "type": "string"},
                   {"name": "stars", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "D",
        "fields": [{"name": "doc_id", "type": "long"},
                   {"name": "lang", "type": "string"},
                   {"name": "stars", "type": "long", "default": -1}],
    }
    out = tmp_path / "dir"
    out.mkdir()
    (out / "a.avro").write_bytes(av.write_container(
        v1, [{"doc_id": 1, "lang": "en"}]))
    (out / "b.avro").write_bytes(av.write_container(
        v2, [{"doc_id": 2, "lang": "de", "stars": 5}]))
    back = av.read_avro(
        spark, str(out), "doc_id bigint, lang string, stars bigint",
        reader_schema=reader,
    )
    got = sorted((r.doc_id, r.lang, r.stars) for r in back.collect())
    assert got == [(1, "en", -1), (2, "de", 5)]


def test_corruption_fuzz_raises_only_valueerror():
    """The repo-wide codec contract at the container boundary: corrupt
    bytes raise ValueError (or NotImplementedError for a mutated codec
    NAME — the intentional typed boundary), never the stdlib
    decompressors' own types (zlib.error, bz2's OSError, LZMAError)
    or schema-walk KeyError/IndexError — the r10 'leak through the
    ValueError contract' class, found live by this sweep and wrapped
    in read_container (r11)."""
    import random

    schema = {"type": "record", "name": "D", "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "meta", "type": {"type": "map", "values": "double"}},
    ]}
    recs = [{"id": i, "text": None if i % 5 == 0 else f"döc {i}",
             "tags": [f"t{i % 3}", "x"], "meta": {"a": i * 0.5}}
            for i in range(300)]
    rng = random.Random(0xAB)
    for codec in ("null", "deflate", "snappy", "bzip2", "xz",
                  "zstandard"):
        base = av.write_container(schema, recs, codec=codec)
        assert av.read_container(base)[1] == recs, codec
        for _ in range(120):
            m = bytearray(base)
            op = rng.randrange(3)
            if op == 0 and len(m) > 8:
                del m[rng.randrange(4, len(m)):]
            elif op == 1:
                m[rng.randrange(len(m))] ^= 1 << rng.randrange(8)
            else:
                m[rng.randrange(len(m))] = rng.randrange(256)
            try:
                av.read_container(bytes(m))
            except (ValueError, NotImplementedError):
                pass  # the contract
            # any OTHER exception type propagates and fails the test


def test_block_codecs_capped_at_untrusted_output_bound(monkeypatch):
    """Every Avro block codec shares the one untrusted-bytes output
    ceiling (zstdcodec.untrusted_max_output): a small compression-bomb
    block must raise ValueError instead of materializing GBs. The
    policy is monkeypatched small so the test exercises the wiring
    without decompressing gigabytes."""
    import bz2
    import lzma
    import zlib

    from flexcalc_spark.sources import zstdcodec

    monkeypatch.setattr(zstdcodec, "untrusted_max_output",
                        lambda n: 1000)
    fat = b"\x00" * 50_000
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    cases = [
        ("deflate", co.compress(fat) + co.flush()),
        ("bzip2", bz2.compress(fat)),
        ("xz", lzma.compress(fat)),
        ("zstandard", zstdcodec.compress(fat)),
    ]
    for codec, payload in cases:
        with pytest.raises(ValueError, match="bound|content size"):
            av._decompress_block(codec, payload)
    # under the cap each codec still round-trips
    thin = b"row-data" * 20
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    assert av._decompress_block("deflate",
                                co.compress(thin) + co.flush()) == thin
    assert av._decompress_block("bzip2", bz2.compress(thin)) == thin
    assert av._decompress_block("xz", lzma.compress(thin)) == thin
    assert av._decompress_block("zstandard",
                                zstdcodec.compress(thin)) == thin


def test_truncated_codec_blocks_raise_valueerror():
    """Regression pin: switching to the incremental decompressors must
    not lose the one-shot functions' truncation errors — an incremental
    decompressor returns a silent partial prefix unless eof is
    checked (review finding, round 12)."""
    import bz2
    import lzma
    import zlib

    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    blobs = {
        "deflate": co.compress(b"payload" * 100) + co.flush(),
        "bzip2": bz2.compress(b"payload" * 100),
        "xz": lzma.compress(b"payload" * 100),
    }
    for codec, blob in blobs.items():
        with pytest.raises(ValueError, match="truncated"):
            av._decompress_block(codec, blob[:-5])
        # intact blocks still round-trip
        assert av._decompress_block(codec, blob) == b"payload" * 100
