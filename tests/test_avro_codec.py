"""Pure-Python Avro codec (sources/avro_codec.py): datum round-trips over
the type system subset Iceberg manifests use (records, unions, arrays,
maps, fixed, enums, all primitives), container framing with null and
deflate codecs, and hypothesis property tests for the varint and a
recursive record shape. No avro library exists in this environment, so the
encoder and decoder attest each other — plus hand-pinned wire bytes for
the zigzag varint (the spec's own examples) so a shared bug in both sides
cannot hide."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from databricks_import_pyspark_scripts_spark.sources.avro_codec import (
    _read_long,
    _write_long,
    read_container,
    read_datum,
    write_container,
    write_datum,
)


def _roundtrip(datum, schema):
    out = bytearray()
    write_datum(out, datum, schema)
    return read_datum(io.BytesIO(bytes(out)), schema)


def test_zigzag_spec_examples():
    """The spec's table: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f,
    64->80 01."""
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
             -64: b"\x7f", 64: b"\x80\x01"}
    for n, wire in cases.items():
        out = bytearray()
        _write_long(out, n)
        assert bytes(out) == wire, n
        assert _read_long(io.BytesIO(wire)) == n


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip(n):
    out = bytearray()
    _write_long(out, n)
    assert _read_long(io.BytesIO(bytes(out))) == n


def test_primitives_roundtrip():
    assert _roundtrip(None, "null") is None
    assert _roundtrip(True, "boolean") is True
    assert _roundtrip(-12345678901234, "long") == -12345678901234
    assert _roundtrip(2.5, "double") == 2.5
    assert _roundtrip(b"\x00\xffraw", "bytes") == b"\x00\xffraw"
    assert _roundtrip("straße ΣΙΣ 😀", "string") == "straße ΣΙΣ 😀"


def test_union_array_map_record_roundtrip():
    schema = {
        "type": "record", "name": "r1", "fields": [
            {"name": "a", "type": ["null", "long"]},
            {"name": "b", "type": {"type": "array", "items": "string"}},
            {"name": "c", "type": {"type": "map", "values": "double"}},
            {"name": "d", "type": {"type": "fixed", "name": "f8",
                                   "size": 8}},
            {"name": "e", "type": {"type": "enum", "name": "status",
                                   "symbols": ["ADDED", "EXISTING",
                                               "DELETED"]}},
            {"name": "g", "type": ["null", {
                "type": "record", "name": "inner", "fields": [
                    {"name": "x", "type": "long"}]}]},
        ]}
    datum = {"a": None, "b": ["p", "q"], "c": {"k1": 1.5, "k2": -2.0},
             "d": b"12345678", "e": "DELETED", "g": {"x": 7}}
    assert _roundtrip(datum, schema) == datum
    datum2 = {"a": 42, "b": [], "c": {}, "d": b"\x00" * 8, "e": "ADDED",
              "g": None}
    assert _roundtrip(datum2, schema) == datum2


def test_named_type_reference_roundtrip():
    """A fixed/record defined once and referenced by name later."""
    schema = {
        "type": "record", "name": "outer", "fields": [
            {"name": "first", "type": {"type": "fixed", "name": "uuid16",
                                       "size": 16}},
            {"name": "second", "type": "uuid16"},
        ]}
    datum = {"first": b"a" * 16, "second": b"b" * 16}
    assert _roundtrip(datum, schema) == datum


@settings(max_examples=50)
@given(st.lists(st.tuples(st.integers(-2**40, 2**40),
                          st.text(max_size=20),
                          st.one_of(st.none(), st.floats(allow_nan=False,
                                                         allow_infinity=False,
                                                         width=64))),
                max_size=25))
def test_container_roundtrip_property(rows):
    schema = {"type": "record", "name": "row", "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "v", "type": ["null", "double"]},
    ]}
    records = [{"n": n, "s": s, "v": v} for n, s, v in rows]
    for codec in ("null", "deflate"):
        blob = write_container(schema, records, codec=codec)
        meta, back = read_container(blob)
        assert back == records
        assert meta["avro.codec"].decode() == codec


def test_container_rejects_garbage():
    import pytest

    with pytest.raises(ValueError, match="not an Avro"):
        read_container(b"PAR1not-avro")
