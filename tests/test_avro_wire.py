"""Avro wire-format codec: spec-level byte checks (known vectors from
the Avro 1.x binary encoding) + DataFrame round-trip through the
Confluent framing, and parity with the reference's schemas."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.config import GeneratorConfig
from banking_streamprocessing_demos_spark.sources.avro_wire import (
    confluent_frame,
    confluent_unframe,
    decode_message_key,
    decode_message_status,
    encode_message_key,
    encode_message_status,
    from_wire,
    read_long,
    to_wire,
    write_long,
    write_string,
)
from banking_streamprocessing_demos_spark.sources.generator import generate_events


def test_known_vectors():
    # Avro spec examples: zigzag varints
    assert write_long(0) == b"\x00"
    assert write_long(-1) == b"\x01"
    assert write_long(1) == b"\x02"
    assert write_long(-2) == b"\x03"
    assert write_long(2) == b"\x04"
    assert write_long(64) == b"\x80\x01"
    # string: length varint + utf8
    assert write_string("foo") == b"\x06foo"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=fuzz_examples(200), deadline=None)
def test_long_roundtrip(n):
    v, pos = read_long(write_long(n), 0)
    assert v == n


def test_record_roundtrip():
    body = encode_message_status("sent", 2125551234, "verizon", 1700000000123)
    assert decode_message_status(body) == ("sent", 2125551234, "verizon", 1700000000123)
    k = encode_message_key("abc-123")
    assert decode_message_key(k) == "abc-123"


def test_confluent_framing():
    body = encode_message_key("x")
    framed = confluent_frame(body, 7)
    assert framed[0] == 0 and framed[1:5] == (7).to_bytes(4, "big")
    sid, unframed = confluent_unframe(framed)
    assert sid == 7 and unframed == body
    with pytest.raises(ValueError):
        confluent_unframe(b"\x01rest")


def test_dataframe_wire_roundtrip(spark):
    cfg = GeneratorConfig(n_phones=20, n_messages=50, seed="avro")
    events = generate_events(spark, cfg)
    back = from_wire(to_wire(events))
    assert back.columns == events.columns
    assert events.exceptAll(back).count() == 0
    assert back.exceptAll(events).count() == 0


def test_wire_schemas_match_reference_source():
    """The engine's Avro schema JSON must equal the REFERENCE's inline
    schema literals (phone_message_producer.py:302-323) — extracted from
    the actual source at test time, so wire-contract drift fails CI."""
    import json
    import os

    src_path = "/root/reference/undelivered-message-alert/phone_message_producer.py"
    if not os.path.exists(src_path):
        pytest.skip("reference repo not mounted")
    src = open(src_path).read()

    def extract(attr: str) -> dict:
        blob = src.split(f'self.{attr} = """', 1)[1].split('"""', 1)[0]
        return json.loads(blob)

    from banking_streamprocessing_demos_spark.schemas import (
        MESSAGE_KEY_AVRO_JSON,
        MESSAGE_STATUS_AVRO_JSON,
    )

    assert json.loads(MESSAGE_KEY_AVRO_JSON) == extract("key_schema")
    assert json.loads(MESSAGE_STATUS_AVRO_JSON) == extract("value_schema")
