"""Structural parity pins against the REFERENCE SOURCE itself (read at
test time): DDL column sets, nullability of the load-bearing
delivered_time, and the delivery-rate defaults.  These complement the
DuckDB value-parity gate — if the reference's contract ever differs
from what the engine declares, CI fails with the exact drift."""

from __future__ import annotations

import os
import re

import pytest

REF = "/root/reference/undelivered-message-alert/phone_message_producer.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference repo not mounted"
)


def _ddl_columns(table: str) -> list[tuple[str, bool]]:
    """(column, nullable) pairs from the reference's CREATE TABLE, in
    declaration order; constraint lines (FOREIGN KEY) excluded."""
    src = open(REF).read()
    body = re.search(
        rf"CREATE TABLE IF NOT EXISTS {table} \((.*?)\)\s*'''", src, re.S
    ).group(1)
    cols = []
    for line in body.splitlines():
        line = line.strip().rstrip(",")
        if not line or line.startswith("FOREIGN KEY"):
            continue
        name = line.split()[0]
        nullable = "NOT NULL" not in line and "PRIMARY KEY" not in line
        cols.append((name, nullable))
    return cols


def test_phone_numbers_schema_matches_reference_ddl():
    from banking_streamprocessing_demos_spark.schemas import PHONE_NUMBERS_SCHEMA

    ref = _ddl_columns("phone_numbers")
    assert [c for c, _ in ref] == PHONE_NUMBERS_SCHEMA.fieldNames()


def test_messages_schema_matches_reference_ddl():
    from banking_streamprocessing_demos_spark.schemas import MESSAGES_SCHEMA

    ref = _ddl_columns("messages")
    assert [c for c, _ in ref] == MESSAGES_SCHEMA.fieldNames()
    # the ONE load-bearing nullable: "undelivered" <=> delivered_time IS NULL
    ref_nullable = {c for c, nullable in ref if nullable and c != "created_at"}
    eng_nullable = {f.name for f in MESSAGES_SCHEMA.fields if f.nullable}
    assert ref_nullable == eng_nullable == {"delivered_time"}


def test_generator_rate_defaults_match_reference():
    """GeneratorConfig's delivery-rate defaults mirror the reference's
    Config (py:47-49): 85% normal / 10% delayed / 5% never."""
    from banking_streamprocessing_demos_spark.config import GeneratorConfig

    src = open(REF).read()
    ref_rates = {
        "delivered_rate": float(re.search(r"delivered_rate: float = ([\d.]+)", src).group(1)),
        "delayed_rate": float(re.search(r"delayed_rate: float = ([\d.]+)", src).group(1)),
        "never_delivered_rate": float(
            re.search(r"never_delivered_rate: float = ([\d.]+)", src).group(1)
        ),
    }
    cfg = GeneratorConfig()
    assert cfg.normal_rate == ref_rates["delivered_rate"]
    assert cfg.delayed_rate == ref_rates["delayed_rate"]
    assert cfg.never_rate == ref_rates["never_delivered_rate"]
