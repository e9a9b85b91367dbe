"""Differential tests: every registered SQL-expressible query must match
its DuckDB oracle at sf0.001 (row count + column names + order-insensitive
values) — the same gate the round driver applies at sf0.01 (SURVEY §5)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _normalize(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(v).lower())
            elif v is None:
                vals.append("\0null")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_SMALL)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert _normalize(srows, scols) == _normalize(orows, ocols), f"{name}: values differ"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue", "n_items"]


def test_every_query_has_fn():
    for name in QUERIES:
        assert callable(QUERIES[name])
    # every oracle key must have a matching query
    assert set(ORACLES) <= set(QUERIES)


DRIVER_WINDOW = 50  # the round driver checks only the first 50 queries()


def test_driver_window_covers_every_family():
    """Round-1 regression: the driver verifies only the first 50 entries
    of queries() (insertion order), and the 19 LLM-pipeline queries all
    sat past slot 50 — zero driver evidence.  Pin that every family and
    every sole-evidence §2 query sits inside the window."""
    window = list(QUERIES)[:DRIVER_WINDOW]
    in_window = set(window)
    # all LLM-pipeline families, in full
    for prefix, expected in [
        ("dedup_", 6),
        ("sim_", 3),
        ("text_", 5),
        ("mm_", 3),
    ]:
        got = [n for n in in_window if n.startswith(prefix)]
        assert len(got) == expected, f"{prefix}* in driver window: {sorted(got)}"
    assert "emb_quantize_int8" in in_window
    assert "pipe_curation" in in_window
    # round-1's only red row must be re-verified by the driver
    assert "w4_sessionization" in in_window
    # sole driver evidence for their §2 IDs
    for name in [
        "st1_streaming_detector",
        "s5_console_dry_run",
        "gen_messages_snapshot",
        "smp2_backpressure_topup",
        "gen_normal_delay_snapshot",
    ]:
        assert name in in_window, name
    # every windowed query must have an oracle (full hash check, not rows-only)
    assert in_window <= set(ORACLES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_spark_representable(duck, name):
    """Typed-schema gate (round-1's w4 lesson): every oracle output
    column's Arrow type must map onto a Spark-representable family —
    DuckDB HUGEINT/DECIMAL/timestamp surfaces hash-mismatch under the
    driver's typed normalization even when str(v) looks identical."""
    import sys

    sys.path.insert(0, ".")
    from tools.check_correctness import _arrow_family

    schema = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    # DESCRIBE gives DuckDB type names; map via a LIMIT 0 arrow fetch
    table = duck.execute(f"SELECT * FROM ({ORACLES[name]}) q LIMIT 0").arrow()
    bad = {
        f.name: str(f.type)
        for f in table.schema
        if "UNREPRESENTABLE" in _arrow_family(f.type)
    }
    assert not bad, f"{name}: oracle columns with no Spark twin: {bad} (describe={schema})"
