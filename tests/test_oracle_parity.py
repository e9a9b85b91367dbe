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
