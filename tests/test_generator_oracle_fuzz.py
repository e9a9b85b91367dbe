"""Property-based differential test: for RANDOM generator configs, the
Spark fixture and the DuckDB pure-SQL regeneration (_gen_prelude) must
agree on the full event multiset — the strongest form of the engine's
determinism contract (SURVEY §5)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from conftest import fuzz_examples
from hypothesis import strategies as st

from banking_streamprocessing_demos_spark.config import GeneratorConfig
from banking_streamprocessing_demos_spark.operators.message_domain import _gen_prelude
from banking_streamprocessing_demos_spark.sources.generator import generate_events


@st.composite
def configs(draw):
    normal = draw(st.sampled_from([0.6, 0.75, 0.85]))
    delayed = draw(st.sampled_from([0.05, 0.1]))
    return GeneratorConfig(
        n_phones=draw(st.integers(min_value=5, max_value=40)),
        n_messages=draw(st.integers(min_value=10, max_value=120)),
        seed=draw(st.sampled_from(["fz1", "fz2", "fz3", "fz4"])),
        normal_rate=normal,
        delayed_rate=delayed,
        never_rate=round(1.0 - normal - delayed, 10),
        normal_delivery_ms=draw(st.sampled_from([20_000, 30_000])),
        delayed_delivery_ms=draw(st.sampled_from([150_000, 180_000])),
        heartbeat_interval_ms=draw(st.sampled_from([15_000, 30_000])),
        stagger_ms=draw(st.sampled_from([250, 1000])),
        horizon_after_last_start_ms=draw(st.sampled_from([200_000, 400_000])),
        duplicate_rate=draw(st.sampled_from([0.0, 0.05])),
        delayed_delay_model=draw(st.sampled_from(["constant", "normal"])),
    )


@given(cfg=configs())
@settings(max_examples=fuzz_examples(6), deadline=None)
def test_fixture_matches_duckdb_regeneration(spark, cfg):
    spark_rows = sorted(
        map(tuple, generate_events(spark, cfg).collect())
    )
    sql = _gen_prelude(cfg) + "SELECT message_id, status, phone_number, carrier, timestamp FROM gen_events"
    duck_rows = sorted(duckdb.connect().execute(sql).fetchall())
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows
