"""S6 env config + S3/D1-D3/U1 storage semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from banking_streamprocessing_demos_spark.config import (
    EngineConfig,
    GeneratorConfig,
    engine_config_from_env,
)
from banking_streamprocessing_demos_spark.sources.generator import generate_phones
from banking_streamprocessing_demos_spark.sources.storage import (
    create_table,
    insert_or_ignore,
    read_table,
    with_autoincrement_ids,
)


def test_env_config_defaults_and_overrides():
    cfg = engine_config_from_env({})
    assert cfg.messages_per_batch == 50 and cfg.delivery_rate == 0.85
    cfg2 = engine_config_from_env(
        {"BOOTSTRAP_URL": "k:9092", "MESSAGES_PER_BATCH": "10", "DELIVERY_RATE": "0.80",
         "DELAYED_DELIVERY_RATE": "0.15"}
    )
    assert cfg2.bootstrap_url == "k:9092" and cfg2.messages_per_batch == 10


def test_rates_must_sum_to_one():
    with pytest.raises(ValueError, match="sum to 1.0"):
        EngineConfig(delivery_rate=0.9, delayed_delivery_rate=0.2, never_deliver_rate=0.05)
    with pytest.raises(ValueError, match="sum to 1.0"):
        GeneratorConfig(normal_rate=0.5, delayed_rate=0.1, never_rate=0.1)


def test_insert_or_ignore(spark, tmp_path):
    base = str(tmp_path)
    create_table(spark, base, "phone_numbers")
    cfg = GeneratorConfig(n_phones=50, n_messages=1, seed="st")
    phones = generate_phones(spark, cfg)
    rows = with_autoincrement_ids(phones.drop("id")).select(
        "id", "phone_number", "carrier", "created_at",
        F.lit(0).alias("total_messages_sent"), F.lit(0).alias("total_messages_delivered"),
    )
    assert insert_or_ignore(spark, base, "phone_numbers", rows, "phone_number") == 50
    # re-inserting the same phones is a no-op (UNIQUE semantics)
    assert insert_or_ignore(spark, base, "phone_numbers", rows, "phone_number") == 0
    stored = read_table(spark, base, "phone_numbers")
    assert stored.count() == 50
    assert stored.select("phone_number").distinct().count() == 50
    # in-batch duplicate collapse: first wins
    dup_batch = rows.unionByName(rows)
    assert insert_or_ignore(spark, base, "phone_numbers", dup_batch, "phone_number") == 0
