"""S4 — declarative rate-limited generator as a live streaming source.

The reference's ShadowTraffic config forks 100 keyed generators at 1
event/s each (message-tracking.json:5-13, 85-87).  Spark-first, the
same semantics come from the built-in ``rate`` source: each tick maps
to lifecycle events via pure column expressions (fork key = value mod
maxForks, message identity = fork generation), so the generator scales
to millions of events/s by raising ``rowsPerSecond`` — the 100 TB
stance for the ingest path.

Lifecycle approximation for load testing: every Nth tick of a fork
starts a new message (``sent``); deliveries are emitted by the fork's
tick ``delay_ticks`` later, so the stream carries realistic
sent/heartbeat/delivered interleaving with deterministic md5
classification identical to the batch generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GeneratorConfig
from ..functions.expressions import det_uniform, weighted_classify
from ..schemas import CARRIERS


def message_rate_stream(
    spark: SparkSession,
    cfg: GeneratorConfig,
    rows_per_second: int = 1000,
    max_forks: int = 100,
    ticks_per_message: int = 30,
    delivery_delay_ticks: int = 3,
) -> DataFrame:
    """Streaming DataFrame of MESSAGE_EVENT_SCHEMA events from the rate
    source.  Each fork emits `sent` on tick 0 of its message window,
    heartbeats on subsequent ticks, and (for non-`never` messages) a
    `delivered` event `delivery_delay_ticks` in."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()

    fork = (F.col("value") % max_forks).alias("fork")
    tick = (F.col("value") / max_forks).cast("long")
    generation = (tick / ticks_per_message).cast("long")
    tick_in_msg = tick % ticks_per_message

    msg_key = F.concat(fork.cast("string"), F.lit("-"), generation.cast("string"))
    u = det_uniform(msg_key, seed=cfg.seed + "-classify")
    delivery_type = weighted_classify(u, cfg.normal_rate, cfg.delayed_rate)
    carrier = F.element_at(
        F.array(*[F.lit(c) for c in CARRIERS]),
        (det_uniform(fork, seed=cfg.seed + "-carrier") * 3).cast("int") + 1,
    )
    phone = F.lit(2_120_000_000) + fork.cast("long")

    status = F.when(
        (F.col("delivery_type") != "never") & (F.col("tick_in_msg") == delivery_delay_ticks),
        F.lit("delivered"),
    ).otherwise(F.lit("sent"))

    return (
        rate.select(
            F.md5(F.concat(F.lit(cfg.seed + "-mid-"), msg_key)).alias("message_id"),
            fork,
            tick_in_msg.alias("tick_in_msg"),
            delivery_type.alias("delivery_type"),
            carrier.alias("carrier"),
            phone.alias("phone_number"),
            F.unix_millis(F.col("timestamp")).alias("timestamp"),
        )
        .select(
            "message_id",
            status.alias("status"),
            "phone_number",
            "carrier",
            "timestamp",
        )
    )
