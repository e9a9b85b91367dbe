"""Engine configuration — mirrors the reference's Config dataclass
(phone_message_producer.py:25-67) including rate validation (F11,
py:64-67).  Times are milliseconds throughout (the wire unit,
py:406-408); the reference's seconds-based knobs are converted."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class GeneratorConfig:
    """Deterministic message-lifecycle generator parameters.

    Defaults follow the reference's Config defaults
    (phone_message_producer.py:42-58): 1000 phones, 85%/10%/5%
    normal/delayed/never split, 30 s normal delivery, 180 s delayed,
    30 s heartbeats.
    """

    n_phones: int = 1000
    n_messages: int = 5000
    seed: str = "42"

    normal_rate: float = 0.85
    delayed_rate: float = 0.10
    never_rate: float = 0.05

    normal_delivery_ms: int = 30_000
    delayed_delivery_ms: int = 180_000
    heartbeat_interval_ms: int = 30_000

    # F9 (message-tracking.json:73-81): 'constant' uses delayed_delivery_ms;
    # 'normal' draws delayed deliveries from N(delayed_mean_ms, delayed_sd_ms)
    # via deterministic Box-Muller over md5 uniforms
    delayed_delay_model: str = "constant"
    delayed_mean_ms: int = 120_000
    delayed_sd_ms: int = 10_000

    # message starts are staggered like the declarative generator's
    # 250 ms stagger (message-tracking.json:12)
    start_ms: int = 1_700_000_000_000
    stagger_ms: int = 250

    # observation horizon relative to the LAST message start; must exceed
    # the detector timeout for end-of-stream timers to be testable
    horizon_after_last_start_ms: int = 600_000

    # at-least-once duplicate injection (py:354-358 acks=all retries)
    duplicate_rate: float = 0.02

    def __post_init__(self) -> None:
        total = self.normal_rate + self.delayed_rate + self.never_rate
        if abs(total - 1.0) > 1e-9:
            raise ValueError(f"delivery rates must sum to 1.0, got {total}")

    @property
    def horizon_ms(self) -> int:
        return self.start_ms + (self.n_messages - 1) * self.stagger_ms + self.horizon_after_last_start_ms


@dataclass(frozen=True)
class EngineConfig:
    """Runtime configuration sourced from the environment, mirroring the
    reference's Config + env wiring (phone_message_producer.py:25-67,
    930-953: BOOTSTRAP_URL, SCHEMA_REGISTRY_URL, rates, timings)."""

    bootstrap_url: str = "localhost:9092"
    schema_registry_url: str = "http://localhost:8081"
    topic: str = "message_status"

    total_phone_numbers: int = 1000
    max_active_messages: int = 100
    messages_per_batch: int = 50
    batch_interval_s: int = 60
    heartbeat_interval_s: int = 30

    delivery_rate: float = 0.85
    delayed_delivery_rate: float = 0.10
    never_deliver_rate: float = 0.05
    normal_delivery_time_s: int = 30
    delayed_delivery_time_s: int = 180

    # detector knobs (the consumer side the reference never built)
    timeout_s: int = 105
    watermark_delay_s: int = 30

    def __post_init__(self) -> None:
        total = self.delivery_rate + self.delayed_delivery_rate + self.never_deliver_rate
        if abs(total - 1.0) > 1e-9:  # F11, py:64-67
            raise ValueError(f"delivery rates must sum to 1.0, got {total}")


def engine_config_from_env(env: dict[str, str] | None = None) -> EngineConfig:
    """S6 (py:930-953): build EngineConfig from environment variables,
    falling back to reference defaults."""
    import os

    e = os.environ if env is None else env

    def geti(k: str, d: int) -> int:
        return int(e.get(k, d))

    def getf(k: str, d: float) -> float:
        return float(e.get(k, d))

    return EngineConfig(
        bootstrap_url=e.get("BOOTSTRAP_URL", "localhost:9092"),
        schema_registry_url=e.get("SCHEMA_REGISTRY_URL", "http://localhost:8081"),
        topic=e.get("TOPIC", "message_status"),
        total_phone_numbers=geti("TOTAL_PHONE_NUMBERS", 1000),
        max_active_messages=geti("MAX_ACTIVE_MESSAGES", 100),
        messages_per_batch=geti("MESSAGES_PER_BATCH", 50),
        batch_interval_s=geti("BATCH_INTERVAL", 60),
        heartbeat_interval_s=geti("HEARTBEAT_INTERVAL", 30),
        delivery_rate=getf("DELIVERY_RATE", 0.85),
        delayed_delivery_rate=getf("DELAYED_DELIVERY_RATE", 0.10),
        never_deliver_rate=getf("NEVER_DELIVER_RATE", 0.05),
        normal_delivery_time_s=geti("NORMAL_DELIVERY_TIME", 30),
        delayed_delivery_time_s=geti("DELAYED_DELIVERY_TIME", 180),
        timeout_s=geti("DETECTOR_TIMEOUT", 105),
        watermark_delay_s=geti("WATERMARK_DELAY", 30),
    )
