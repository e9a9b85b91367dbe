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
