"""S7 — declarative generator DSL bridge.

The reference's event stream is also defined declaratively in a
ShadowTraffic-style JSON DSL (message-tracking.json: fork-per-key
generators with ``maxForks``/``stagger``, ``varsOnce`` value bindings,
``oneOf``/``uniformDistribution``/``normalDistribution`` draws, a
per-key state machine with a distributional transition delay, and a
``throttleMs`` rate limit — SURVEY §3.3).

This module maps that JSON *shape* onto the engine's own generators:
``parse_generator_spec`` → GeneratorConfig (+ rate-stream parameters),
so a spec written for the declarative runtime drives either the batch
fixture factory (sources/generator.py) or the live rate source
(sources/rate_stream.py).  Only the shape is honored; unknown ``_gen``
kinds fail loudly rather than silently degrade.
"""

from __future__ import annotations

import json
from dataclasses import replace
from typing import Any

from ..config import GeneratorConfig

KNOWN_GENS = {"uuid", "oneOf", "uniformDistribution", "normalDistribution", "now", "env", "var"}


class DslError(ValueError):
    pass


def _walk_gens(node: Any) -> None:
    """Validate every {_gen: ...} node is a kind we can honor."""
    if isinstance(node, dict):
        kind = node.get("_gen")
        if kind is not None and kind not in KNOWN_GENS and kind != "stateMachine":
            raise DslError(f"unsupported _gen kind: {kind!r}")
        for v in node.values():
            _walk_gens(v)
    elif isinstance(node, list):
        for v in node:
            _walk_gens(v)


def parse_generator_spec(
    spec: dict | str, base: GeneratorConfig | None = None
) -> tuple[GeneratorConfig, dict]:
    """Parse a ShadowTraffic-shaped spec into (GeneratorConfig,
    rate_stream_params).

    Honored fields: fork.maxForks, fork.stagger.ms, localConfigs.
    throttleMs / maxEvents / delay (normalDistribution transition delay
    + rate), varsOnce carrier choices.  Everything else is validated for
    shape and ignored (the engine's value layout is fixed by the wire
    schema).
    """
    if isinstance(spec, str):
        spec = json.loads(spec)
    cfg = base or GeneratorConfig()

    gens = spec.get("generators")
    if not gens:
        raise DslError("spec has no generators")
    g = gens[0]
    _walk_gens(g)

    fork = g.get("fork", {})
    max_forks = int(fork.get("maxForks", 100))
    stagger_ms = int(fork.get("stagger", {}).get("ms", cfg.stagger_ms))

    local = g.get("localConfigs", {})
    throttle_ms = int(local.get("throttleMs", 1000))
    max_events = local.get("maxEvents")

    # state machine: s1 -> s2 with optional distributional delay
    updates: dict[str, Any] = {"stagger_ms": stagger_ms}
    sm = g.get("stateMachine")
    if sm is not None:
        for state in (sm.get("states") or {}).values():
            delay_cfg = (state.get("localConfigs") or {}).get("delay")
            if delay_cfg is not None:
                rate = float(delay_cfg.get("rate", 1.0))
                dist = delay_cfg.get("ms", {})
                if dist.get("_gen") == "normalDistribution":
                    updates.update(
                        delayed_delay_model="normal",
                        delayed_mean_ms=int(dist["mean"]),
                        delayed_sd_ms=int(dist["sd"]),
                        delayed_rate=rate,
                        normal_rate=round(1.0 - rate - cfg.never_rate, 10),
                    )
                elif "_gen" in dist:
                    raise DslError(f"unsupported delay distribution: {dist['_gen']!r}")

    cfg = replace(cfg, **updates)
    rate_params = {
        "max_forks": max_forks,
        "rows_per_second": max(1, int(max_forks * 1000 / throttle_ms)),
        "max_events": int(max_events) if max_events is not None else None,
    }
    return cfg, rate_params
