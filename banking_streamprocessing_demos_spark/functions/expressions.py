"""Portable scalar expressions mirroring the reference's F-series
(SURVEY §2.8; phone_message_producer.py:389-472, message-tracking.json:14-55).

Every helper composes built-in ``pyspark.sql.functions`` so Catalyst
keeps the expression inside whole-stage codegen.  Deterministic
"randomness" is derived from md5 of a seed+key string — identical
across Spark and any ANSI-ish oracle engine (DuckDB), which is what
makes the differential tests exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def epoch_ms(ts: Column) -> Column:
    """Timestamp → ms-epoch BIGINT (reference stores event time this way,
    phone_message_producer.py:406-408).  Oracle twin: ``epoch_ms(ts)``."""
    return F.unix_millis(ts)


def det_hash_hex(*cols: Column | str, seed: str = "42") -> Column:
    """Deterministic md5 hex of seed + cols — the engine's reproducible
    stand-in for uuid4/random (F1/F6-F9 at py:503, 394-399, 463-472).
    Portable: DuckDB twin is ``md5('<seed>-' || col || ...)``."""
    parts = [F.lit(f"{seed}-")] + [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat(*parts))


def hex_digit_val(ch: Column) -> Column:
    """Value of one lowercase hex digit via string position — portable to
    any engine with instr/strpos (no hex→int builtin needed)."""
    return F.instr(F.lit(HEX_DIGITS), ch) - F.lit(1)


def hex4_to_int(hexstr: Column) -> Column:
    """First 4 hex chars → int in [0, 65535].  Used to derive a uniform
    deterministic u in [0,1) as hex4/65536 for weighted classification."""
    d = [hex_digit_val(F.substring(hexstr, i + 1, 1)) for i in range(4)]
    return d[0] * 4096 + d[1] * 256 + d[2] * 16 + d[3]


def det_uniform(*cols: Column | str, seed: str = "42") -> Column:
    """Deterministic uniform double in [0,1) from md5(seed, cols)."""
    return hex4_to_int(det_hash_hex(*cols, seed=seed)) / F.lit(65536.0)


def hex4_sql(hexpr: str) -> str:
    """First 4 md5 hex digits -> int in [0, 65535]: the DuckDB oracle
    twin of ``hex4_to_int``, living beside it so the two renderings of
    the one idiom can't drift (moved here from packing in round 10 —
    importing it from packing created text<->packing import cycles)."""
    return (
        "("
        + " + ".join(
            f"(strpos('{HEX_DIGITS}', substr({hexpr}, {p + 1}, 1)) - 1) * {16 ** (3 - p)}"
            for p in range(4)
        )
        + ")"
    )


def weighted_classify(
    u: Column,
    normal_rate: float = 0.85,
    delayed_rate: float = 0.10,
) -> Column:
    """Weighted categorical split (F8, py:463-472): bind the uniform draw
    ONCE (the reference's bug class of re-drawing per branch is avoided by
    taking ``u`` as an argument). Defaults 0.85/0.10/0.05 (py:47-49)."""
    return (
        F.when(u < F.lit(normal_rate), F.lit("normal"))
        .when(u < F.lit(normal_rate + delayed_rate), F.lit("delayed"))
        .otherwise(F.lit("never"))
    )


def build_phone_number(area: Column, exchange: Column, number: Column) -> Column:
    """F5 (py:393-397): phone = concat(area, exchange, number) as BIGINT.
    Done arithmetically so it never leaves codegen."""
    return (area.cast("long") * 10_000_000 + exchange.cast("long") * 10_000 + number.cast("long")).alias(
        "phone_number"
    )


def fmt_hhmmss_ms(ms: Column) -> Column:
    """F4 (py:755): ms-epoch → 'HH:MM:SS' (UTC) display string.

    Pure arithmetic (floor-div/mod/lpad), NOT date_format: the result is
    independent of the session timezone, so oracle parity holds under
    any caller-built SparkSession without mutating session config."""
    total_s = F.floor(ms / 1000).cast("long") % 86400
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    return F.concat(
        two((total_s / 3600).cast("int")),
        F.lit(":"),
        two(((total_s % 3600) / 60).cast("int")),
        F.lit(":"),
        two((total_s % 60).cast("int")),
    )


def fmt_hhmmss(ts: Column) -> Column:
    """F4 over a TimestampType column."""
    return fmt_hhmmss_ms(F.unix_millis(ts))
