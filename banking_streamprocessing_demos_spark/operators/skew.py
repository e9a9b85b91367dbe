"""Skew-aware join utilities (SURVEY §4 / 100 TB stance).

AQE's skew-join splitting handles most cases at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on by default in session.py);
``salted_join`` is the explicit fallback for the pathological case AQE
can't fix — a hot key on BOTH sides, or a skewed aggregation key.

Mechanics: replicate the small side ``salt_buckets`` times, scatter the
big side's hot keys across buckets with a deterministic salt, join on
(key, salt).  Row-for-row equivalent to the plain join (tested), but
the hot key's work spreads over ``salt_buckets`` tasks instead of one
straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with salt-scattered skew.

    ``small`` is replicated salt_buckets× (explode of a literal range —
    cheap for dimension-sized inputs); ``big`` rows get a deterministic
    salt from a hash of the full row so the scatter is stable across
    retries (no rand() → no recompute nondeterminism under task retry,
    which matters for exactly-once sinks).

    Only join types where the replicated small side cannot surface
    unmatched are allowed: right/full outer would emit ``salt_buckets``
    null-extended copies of an unmatched small row.
    """
    if how.lower().replace("_", "") in ("right", "rightouter", "full", "fullouter", "outer", "cross"):
        raise ValueError(f"salted_join does not support how={how!r} (small side is replicated)")
    # pmod, not abs(...)%n: abs(Long.MIN_VALUE) stays negative in two's
    # complement and would produce a salt no replicated bucket matches
    salt = F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).alias("__salt")
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")
