"""Skew mitigation utilities.

AQE's skew-join splitting (on by default, ``session.py``) handles skewed
*sort-merge* joins at runtime. Two cases remain where manual salting is
the standard tool on a 1000-executor cluster:

- a shuffled hash/broadcast-impossible join whose build side is too big
  to broadcast but whose probe side has a few pathological keys (one app
  producing 40% of all events is the canonical History-Server skew);
- deterministic plans (AQE redistribution changes task boundaries, which
  some exactly-once sinks care about).

``salted_join`` implements the classic scheme: the skewed side gets a
deterministic salt in ``[0, salt)`` derived by hashing its key columns
plus a discriminator column, the small-but-unbroadcastable side is
replicated ``salt`` times, and the join key becomes ``(key, _salt)`` —
splitting each hot key's rows across ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
    discriminator: str | None = None,
) -> DataFrame:
    """Equi-join ``left`` (the skewed, large side) with ``right`` (the
    side small enough to replicate ``salt``× but too big to broadcast),
    splitting every hot key across ``salt`` reducers.

    The salt is **deterministic**: ``xxhash64`` of the join key plus
    ``discriminator`` (defaults to the first non-key column of ``left``),
    so retries and re-runs produce identical partitioning — unlike
    ``rand()``-based salting, which breaks exactly-once sinks.

    Correctness is shape-independent: each left row carries ONE salt
    value, and the right side exists under EVERY salt value, so the
    joined multiset equals the unsalted join's (asserted in
    ``tests/test_plans.py``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if discriminator is None:
        non_key = [c for c in left.columns if c not in keys]
        if not non_key:
            raise ValueError("need a discriminator column to spread salt")
        discriminator = non_key[0]
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*keys, discriminator), F.lit(salt))
    )
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(replicated_right, keys + [SALT_COL], how)
    return out.drop(SALT_COL)
