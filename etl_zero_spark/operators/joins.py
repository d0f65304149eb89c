"""Join utilities for the scale cases Catalyst doesn't solve alone.

The reference's joins are MySQL-executed SQL strings
(ETL_Pipeline_Entire/mapping.py:126,162-165); the engine's everyday
joins are plain ``df.join`` — AQE picks broadcast vs sort-merge and
splits moderately skewed partitions (``spark.sql.adaptive.skewJoin``,
on in session.py). This module covers what's left:

* ``salted_join`` — EXTREME key skew: one hot key whose rows exceed a
  single task's memory. AQE's skew-join splits oversized *partitions of
  the already-shuffled build side*, but both sides of one key still
  meet in one task; salting splits the hot key itself across
  ``n_salts`` tasks by widening the join key to (key, salt).
* bucketed co-located joins live on the write side — see
  ``catalog.Zone.write_bucketed`` (pay the fact table's shuffle once at
  write time, never at join time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-mitigating equi-join on a same-named ``key`` column.

    The big (skewed) side gains a uniform random salt in [0, n_salts);
    the small side replicates once per salt value. Joining on
    (key, salt) spreads a hot key's rows over ``n_salts`` tasks at the
    cost of an ``n_salts``-fold blow-up of the SMALL side only — the
    classic trade when the small side is broadcast-sized but the hot
    key is not.

    Correct for inner/left/left_semi/left_anti with ``big`` on the
    left: every (key, salt) the big side can produce exists on the
    replicated small side exactly when the key exists at all, so match
    semantics are unchanged. Row multiplicity is also unchanged: each
    big row carries ONE salt, so it meets each matching small row
    exactly once.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins, not {how!r} "
            "(a right/full join would need the salt on the other side)"
        )
    b = big.withColumn(_SALT, F.floor(F.rand(seed) * n_salts).cast("int"))
    # sequence of int literals explodes to int — matching the big side's
    # cast (a cast around a generator expression is not allowed)
    s = small.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return b.join(s, on=[key, _SALT], how=how).drop(_SALT)
