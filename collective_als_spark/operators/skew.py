"""Skew mitigation: salted joins for hot keys.

First line of defense at scale is AQE's skew-join split
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our
session) — it splits oversized shuffle partitions at runtime with no
code change. Salting is the explicit fallback for cases AQE can't fix:
a single key so hot one task still drowns, or skewed wide
transformations feeding a non-join operator.

Pattern: the skewed side gets a salt in [0, n_salts); the other side is
replicated once per salt value; the join key becomes (key, salt), so a
hot key's rows spread over n_salts tasks. Replication multiplies the
small side by n_salts — use only when that side is modest (dims,
factor tables), which is exactly the skewed-join case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` to ``other`` on ``on`` with salt-spread hot keys.

    Salt is ``rand(seed)``-derived on the skewed side (uniform spread of
    each key's rows regardless of value distribution); the other side
    explodes over the full salt range. For the supported join types the
    result equals a plain join — salting only changes the shuffle
    layout. Join types that preserve unmatched ``other`` rows
    (right/full outer) are rejected: replication would emit each
    unmatched ``other`` row once per salt value.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of "
            f"the replicated side would appear {n_salts}x (use a plain "
            f"join or salt the other side)"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if SALT in skewed.columns or SALT in other.columns:
        raise ValueError(f"column {SALT!r} already exists")
    salted = skewed.withColumn(SALT, (F.rand(seed) * n_salts).cast("int"))
    replicated = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, keys + [SALT], how).drop(SALT)
