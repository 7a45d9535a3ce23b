"""Skew-salted equi-join (the brief's 'salting for skew' tool).

AQE's skew-join split handles most hot keys automatically
(``spark.sql.adaptive.skewJoin`` is on in session.py), but it only splits
the SORT-MERGE side of a completed shuffle stage; a key hot enough to
dwarf executor memory, or a skewed broadcast-ineligible dimension, still
wants explicit salting: the fact side's shuffle key becomes
``(key, salt)`` — a deterministic spread over ``salt`` reducers — and the
dimension side replicates each row across all salt values, so the hot
key's rows land on ``salt`` tasks instead of one.

The engine's built-in skew handling stays specialized (two-phase per-host
politeness budget, dedup bucket caps); this operator is the general form
for user joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``on`` with the fact side spread over ``salt``
    sub-keys. Result equals the plain join exactly (the salt is a pure
    routing column, deterministic via xxhash64 of the fact row so reruns
    partition identically). Supported ``how``: inner / left (dim is the
    replicated side, so right/full would duplicate unmatched dim rows)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    fact_salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)
    ).cast("int")
    f = fact.withColumn("_salt", fact_salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return f.join(d, on=on + ["_salt"], how=how).drop("_salt")
