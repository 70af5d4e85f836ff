"""Join utilities for scale pathologies: key-skew salting and bucketed
co-location.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime by splitting oversized partitions; explicit salting is the
static fallback for the worst case — one join key holding a material
fraction of all rows, where even a split partition re-concentrates on the
same executor in later stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to skew in ``skewed[on]``.

    The skewed side gets a deterministic salt in [0, n_salt) (hash of the
    whole row, so re-runs salt identically); the other side is replicated
    once per salt value. Joining on (key, salt) splits each hot key's rows
    across n_salt shuffle partitions instead of one. Cost: the other side
    is shuffled n_salt times larger — use when `other` is the smaller
    input but too big to broadcast outright.

    Result is value-identical to ``skewed.join(other, on, how)``.
    """
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salt)).cast("int")
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    # Pin a SHUFFLED hash join (r12): without the hint the planner
    # broadcast-joins whenever the n_salt-times-replicated dim side still
    # fits the size estimate — which (a) erases the salted exchange this
    # utility exists to provide (a broadcastable dim never needed
    # salting), and (b) builds the n_salt-times-inflated relation
    # SINGLE-THREADED on the driver (measured r12: the broadcast build of
    # the 8x-replicated orders side made the demo query ~40% slower than
    # the salted shuffle it replaced). SHUFFLE_HASH keeps the per-
    # partition build on the replicated side — n_salt-ways smaller per
    # task by construction — and no sort on the skewed side.
    return salted.join(
        replicated.hint("shuffle_hash"), [on, SALT_COL], how
    ).drop(SALT_COL)
