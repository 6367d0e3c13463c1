"""Skew-handling utilities (SURVEY.md §4.2): salting for hot keys, bucketed
co-located joins.

AQE's skew-join splitting handles most skew automatically at runtime; these
helpers cover the two cases it can't:

* **salted aggregation** — a groupBy whose hot key overwhelms one reducer
  even after AQE splitting (AQE splits join partitions, not agg state):
  two-phase partial aggregation over (key, salt) then key.
* **salted join** — replicate the small side per salt so a skewed probe
  key spreads over N reducers; for joins where AQE's split is unavailable
  (e.g. under a required distribution).
* **bucketed tables** — pre-shuffled storage so repeated equi-joins on the
  bucket key run with NO exchange at read time; the 100 TB answer to
  "this join happens every hour".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Salt in [0, n_salts) that spreads even FULLY IDENTICAL rows.

    A pure row-hash salt sends duplicate rows (the classic hot-key shape)
    to one bucket, defeating the whole point; mixing in
    monotonically_increasing_id spreads them. The salt value is therefore
    not stable across runs — which is fine everywhere salting is valid:
    downstream results (aggregates, join matches) are salt-independent.
    Declared oracle queries avoid salting (purity rule, SURVEY §4.2) with
    one sanctioned exception: q_agg_salted, whose result the algebra makes
    salt-independent (exact-integer sum-of-sums — see its docstring).
    """
    return df.withColumn(
        col_name,
        F.pmod(F.hash(*df.columns) + F.monotonically_increasing_id(), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    partial_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) with ``partial_aggs``,
    then groupBy(keys) with ``aggs`` over the partials.

    Caller provides both phases because not every aggregate is trivially
    mergeable (sum/count are; avg must be carried as sum+count). Example:

        salted_agg(df, ["k"],
                   aggs=[F.sum("_ps").alias("total")],
                   partial_aggs=[F.sum("v").alias("_ps")])
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side once
    per salt value, join on (key, salt). The small side grows n_salts×
    (it was broadcast-sized anyway); the hot key's rows spread over
    n_salts reducers.

    Only inner/left/left_semi are supported: replicating the small side
    would emit each UNMATCHED small row n_salts times under right/full
    outer semantics."""
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r} "
            "(small-side replication breaks right/full outer semantics)"
        )
    big_s = with_salt(big, n_salts)
    small_s = small.withColumnRenamed(key, "_rkey").withColumn(
        "_rsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (big_s[key] == small_s["_rkey"]) & (big_s["_salt"] == small_s["_rsalt"])
    return big_s.join(small_s, cond, how).drop("_rkey", "_salt", "_rsalt")
