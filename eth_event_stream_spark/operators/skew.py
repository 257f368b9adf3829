"""Skew-aware join strategies for hot keys.

At 100 TB a handful of hot join keys (the zero address, a popular contract,
an empty-string bucket) can pin one reducer while 999 executors idle. Two
standard remedies, both as plain DataFrame rewrites:

- ``salted_join``: explode the *build* side R ways, salt the probe side with
  ``crc32 % R`` — every hot key spreads over R reducers. Exact same result
  as the plain join (verified by test), R× the build side's shuffle volume.
  Use when the hot side is the probe (fact) and the build side is small-ish
  but above the broadcast threshold.
- ``two_path_join``: split the probe into hot / cold partitions by a key
  list (from stats or a cheap pre-count), broadcast-join the hot slice
  (hot keys are few by definition, so their build rows fit in a broadcast),
  shuffle-join the cold rest, union. No replication cost on the cold path.

AQE's skew-join (enabled in session defaults) handles moderate skew at
runtime by splitting oversized partitions; these rewrites are for the
degenerate cases AQE can't fix (a single key larger than an executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe.on == build.on` with the hot-key pressure spread over
    ``num_salts`` reducers. Result is exactly the plain join's — for
    probe-preserving join types only: the build side is REPLICATED num_salts
    ways, so right/full outer joins would emit unmatched build rows
    num_salts times (rejected up front rather than silently wrong)."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports probe-preserving joins {sorted(_SALT_SAFE_HOW)}; "
            f"{how!r} would duplicate unmatched build rows {num_salts}x"
        )
    salted_probe = probe.withColumn(
        "_salt", (F.crc32(F.col(on).cast("string")) % num_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    salted_build = build.select("*", salts)
    out = salted_probe.join(salted_build, [on, "_salt"], how)
    return out.drop("_salt")


def two_path_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    hot_keys: list,
    how: str = "inner",
) -> DataFrame:
    """Hot keys take the broadcast path, cold keys the shuffle path.

    NULL join keys route to the cold path explicitly: ``~isin(hot)`` is NULL
    (not true) for NULL keys, so without the isNull disjunct a left join
    would silently drop NULL-key probe rows the plain join preserves."""
    hot_keys = [h for h in hot_keys if h is not None]  # see top_keys docstring
    if not hot_keys:
        return probe.join(build, on, how)
    hot_probe = probe.filter(F.col(on).isin(hot_keys))
    cold_probe = probe.filter(F.col(on).isNull() | ~F.col(on).isin(hot_keys))
    hot_build = build.filter(F.col(on).isin(hot_keys))
    cold_build = build.filter(F.col(on).isNull() | ~F.col(on).isin(hot_keys))
    hot = hot_probe.join(F.broadcast(hot_build), on, how)
    cold = cold_probe.join(cold_build, on, how)
    return hot.unionByName(cold)


def top_keys(df: DataFrame, on: str, k: int = 10, min_count: int = 1000) -> list:
    """Cheap hot-key detection: top-k keys by count above a floor. At scale,
    run on a sample (``df.sample(0.001)``) — hot keys survive sampling.

    NULL is excluded even when it is the biggest group: it never matches an
    equi-join (no broadcast benefit), and a NULL inside an ``isin`` list
    poisons the complement filter (``~isin`` becomes NULL for every
    non-member, silently dropping the whole cold path)."""
    rows = (
        df.filter(F.col(on).isNotNull())
        .groupBy(on)
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.desc("count"), F.asc(on))
        .limit(k)
        .collect()
    )
    return [r[on] for r in rows]
