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


def key_skew_profile(df: DataFrame, on: str, n_tasks: int = 32) -> DataFrame:
    """Per-key skew audit of ``df[on]`` — the df-level body of the
    registered ``profile_key_skew`` query (one definition, shared): row
    count, parts-per-million share, a ``hot`` flag (key exceeds 2x the
    uniform per-task share at ``n_tasks``-way parallelism), and the
    integer salt factor that splits the key across ~target-sized tasks.
    All integer math (ppm, ceil-div) so the recommendation is
    engine-exact. One scan + a 1-row broadcast total."""
    k = df.groupBy(F.col(on).alias("key")).agg(F.count("*").alias("n_rows"))
    tot = k.agg(F.sum("n_rows").alias("total")).select(
        "total",
        F.expr(f"(total + {n_tasks - 1}) div {n_tasks}").alias("target"),
    )
    return k.crossJoin(F.broadcast(tot)).select(
        "key",
        "n_rows",
        F.expr("(n_rows * 1000000) div total").alias("share_ppm"),
        (F.col("n_rows") * n_tasks > F.col("total") * 2).alias("hot"),
        F.expr("(n_rows + target - 1) div target").alias("recommended_salt"),
    )


def profile_guided_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_tasks: int = 32,
    how: str = "inner",
    profile: DataFrame | None = None,
) -> DataFrame:
    """The profiler wired into the join strategy end-to-end: run the
    ``key_skew_profile`` pre-flight on the probe's key column (or accept a
    precomputed ``profile`` — at 100 TB the audit runs once per table
    release, not per join), then either

    - no hot key → the PLAIN join (no replication cost paid for nothing);
    - hot keys → ``salted_join`` at the MAX recommended salt factor across
      hot keys (the factor that flattens the worst key to ~target-sized
      tasks flattens every smaller one too).

    The strategy decision is a 1-row bounded driver agg (max salt over the
    hot rows — the pinned-threshold pattern); result is exactly the plain
    join's either way (driver-oracled by ``join_salt_guided``)."""
    if profile is None:
        profile = key_skew_profile(probe, on, n_tasks)
    max_salt = (
        profile.filter(F.col("hot"))
        .agg(F.max("recommended_salt"))
        .collect()[0][0]
    )
    if max_salt is None or max_salt <= 1:
        return probe.join(build, on, how)
    return salted_join(probe, build, on, num_salts=int(max_salt), how=how)


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
