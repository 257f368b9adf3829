"""Generic as-of (temporal) join — an operator Spark lacks natively.

``asof_join_backward(left, right, ...)`` attaches, to every left row, the
most recent right row with ``right_ts <= left_ts`` within the same key —
the standard point-in-time enrichment (trades->quotes, clicks->purchases,
block events->oracle prices).

Shape chosen for scale: tag both sides, UNION, and run ONE window pass
(``last(ignorenulls=True)`` of the right row packed as a single struct,
over rows up to the current one) partitioned by key and ordered by
(ts, side) — right rows sort before left rows at equal timestamps, so
exact-timestamp matches are included. This is a single
shuffle on the key with a per-partition sort; the alternative range join
explodes into O(left x right) pairs per key before filtering, which dies at
scale. (pandas.merge_asof is the single-node reference semantics; the test
checks against it.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _orderable(dt: T.DataType) -> bool:
    """Whether Spark can ORDER BY a column of this type (maps cannot)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
    tolerance=None,
) -> DataFrame:
    """Left rows + the latest right ``value_cols`` as of ``left_on``.

    ``by``: equality keys present on both sides. ``left_on``/``right_on``:
    orderable timestamp (or block-number) columns. ``value_cols``: right
    columns to attach (default: all right columns except keys and ts);
    attached columns are NULL when no right row precedes the left row.
    ``direction``: ``backward`` = latest right row at-or-before the left
    row; ``forward`` = earliest right row at-or-after it; ``nearest`` =
    whichever of the two is closer in time (ties go backward, matching
    pandas.merge_asof). Exact-timestamp matches are included in every
    direction (the side-order tiebreak places right rows inside the frame
    at equal timestamps; for ``nearest`` an exact match has gap 0 and
    wins outright).

    ``tolerance``: maximum allowed gap between the left row and its
    match; a match farther than this is dropped (the attached columns are
    NULL), and under ``nearest`` a side outside tolerance is disqualified
    BEFORE choosing, so the other side can still match — pandas
    semantics. Pass a value comparable with the timestamp difference:
    an int for numeric ts columns, ``F.expr("INTERVAL 30 MINUTES")`` for
    timestamps. ``nearest``/``tolerance`` cost nothing extra structurally:
    both directions' picks are frames of the SAME window sort, so Spark
    runs them in one shuffle + one per-partition sort pass.

    Duplicate right rows on ``(by, right_on)`` resolve DETERMINISTICALLY:
    ``tiebreak`` (a right column name, e.g. a unique id) is appended to the
    window order, so the attached row is the one with the greatest tiebreak
    (backward) / least (forward) among the tied timestamps — stable across
    partitionings and retries, never whichever row the shuffle happened to
    sort last. Without ``tiebreak`` the packed value struct itself is the
    tie-break key (field-by-field comparison), which requires every value
    column to be orderable (no maps) — pass an explicit ``tiebreak`` for
    unorderable payloads.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tiebreak is not None and tiebreak not in right.columns:
        raise ValueError(f"tiebreak column {tiebreak!r} not in right columns")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, right_on)]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"value_cols {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )

    if "_asof_mts" in value_cols:
        raise ValueError("value column name _asof_mts is reserved")
    # at equal timestamps the right row must fall INSIDE the left row's
    # frame: before it for backward (preceding frame), after for forward.
    # nearest uses the backward layout — an exact-ts right row lands in
    # the preceding frame with gap 0 and wins the distance comparison, so
    # it never needs to be visible to the forward frame too.
    left_order, right_order = (0, 1) if direction == "forward" else (1, 0)
    # the matched right row travels as ONE struct: per-column last/first
    # with ignorenulls would skip a NULL field of the latest right row and
    # substitute a staler value — stitching together a "row" that never
    # existed; picking the struct is atomic (and NULL only on left rows).
    # the match's own timestamp rides in the struct (_asof_mts) so the
    # tolerance gate and the nearest distance comparison can see it.
    val_struct = F.struct(
        F.col(right_on).alias("_asof_mts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    struct_type = (
        right.select(val_struct.alias("_asof_vals")).schema["_asof_vals"].dataType
    )
    if tiebreak is not None:
        tb_col, tb_type = F.col(tiebreak), right.schema[tiebreak].dataType
    else:
        if not _orderable(struct_type):
            raise ValueError(
                "value struct contains an unorderable type (map); pass an "
                "explicit tiebreak column for deterministic tie resolution"
            )
        tb_col, tb_type = val_struct, struct_type
    l_tag = left.select(
        *by,
        F.col(left_on).alias("_asof_ts"),
        F.lit(left_order).alias("_side_order"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left.columns if c not in by],
        F.lit(None).cast(struct_type).alias("_asof_vals"),
        F.lit(None).cast(tb_type).alias("_asof_tb"),
    )
    r_tag = right.select(
        *by,
        F.col(right_on).alias("_asof_ts"),
        F.lit(right_order).alias("_side_order"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by
        ],
        val_struct.alias("_asof_vals"),
        tb_col.alias("_asof_tb"),
    )
    unioned = l_tag.unionByName(r_tag)
    # _asof_tb last: it only disambiguates RIGHT rows tied on (ts); sides
    # are already separated by _side_order, and left rows' NULL tiebreak
    # cannot reorder them relative to right rows
    base = Window.partitionBy(*by).orderBy("_asof_ts", "_side_order", "_asof_tb")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    picked_b = F.last("_asof_vals", ignorenulls=True).over(wb)
    picked_f = F.first("_asof_vals", ignorenulls=True).over(wf)

    def _gated(picked, gap):
        """The pick, disqualified when absent or outside tolerance."""
        ok = picked.isNotNull()
        if tolerance is not None:
            tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
            ok = ok & (gap <= tol)
        return ok

    null_struct = F.lit(None).cast(struct_type)
    gap_b = F.col("_asof_ts") - picked_b.getField("_asof_mts")
    gap_f = picked_f.getField("_asof_mts") - F.col("_asof_ts")
    if direction == "backward":
        chosen = F.when(_gated(picked_b, gap_b), picked_b).otherwise(null_struct)
    elif direction == "forward":
        chosen = F.when(_gated(picked_f, gap_f), picked_f).otherwise(null_struct)
    else:  # nearest: closest qualifying side, ties backward (pandas)
        ok_b, ok_f = _gated(picked_b, gap_b), _gated(picked_f, gap_f)
        chosen = (
            F.when(ok_b & (~ok_f | (gap_b <= gap_f)), picked_b)
            .when(ok_f, picked_f)
            .otherwise(null_struct)
        )
    filled = unioned.select(
        *by,
        "_asof_ts",
        "_is_left",
        *[F.col(c) for c in left.columns if c not in by],
        *[chosen.getField(c).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left", "_asof_ts")
