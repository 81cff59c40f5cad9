"""As-of (point-in-time) join — the engine's most reused custom operator.

Reference semantics (cited into /root/reference):
  - ``Structured.get_linked`` structured/structured.py:274-328 — correlated
    ``MAX(link_date) <= data.date`` subquery join (J1).
  - ``Structured.get_permnos`` structured/structured.py:230-272 (J2).
  - ``Lookup.__call__`` structured/structured.py:330-373 (J3).
  - inexact ``get_many`` structured/stocks.py:296-352 (J6).
  - prevailing-quote alignment readers/taq.py:383-414 (W8).

Spark has no native as-of join, so we provide two physical strategies and
pick per cardinality:

``union``  (default, scale path) — tag left/right rows, union, and
    forward-fill the right-side payload over an event-time-ordered window
    partitioned by the join keys.  One shuffle of each side on ``by``; no
    join fan-out, no row explosion, skew-tolerant (hot keys stay one
    partition but never multiply).  This is how you as-of join two 100 TB
    streams.

``join``   — equi-join on ``by`` with ``right_on <= left_on`` then keep the
    latest right row per left row via ``row_number``.  Fan-out equals right
    history length per key; correct choice only when the right side is a
    small dimension (links/names/calendar) that Spark will broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LSTRUCT = "__asof_left__"
_T = "__asof_t__"
_SRC = "__asof_src__"
_MATCHED_T = "__asof_matched_t__"


def _dedupe_right(
    right: DataFrame, by: list[str], right_on: str, tiebreak: str | None
) -> DataFrame:
    """Keep one right row per (by, right_on): the max-tiebreak row.

    As-of semantics resolve to *a single* prevailing right row; when several
    right rows share a timestamp the reference keeps the last after sorting
    (database/sql.py:49-52 keep='last').
    """
    if tiebreak is None:
        return right.dropDuplicates(by + [right_on])
    w = Window.partitionBy(*by, right_on).orderBy(F.col(tiebreak).desc())
    return (
        right.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_on: str,
    right_on: str | None = None,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: Column | int | float | None = None,
    strategy: str = "union",
    right_tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: attach the prevailing ``right`` row to each left row.

    For ``direction='backward'`` the prevailing row is the right row with
    the greatest ``right_on`` <= (< if not allow_exact_matches) ``left_on``
    within the same ``by`` group; ``'forward'`` mirrors it.  Left rows with
    no match keep nulls (left-outer semantics, matching the reference's
    ``LEFT JOIN`` in structured/structured.py:297-303).

    ``tolerance`` (same units as the on-columns' difference) null-outs
    matches farther than the tolerance, like ``pandas.merge_asof``.
    """
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or left_on
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if strategy not in ("union", "join"):
        raise ValueError(f"strategy must be union|join, got {strategy!r}")

    payload = [c for c in right.columns if c not in by and c != right_on]
    right = _dedupe_right(right, by, right_on, right_tiebreak)
    # Resolve name collisions with the left schema up front so downstream
    # plans never carry ambiguous column names.
    renamed = []
    for c in payload:
        out = c + suffix if c in left.columns else c
        if out != c:
            right = right.withColumnRenamed(c, out)
        renamed.append(out)
    payload = renamed

    if strategy == "join":
        df = _asof_by_join(
            left, right, by, left_on, right_on, direction, allow_exact_matches, payload
        )
    else:
        df = _asof_by_union(
            left, right, by, left_on, right_on, direction, allow_exact_matches, payload
        )

    if tolerance is not None:
        # numeric gap regardless of column type: timestamps/dates diff in
        # seconds, numerics in their own units
        lt, rt = F.col(left_on), F.col(_MATCHED_T)
        ltype = df.schema[left_on].dataType.simpleString()
        if ltype in ("timestamp", "date", "timestamp_ntz"):
            lt, rt = lt.cast("timestamp").cast("double"), rt.cast("timestamp").cast("double")
        gap = (lt - rt) if direction == "backward" else (rt - lt)
        keep = F.col(_MATCHED_T).isNotNull() & (gap <= F.lit(tolerance))
        for c in payload:
            df = df.withColumn(c, F.when(keep, F.col(c)))
    return df.drop(_MATCHED_T)


def _asof_by_union(left, right, by, left_on, right_on, direction, exact, payload):
    # Tag sides; pack every left column into one struct so the union schema
    # is independent of the left schema and no join-back is needed.
    backward = direction == "backward"
    # Ordering at equal timestamps: for exact matches the right row must be
    # visible to a same-timestamp left row => right sorts first (backward).
    right_rank, left_rank = (0, 1) if exact else (1, 0)
    l_tagged = left.select(
        *[F.col(k) for k in by],
        F.col(left_on).cast(right.schema[right_on].dataType).alias(_T),
        F.lit(left_rank).alias(_SRC),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LSTRUCT),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        F.lit(None).cast(right.schema[right_on].dataType).alias(_MATCHED_T),
    )
    r_tagged = right.select(
        *[F.col(k) for k in by],
        F.col(right_on).alias(_T),
        F.lit(right_rank).alias(_SRC),
        F.lit(None).cast(l_tagged.schema[_LSTRUCT].dataType).alias(_LSTRUCT),
        *[F.col(c) for c in payload],
        F.col(right_on).alias(_MATCHED_T),
    )
    u = l_tagged.unionByName(r_tagged)
    order = [F.col(_T).asc(), F.col(_SRC).asc()] if backward else [
        F.col(_T).desc(),
        F.col(_SRC).asc(),
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        F.col(_LSTRUCT),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload],
        F.last(F.col(_MATCHED_T), ignorenulls=True).over(w).alias(_MATCHED_T),
    ).filter(F.col(_LSTRUCT).isNotNull())
    left_cols = [F.col(_LSTRUCT)[c].alias(c) for c in left.columns]
    return filled.select(*left_cols, *[F.col(c) for c in payload], F.col(_MATCHED_T))


def _asof_by_join(left, right, by, left_on, right_on, direction, exact, payload):
    lid = "__asof_lid__"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    lo, ro = F.col("l." + left_on), F.col("r." + right_on)
    if direction == "backward":
        cond = (ro <= lo) if exact else (ro < lo)
        order = ro.desc()
    else:
        cond = (ro >= lo) if exact else (ro > lo)
        order = ro.asc()
    on = [F.col("l." + k) == F.col("r." + k) for k in by]
    joined = l.alias("l").join(right.alias("r"), on + [cond], "left")
    w = Window.partitionBy(F.col("l." + lid)).orderBy(order)
    ranked = joined.withColumn("__rn__", F.row_number().over(w)).filter(
        F.col("__rn__") == 1
    )
    return ranked.select(
        *[F.col("l." + c) for c in left.columns],
        *[F.col("r." + c).alias(c) for c in payload],
        F.col("r." + right_on).alias(_MATCHED_T),
    ).drop(lid)
