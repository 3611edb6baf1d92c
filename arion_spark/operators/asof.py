"""Backward as-of join: latest right-side row at-or-before each left row.

Spark has no ASOF JOIN operator (DuckDB and kdb+ do).  The naive encoding
— a range join ``r.ts <= l.ts AND r.ts > l.ts - tolerance`` followed by a
per-left-row argmax — explodes to O(|L|·|R| within horizon) intermediate
rows and (without an equi-key) a BroadcastNestedLoopJoin.  At 10^12 turns
that join is the whole job.

This implementation uses the **union-merge** formulation instead, which
is the scale-correct shape for keyed as-of:

1. tag both sides, union them (narrow, no shuffle),
2. one shuffle: ``Window.partitionBy(key).orderBy(ts, side, ord)`` with
   the right side sorting *before* the left at equal ``ts`` (at-or-before
   includes ties),
3. ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame carries the most recent right row forward,
4. keep left rows; null out matches older than ``tolerance``.

Cost: ONE hash shuffle on the key + an in-partition sort — identical to
the cost of any keyed aggregation over the same data, independent of how
many right rows precede each left row.  Skewed keys can reuse the salting
pattern from streaming/join.py (salt both sides, as-of within salt, then
a second argmax merge across salts).

Ties inside the right side at equal ``ts`` are broken deterministically
by ``ord`` (caller-supplied total order, e.g. turn_idx): the LAST in
``ord`` wins, matching ``max_by(payload, (ts, ord))`` semantics that the
DuckDB oracle uses.

Reference analog: arion correlates a derived output back to the source
record that produced it inside one operation context
(reference: src/arion.cpp:618-686); the as-of join is the relational
form of "attach the most recent upstream record" at 10^12-turn scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    ord_col: str = "turn_idx",
    payload_cols: tuple[str, ...] = (),
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Return ``left`` with ``asof_ts`` + ``asof_<payload>`` columns.

    ``left`` and ``right`` must share ``on`` (equi-key), ``ts`` (event
    time) and ``ord_col`` (deterministic tie-break within equal ts).
    ``direction='backward'`` matches the latest right row with
    ``r.ts <= l.ts``; ``'forward'`` the earliest with ``r.ts >= l.ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")

    lcols = left.columns
    # Tag sides; right rows carry the payload, left rows carry NULLs.
    rtag = right.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.col(ord_col).alias(ord_col),
        F.lit(0).alias("_side"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
    )
    ltag = left.select(
        F.col(on).alias(on),
        F.col(ts).alias(ts),
        F.col(ord_col).alias(ord_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in payload_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = rtag.unionByName(ltag)

    if direction == "backward":
        # right(0) before left(1) at equal ts → at-or-before includes ties;
        # LAST right row in (ts, ord) order wins.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col(ord_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        # forward: left(1) before right(0)... equal ts must still match, so
        # order right first DESC overall and scan from the end instead.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col(ts).desc(), F.col("_side").asc(), F.col(ord_col).desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = [F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts")] + [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
        for c in payload_cols
    ]
    # ignorenulls=last-non-null: at equal (key, ts) the frame already holds
    # the right rows, so ties match; ord ASC puts the max-ord right row last.
    matched = unioned.select("*", *carried).where(F.col("_side") == 1)

    if tolerance_s is not None:
        if direction == "backward":
            in_tol = F.col("_m_ts") >= F.col(ts) - F.expr(
                f"INTERVAL {int(tolerance_s)} SECOND"
            )
        else:
            in_tol = F.col("_m_ts") <= F.col(ts) + F.expr(
                f"INTERVAL {int(tolerance_s)} SECOND"
            )
    else:
        in_tol = F.lit(True)

    keep: list[Column] = [F.col(f"_l_{c}").alias(c) for c in lcols]
    keep.append(F.when(in_tol, F.col("_m_ts")).alias("asof_ts"))
    for c in payload_cols:
        keep.append(F.when(in_tol, F.col(f"_m_{c}")).alias(f"asof_{c}"))
    return matched.select(*keep)
