"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame operators
(the brief's preferred path for missing operators) — no Pandas UDFs, no
cross joins:

* :func:`asof_join` — for every left row, the most recent right row
  with ``right.ts <= left.ts`` on the same key. One shuffle total: tag
  the two sides, union, and sweep a ``last(..., ignorenulls=True)``
  window per key — the classic union-sweep as-of join. A sort-merge
  as-of (Pandas ``merge_asof``) would need a per-key iterator; the
  union-sweep gets identical semantics from one window over one
  key-hash exchange, which AQE can skew-split.
* :func:`range_join` — equi-key + bounded time-interval join
  (``left.ts - window <= right.ts <= left.ts``). Naive inequality
  joins degenerate to per-key cross products; this one buckets time
  into ``window``-sized bins so each left row joins exactly two
  candidate (key, bin) buckets, then refines with the exact predicate.
  Candidate count is O(matches + rows), not O(rows_l x rows_r).

100 TB notes: both shapes are single-exchange (hash by key, or by
(key, bin)); neither collects, broadcasts the big side, or explodes
unboundedly. The bin size IS the window, so the bucket fan-out is a
constant 2 regardless of data volume; skewed keys fall to AQE
skew-join handling like any other equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """As-of join: attach to each left row the latest right row at or
    before its timestamp (per ``on`` key). Left rows with no prior
    right row keep nulls — a left-outer as-of.

    Right-side ties at the same (key, ts) must be pre-resolved by the
    caller (e.g. argmax by id) — the sweep takes whichever sorts last,
    so a non-distinct (key, ts) right side is nondeterministic.

    Returns the left columns plus ``<ts_col><suffix>`` and each value
    column as ``<col><suffix>``.
    """
    picked = [ts_col, *value_cols]
    # Build the union with a left-payload struct and a right-payload
    # struct (null on the opposite side) so the window's
    # last(ignorenulls) carries the latest right payload onto left rows.
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    r_payload = F.struct(*[F.col(c) for c in picked])
    l_type = left.select(l_payload.alias("p")).schema["p"].dataType
    r_type = right.select(r_payload.alias("p")).schema["p"].dataType
    lu = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    ru = right.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        r_payload.alias("__r"),
    )
    # Right rows sort BEFORE left rows at equal ts (side desc: 1 then 0)
    # so right.ts == left.ts counts as "at or before" — inclusive as-of.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = (
        lu.unionByName(ru)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 0)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in picked
    ]
    return swept.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts_col: str = "ts",
    window_seconds: int,
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
) -> DataFrame:
    """Inner range join: all (left, right) pairs on the same key with
    ``left.ts - window_seconds <= right.ts <= left.ts`` (inclusive both
    ends). Output = left columns + suffixed right ts/value columns.

    Plan shape: both sides get a time bin ``floor(epoch / window)``;
    the left side explodes to its two candidate bins (own + previous —
    any right row within the window lies in one of those), the join is
    a plain equi-join on (key, bin), and the exact interval predicate
    refines. Catalyst pushes the bin computation into the scan
    projection; the only wide op is the (key, bin) hash join.
    """
    win = F.lit(int(window_seconds))
    l_bin = F.floor(F.unix_timestamp(F.col(ts_col)) / win)
    r = right.select(
        F.col(on).alias("__k"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / win).alias("__bin"),
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    l = left.select(
        "*",
        F.col(on).alias("__k"),
        F.explode(F.array(l_bin, l_bin - 1)).alias("__bin"),
    )
    # Bin cover proof: bins use second-truncated epochs, but for integer
    # window w, r >= l - w implies trunc(r) >= trunc(l) - w, hence
    # floor-bin(l) - floor-bin(r) in {0, 1} — the two candidate bins are
    # exhaustive. The refinement below is full-precision timestamp
    # arithmetic (inclusive both ends), so truncation never leaks into
    # the result.
    ivl = F.expr(f"INTERVAL {int(window_seconds)} SECOND")
    joined = l.join(r, ["__k", "__bin"]).where(
        (F.col("__rts") <= F.col(ts_col)) & (F.col("__rts") >= F.col(ts_col) - ivl)
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        F.col("__rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in right_cols],
    )
