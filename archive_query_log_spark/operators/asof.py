"""As-of join (J3): nearest capture before/after a timestamp.

Reference semantics: for each result-block URL the reference scans captures
and takes min-by |ts − serp_ts| with ts ≤ serp_ts (backward) and ts ≥ serp_ts
(forward) (/root/reference/archive_query_log/captures/__init__.py:207-268:
``_capture_timestamp_distance`` + two ``min(..., key=distance)`` calls).

Scale design — union-merge, not join-explode: a naive equi-join on key then
min-by distance materializes |left|×|captures-per-key| rows. Instead we union
both sides tagged, hash-partition once on the key, sort within partitions,
and take the running ``last``/``first`` non-null right payload — ONE shuffle,
no row explosion (the classic sort-merge as-of plan, as in pandas.merge_asof,
expressed in Spark windows). 'nearest' computes the backward and forward
candidates in the SAME single pass and picks by distance (backward wins
ties, matching the reference's keep-earlier rule).

Determinism: right rows tied on (key, ts) are ordered by a hash of their
payload, so the picked row is identical at any parallelism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    right_payload: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    direction: 'backward' (right_ts ≤ left_ts), 'forward' (right_ts ≥
    left_ts), or 'nearest' (min |Δts|; backward wins ties).
    Output: all left columns + right payload columns suffixed +
    ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    keys = [on] if isinstance(on, str) else list(on)
    payload = right_payload if right_payload is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
        ).alias("_rpay"),
        F.lit(False).alias("_is_left"),
    )
    l_cols = list(left.columns)
    l_types = {f.name: f.dataType for f in left.schema.fields}
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(True).alias("_is_left"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    r = r.select(
        *keys, "_ts", "_rpay", "_is_left",
        *[F.lit(None).cast(l_types[c]).alias(f"_l_{c}") for c in l_cols],
    )
    u = l.unionByName(r)

    # total order: right rows sort BEFORE left rows at equal ts (so the
    # backward frame sees them); equal-(ts,side) right rows tie-break on a
    # payload hash → partition-invariant pick
    u = u.withColumn(
        "_side", F.when(F.col("_is_left"), F.lit(1)).otherwise(F.lit(0))
    ).withColumn("_tb", F.xxhash64(F.col("_rpay")))
    order = [F.asc("_ts"), F.asc("_side"), F.asc("_tb")]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    if direction == "backward":
        matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w_back))
    elif direction == "forward":
        # right rows at EQUAL ts must be visible forward → flip side order
        u2 = u.withColumn(
            "_side", F.when(F.col("_is_left"), F.lit(0)).otherwise(F.lit(1))
        )
        w_fwd2 = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_tb"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = u2.withColumn(
            "_m", F.first("_rpay", ignorenulls=True).over(w_fwd2)
        )
    else:  # nearest — both candidates in ONE pass over ONE shuffle
        matched = u.withColumn(
            "_mb", F.last("_rpay", ignorenulls=True).over(w_back)
        ).withColumn("_mf", F.first("_rpay", ignorenulls=True).over(w_fwd))
        # equal-ts rights sort before the left row → they land in _mb with
        # distance 0, which always wins, so _mf missing them is harmless
        d_b = F.abs(
            F.col("_ts").cast("double") - F.col("_mb._rts").cast("double")
        )
        d_f = F.abs(
            F.col("_ts").cast("double") - F.col("_mf._rts").cast("double")
        )
        use_b = F.col("_mf").isNull() | (
            F.col("_mb").isNotNull() & (d_b <= d_f)
        )
        matched = matched.withColumn(
            "_m", F.when(use_b, F.col("_mb")).otherwise(F.col("_mf"))
        )

    return matched.where(F.col("_is_left")).select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col(f"_m.{c}").alias(c + suffix) for c in payload],
        F.col("_m._rts").alias(right_ts + suffix),
    )
