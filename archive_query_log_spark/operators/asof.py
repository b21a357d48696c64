"""As-of join (J3): nearest capture before/after a timestamp.

Reference semantics: for each result-block URL the reference scans captures
and takes min-by |ts − serp_ts| with ts ≤ serp_ts (backward) and ts ≥ serp_ts
(forward) (/root/reference/archive_query_log/captures/__init__.py:207-268:
``_capture_timestamp_distance`` + two ``min(..., key=distance)`` calls).

Scale design — union-merge, not join-explode: a naive equi-join on key then
min-by distance materializes |left|×|captures-per-key| rows. Instead we union
both sides tagged, hash-partition once on the key, sort within partitions by
(ts, side), and take the running ``last``/``first`` non-null right payload —
one shuffle, no row explosion, and whole-stage-codegen window evaluation.
This is the classic sort-merge as-of plan (same as pandas.merge_asof /
QuestDB ASOF JOIN, expressed in Spark windows).
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

    direction: 'backward' (right_ts ≤ left_ts), 'forward' (right_ts ≥ left_ts)
    or 'nearest' (min |Δts|, backward wins ties — reference keeps the earlier
    capture on equal distance).
    Output: all left columns + right payload columns suffixed + ``{right_ts}{suffix}``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction == "nearest":
        b = asof_join(left, right, keys, left_ts, right_ts, "backward",
                      right_payload, suffix)
        f = asof_join(left, right, keys, left_ts, right_ts, "forward",
                      right_payload, suffix + "_fwd")
        join_cols = list(left.columns)
        both = b.join(f, on=join_cols, how="inner")
        ts_b = F.col(right_ts + suffix)
        ts_f = F.col(right_ts + suffix + "_fwd")
        d_b = F.abs(F.col(left_ts).cast("double") - ts_b.cast("double"))
        d_f = F.abs(F.col(left_ts).cast("double") - ts_f.cast("double"))
        use_b = ts_f.isNull() | (ts_b.isNotNull() & (d_b <= d_f))
        payload = right_payload or [c for c in right.columns if c not in keys and c != right_ts]
        out = both
        for c in payload:
            out = out.withColumn(
                c + suffix,
                F.when(use_b, F.col(c + suffix)).otherwise(F.col(c + suffix + "_fwd")),
            ).drop(c + suffix + "_fwd")
        out = out.withColumn(
            right_ts + suffix,
            F.when(use_b, ts_b).otherwise(ts_f),
        ).drop(right_ts + suffix + "_fwd")
        return out

    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    payload = right_payload or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in payload]
        ).alias("_rpay"),
        F.lit(None).cast("string").alias("_lid"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.monotonically_increasing_id().cast("string").alias("_lid"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    r = r.select(
        *keys, "_ts", "_rpay", "_lid",
        *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema.fields]))[c]).alias(f"_l_{c}") for c in l_cols],
    )
    u = l.unionByName(r)

    # at equal ts the right row must be visible to the left row:
    # backward → right sorts first; forward → right sorts last.
    if direction == "backward":
        u = u.withColumn(
            "_side", F.when(F.col("_lid").isNull(), F.lit(0)).otherwise(F.lit(1))
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("_ts"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    else:
        u = u.withColumn(
            "_side", F.when(F.col("_lid").isNull(), F.lit(1)).otherwise(F.lit(0))
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("_ts"), F.asc("_side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = u.withColumn("_m", F.first("_rpay", ignorenulls=True).over(w))

    out = matched.where(F.col("_lid").isNotNull()).select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col(f"_m.{c}").alias(c + suffix) for c in payload],
        F.col("_m._rts").alias(right_ts + suffix),
    )
    return out
