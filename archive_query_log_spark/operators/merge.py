"""MERGE semantics over SnapshotTable (SURVEY.md S14/J6 → Iceberg MERGE INTO
equivalents).

Reference semantics reproduced:
- create-if-absent bulk writes (ES ``create`` op, config.py:75-107;
  captures/__init__.py:124-125): ``upsert_create_if_absent`` — deterministic
  key + left-anti join, the URL-seen-set primitive.
- existence merge with set-union of domains/prefixes
  (providers/__init__.py:30-83): ``merge_array_union``.
- flag updates (``update`` op): ``merge_update``.

All three are one-shuffle plans: anti/equi join on the key, then a snapshot
commit. With a real Iceberg catalog these become single MERGE INTO
statements; the join shape Catalyst would produce is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_query_log_spark.tables import SnapshotTable


def upsert_create_if_absent(
    spark: SparkSession, table: SnapshotTable, batch: DataFrame, key: str
) -> int:
    """Insert rows whose key is absent; re-runs can never duplicate.
    Returns the table version committed (or the current one if no-op)."""
    if table.exists():
        existing = table.read(spark).select(key).dropDuplicates([key])
        fresh = batch.dropDuplicates([key]).join(existing, on=key, how="left_anti")
    else:
        fresh = batch.dropDuplicates([key])
    return table.commit(fresh, op="append", meta={"op": "create_if_absent"})


def merge_update(
    spark: SparkSession,
    table: SnapshotTable,
    updates: DataFrame,
    key: str,
    set_cols: list[str],
) -> int:
    """UPDATE matched rows' columns (unmatched update rows are ignored)."""
    base = table.read(spark)
    upd = updates.select(
        key, *[F.col(c).alias(f"_u_{c}") for c in set_cols]
    ).dropDuplicates([key])
    out = base.join(upd, on=key, how="left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_u_{c}"), F.col(c)))
    out = out.drop(*[f"_u_{c}" for c in set_cols])
    return table.commit(out, op="overwrite", meta={"op": "merge_update"})


def merge_array_union(
    spark: SparkSession,
    table: SnapshotTable,
    incoming: DataFrame,
    key: str,
    array_cols: list[str],
) -> int:
    """J6: match on key; union array columns; insert unmatched incoming rows
    (the add-provider/add-archive merge, providers/__init__.py:30-83)."""
    base = table.read(spark)
    inc = incoming.dropDuplicates([key])
    inc_renamed = inc.select(
        key, *[F.col(c).alias(f"_i_{c}") for c in array_cols]
    )
    matched = base.join(inc_renamed, on=key, how="left")
    for c in array_cols:
        matched = matched.withColumn(
            c,
            F.when(
                F.col(f"_i_{c}").isNotNull(),
                F.array_sort(F.array_union(F.coalesce(F.col(c), F.array()), F.col(f"_i_{c}"))),
            ).otherwise(F.col(c)),
        )
    matched = matched.drop(*[f"_i_{c}" for c in array_cols])
    new_rows = inc.join(base.select(key), on=key, how="left_anti")
    out = matched.unionByName(new_rows, allowMissingColumns=True)
    return table.commit(out, op="overwrite", meta={"op": "merge_array_union"})
