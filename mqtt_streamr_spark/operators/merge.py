"""Incremental merge operators: last-write-wins upsert and SCD Type-2
dimension merge.

The reference has no batch merge surface (SURVEY.md §2 — it is a
record-at-a-time stream router); these are the incremental-refresh
operations a large-scale training-data pipeline needs: fold a batch of
changes into a snapshot without rewriting history (upsert) or while
KEEPING history as validity intervals (SCD2), the same contract as
Delta/Iceberg ``MERGE INTO`` expressed as pure DataFrame ops over plain
parquet.

Scale design: both operators shuffle ONCE on the merge key. ``upsert``
is union + per-key window (no join); ``scd2_merge`` joins only the OPEN
slice of the snapshot against the (deduplicated) change batch — closed
history rows pass through untouched, so cost tracks the live keyset +
change volume, not accumulated history. Change batches are usually tiny
vs the snapshot: Spark's AQE broadcasts the change side automatically
when it fits, making the merge a map-side join over the snapshot scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def upsert(snapshot: DataFrame, changes: DataFrame, key_cols: list[str],
           ts_col: str, tie_cols: list[str] | None = None) -> DataFrame:
    """Last-write-wins upsert: the merged snapshot keeps, per key, the row
    with the greatest ``ts_col`` (change batch wins ties — it is the later
    write even when timestamps collide).

    ``tie_cols`` (optional, ordered desc after the timestamp) make
    same-timestamp resolution deterministic by VALUE rather than by
    side/arrival. That matters when the merge is applied incrementally
    (e.g. per micro-batch in foreachBatch): value-based tie-breaks are
    associative, so folding batch-by-batch converges to the same snapshot
    as one big merge — side-based ties depend on which batch a row
    arrived in.

    One shuffle: tag sides, union, row_number over (key) ordered by
    (ts desc, [tie_cols desc,] side desc), keep rank 1. No join, so no
    skew surface beyond the per-key window; a key's whole history is 1 +
    its in-batch change count, bounded by the batch.
    """
    tagged_snap = snapshot.withColumn("_src", F.lit(0))
    tagged_chg = changes.select(*snapshot.columns).withColumn(
        "_src", F.lit(1))
    unioned = tagged_snap.unionByName(tagged_chg)
    order = [F.col(ts_col).desc()]
    order += [F.col(c).desc() for c in (tie_cols or [])]
    order.append(F.col("_src").desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2_merge(snapshot: DataFrame, changes: DataFrame, key_col: str,
               tracked_cols: list[str], change_ts_col: str,
               valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """SCD Type-2 merge: fold a change batch into a versioned snapshot.

    ``snapshot`` rows carry ``valid_from``/``valid_to`` (NULL valid_to =
    open/current version). ``changes`` carries the key, the tracked
    attribute columns, and ``change_ts_col``. Per key, the outcome is:

    - key absent from the open slice  -> new open version (insert)
    - present, any tracked col differs (null-safe) -> close the open row
      at the change ts AND append a new open version
    - present, all tracked cols equal -> open row passes through (no-op
      changes must NOT spawn phantom versions)
    - closed history rows always pass through untouched

    Multiple changes to one key in a batch collapse to the latest by
    ``change_ts_col`` first (deterministic: ties broken by the tracked
    values themselves) — intra-batch intermediate states are not
    versioned, matching warehouse MERGE semantics.

    Plan shape: filter open slice -> ONE full-outer join with the batch
    (AQE-broadcast when the batch is small) -> per-row explode of 1-or-2
    output structs -> union with closed history. The explode matters:
    expressing close+reopen as a UNION of filtered branches makes
    Catalyst duplicate (and re-execute) the join subtree once per
    branch — the array-of-structs form keeps exactly one join node
    (plan-asserted in tests/test_plans.py). History is never joined.
    """
    open_rows = snapshot.filter(F.col(valid_to).isNull())
    closed_rows = snapshot.filter(F.col(valid_to).isNotNull())

    latest_w = Window.partitionBy(key_col).orderBy(
        F.col(change_ts_col).desc(), *[F.col(c).desc() for c in tracked_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(latest_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    chg = latest.select(
        F.col(key_col).alias("_k"),
        F.col(change_ts_col).alias("_ts"),
        *[F.col(c).alias(f"_new_{c}") for c in tracked_cols],
    )
    joined = open_rows.join(chg, open_rows[key_col] == chg["_k"], "full_outer")

    differs = F.lit(False)
    for c in tracked_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"_new_{c}"))
    is_update = F.col("_k").isNotNull() & F.col(key_col).isNotNull() & differs
    is_insert = F.col(key_col).isNull()

    def out_struct(c_map) -> F.Column:
        return F.struct(*[c_map(c).alias(c) for c in snapshot.columns])

    null_to = F.lit(None).cast(snapshot.schema[valid_to].dataType)
    kept = out_struct(lambda c: F.col(c))
    closed_now = out_struct(
        lambda c: F.col("_ts") if c == valid_to else F.col(c))
    new_version = out_struct(
        lambda c: F.col("_k") if c == key_col
        else F.col(f"_new_{c}") if c in tracked_cols
        else F.col("_ts") if c == valid_from
        else null_to if c == valid_to
        # untracked attribute: carried from the old open row (NULL for
        # brand-new keys)
        else F.col(c))

    rows = (
        F.when(is_insert, F.array(new_version))
        .when(is_update, F.array(closed_now, new_version))
        .otherwise(F.array(kept))
    )
    exploded = joined.select(F.explode(rows).alias("_r")).select("_r.*")
    return closed_rows.unionByName(exploded)


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """Diff two keyed snapshots into change rows: ``added`` (key only in
    new), ``removed`` (key only in old), ``changed`` (key in both, any
    compared column differing null-safely). Unchanged keys are dropped.

    The reverse of CDC-apply: deriving the change stream FROM two table
    versions (snapshot-based CDC, e.g. nightly vendor dumps). One
    full-outer equi-join shuffle on the key; comparison is a map-side
    null-safe conjunction, so cost is the join itself. Output columns:
    the keys + ``change_type`` + the new side's compared values (NULL
    for removed rows).
    """
    cmp_cols = compare_cols or [c for c in old.columns
                                if c not in key_cols]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_oc_{c}") for c in cmp_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in key_cols],
        *[F.col(c).alias(f"_nc_{c}") for c in cmp_cols],
    )
    cond = None
    for k in key_cols:
        e = F.col(f"_o_{k}") == F.col(f"_n_{k}")
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"_o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_n_{key_cols[0]}").isNotNull()
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}"))
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
              for k in key_cols],
            "change_type",
            *[F.col(f"_nc_{c}").alias(c) for c in cmp_cols],
        )
    )
