"""Keyed change-data-capture application — the lakehouse MERGE INTO shape.

``merge_apply`` applies a change set (insert/update/delete operations with
a per-key sequence) onto a keyed snapshot and returns the new snapshot —
the batch primitive behind CDC sinks, dimension refresh and upsert tables.
Spark has no MERGE over plain parquet frames; the relational decomposition
here is the standard one (Delta/Iceberg execute the same plan internally):

  1. latest-change dedup: one row_number window keyed on the merge key,
     ordered by sequence DESC — later changes win, earlier ones are dead.
  2. FULL OUTER join snapshot x latest change on the key.
  3. row-wise resolution: no change -> base row; 'D' -> drop; 'U'/'I' ->
     base row with the change's payload columns overwritten (a brand-new
     key keeps NULL for base-only columns).

Scale shape: both inputs shuffle ONCE on the merge key; the dedup window
runs inside the change side's partitioning (no extra Exchange) and the
join reuses it. For a repeatedly-merged 100 TB table, bucket both sides by
the key so step 2 becomes a zero-shuffle sort-merge over co-located
buckets; AQE handles skewed hot keys either way. Determinism: the winner
per key is fixed by (seq desc) with a strictly-ordering sequence — the
contract, enforced nowhere cheaper than upstream — so the merged snapshot
is a pure function of (base, changes) in any engine or layout.

Reference parity: the reference's Track is increment-only (O1,
database.go:120); replace-style upsert/delete belongs to the north-star
surface. The engine's own store gets the same effect via manifest commits
(database.py); this operator is the frame-level form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    set_cols: list[str] | None = None,
) -> DataFrame:
    """Apply ``changes`` to ``base`` and return the merged snapshot.

    ``changes`` must carry (key_col, seq_col, op_col) plus the payload
    columns it sets; ``set_cols`` names the base columns overwritten by
    'U'/'I' rows (default: every change column that is also a base
    column). Ops: 'U' upsert, 'I' insert-or-update (alias — MERGE
    WHEN [NOT] MATCHED both resolve to the payload here), 'D' delete; any
    other op value fails the job loudly (raise_error, never a silent
    drop). Output schema == base schema.
    """
    if set_cols is None:
        set_cols = [
            c for c in changes.columns
            if c in base.columns and c != key_col
        ]
    bad = [c for c in set_cols if c not in base.columns]
    if bad:
        raise ValueError(f"set_cols not in base schema: {bad}")
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    latest = (
        changes.select(key_col, seq_col, op_col, *set_cols)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", seq_col)
        .withColumn(
            op_col,
            F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("merge_apply: unknown op '"),
                        F.col(op_col),
                        F.lit("' (expected I/U/D)"),
                    )
                )
            ),
        )
    )
    b = base.alias("b")
    l = latest.alias("l")
    joined = b.join(l, F.col(f"b.{key_col}") == F.col(f"l.{key_col}"), "full_outer")
    out_cols = []
    for c in base.columns:
        if c == key_col:
            out_cols.append(
                F.coalesce(F.col(f"b.{key_col}"), F.col(f"l.{key_col}")).alias(c)
            )
        elif c in set_cols:
            out_cols.append(
                F.when(F.col(f"l.{op_col}").isNotNull(), F.col(f"l.{c}"))
                .otherwise(F.col(f"b.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"b.{c}").alias(c))
    return joined.filter(
        F.col(f"l.{op_col}").isNull() | (F.col(f"l.{op_col}") != "D")
    ).select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str]",
    compare_cols: "list[str] | None" = None,
) -> DataFrame:
    """Diff two keyed snapshots — the change-data-FEED shape (Delta CDF /
    audit diff / replication drift check): one row per key that was
    ``added``, ``removed`` or ``changed``, with the compared columns from
    both sides (``old_<c>`` / ``new_<c>``). Unchanged keys are absent, so
    the output is change-sized, not table-sized.

    Shape: ONE full-outer equi-join on the key (both sides shuffle once;
    bucket both snapshots by the key for the zero-shuffle form at 100 TB).
    Change detection is per-column null-safe equality folded into one
    boolean — no hashing, so NULL->value and value->NULL both register and
    a false "changed" can never come from hash collisions. Keys must be
    unique per snapshot (the snapshot contract; duplicate keys make "the"
    old row undefined) — violations surface as duplicated diff rows rather
    than silently picking one.

    Output: key_cols + change ('added'|'removed'|'changed') +
    old_/new_<compare_cols>.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    cmp_cols = (
        [c for c in new.columns if c not in key_cols]
        if compare_cols is None
        else list(compare_cols)
    )
    missing = [c for c in cmp_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns missing from a side: {missing}")
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *key_cols,
            "change",
            *[f"old_{c}" for c in cmp_cols],
            *[f"new_{c}" for c in cmp_cols],
        )
    )
