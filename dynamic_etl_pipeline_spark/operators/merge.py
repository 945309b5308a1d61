"""MERGE INTO / upsert semantics as declarative joins (SURVEY §2 gap:
the reference appends blindly — app.py:133-141 inserts every record —
but any at-rest store maintained incrementally needs keyed upserts).

``merge_upsert`` is ANSI MERGE's row calculus as ONE full-outer join:

    matched        -> WHEN MATCHED THEN UPDATE (source wins per column)
    source-only    -> WHEN NOT MATCHED THEN INSERT
    target-only    -> carried through unchanged
    matched+delete -> WHEN MATCHED AND <cond> THEN DELETE

All four outcomes are decided per-row with ``coalesce``/``CASE`` over
the join result — no driver loop, one shuffle on the merge keys (or
zero with pre-bucketed tables, operators/bucketing.py). At 100 TB this
is exactly how Delta/Iceberg execute MERGE under the hood (join +
rewrite), minus the transactional file swap, which EtlPipeline.compact
and streaming/sinks.py demonstrate separately.

``scd2_apply`` layers slowly-changing-dimension type 2 on top: instead
of updating in place, the current version of a changed key is closed
(valid_to set, is_current false) and a new version row is appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str],
                 update_cols: list[str] | None = None,
                 insert: bool = True,
                 deletes: DataFrame | None = None) -> DataFrame:
    """Return the merged state of ``target`` after applying ``source``.

    update_cols: columns taken from the source on match (default: every
    non-key column the two sides share). deletes: a keys-frame; its
    rows are removed from the target first (WHEN MATCHED THEN DELETE as
    a left-anti join). Source keys must be unique (MERGE's own
    requirement — duplicate source keys make ANSI MERGE nondeterministic).
    """
    if update_cols is None:
        update_cols = [
            c for c in target.columns if c not in keys and c in source.columns
        ]
    if deletes is not None:
        target = target.join(deletes.select(*keys), keys, "left_anti")
    target_cols = target.columns
    # explicit presence markers, NOT key-null tests: a row whose actual
    # key VALUE is NULL must still be classified correctly (NULL keys
    # never equi-match, so such rows are target-only / source-only)
    t = target.withColumn("_mt_present", F.lit(True))
    s = source.select(
        *[F.col(k).alias(f"_mk_{k}") for k in keys],
        *[F.col(c).alias(f"_ms_{c}") for c in update_cols],
        F.lit(True).alias("_ms_present"),
    )
    cond = [t[k] == s[f"_mk_{k}"] for k in keys]
    j = t.join(s, cond, "full_outer")
    source_only = F.col("_mt_present").isNull()
    if not insert:
        j = j.filter(~source_only)
    from_source = F.col("_ms_present").isNotNull()
    out_cols = []
    for c in target_cols:
        if c in keys:
            out_cols.append(
                F.when(from_source & F.col("_mt_present").isNull(),
                       F.col(f"_mk_{c}"))
                .otherwise(t[c]).alias(c)
            )
        elif c in update_cols:
            # matched -> source value; source-only insert -> source value;
            # target-only -> target value
            out_cols.append(
                F.when(from_source, F.col(f"_ms_{c}")).otherwise(t[c]).alias(c)
            )
        else:
            out_cols.append(t[c].alias(c))
    return j.select(*out_cols)


def scd2_apply(dim: DataFrame, changes: DataFrame, keys: list[str],
               tracked_cols: list[str],
               batch_version: int,
               version_col: str = "version",
               current_col: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension table.

    ``dim`` rows carry (tracked_cols..., version_col, current_col).
    For each key in ``changes`` whose tracked column values differ from
    the key's CURRENT dim row, the current row is closed
    (current_col=false) and a new row with ``batch_version`` appended;
    unchanged keys and historical (non-current) rows pass through
    untouched. New keys insert as version ``batch_version``.

    One equi-join on the keys against the current slice + one union —
    history is never rewritten, so the operation is proportional to
    |changes| + |dim|, shuffle-keyed on the dimension key.
    """
    ch = changes.select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        *[F.col(c).alias(f"_cv_{c}") for c in tracked_cols],
    )
    cond = [dim[k] == ch[f"_ck_{k}"] for k in keys]
    j = dim.join(ch, cond, "left_outer")
    differs = F.lit(False)
    for c in tracked_cols:
        differs = differs | ~dim[c].eqNullSafe(F.col(f"_cv_{c}"))
    is_current = dim[current_col]
    closing = F.col(f"_ck_{keys[0]}").isNotNull() & is_current & differs
    carried = j.select(
        *[dim[c].alias(c) for c in dim.columns if c != current_col],
        F.when(closing, F.lit(False)).otherwise(is_current).alias(current_col),
    )
    cur = dim.filter(F.col(current_col))
    old_changed = sum(
        (~F.col(c).eqNullSafe(F.col(f"_old_{c}"))).cast("int")
        for c in tracked_cols
    ) > 0
    new_rows = (
        changes.alias("c")
        .join(
            cur.select(
                *keys,
                *[F.col(c).alias(f"_old_{c}") for c in tracked_cols],
                F.lit(True).alias("_has_cur"),
            ),
            keys, "left_outer",
        )
        # brand-new key, or at least one tracked value changed
        .filter(F.col("_has_cur").isNull() | old_changed)
        .select(
            *keys, *tracked_cols,
            F.lit(batch_version).alias(version_col),
            F.lit(True).alias(current_col),
        )
    )
    return carried.unionByName(new_rows, allowMissingColumns=False)
