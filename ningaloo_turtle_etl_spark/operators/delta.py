"""Snapshot-diff operators — classify rows as added / removed / changed /
unchanged between two versions of a table.

The reference re-downloads its source database on every run behind a
``refresh_data`` flag (`ningaloo-etl.Rmd:41,47-53`) and has no way to say
WHAT changed between refreshes; at 100 TB a full re-publish per refresh is
exactly what you can't afford. The diff below is the primitive an
incremental refresh builds on: process only the added/changed keys,
tombstone the removed ones.

Scale shape: both sides are projected map-side to ``(key, 32-char md5
fingerprint)`` BEFORE the join, so the one unavoidable shuffle (full outer
join on the key) carries fixed-width rows, never payloads — diffing two
100 TB snapshots shuffles ~40 bytes/row. The fingerprint uses the
engine-portable md5 family (operators/curation.py:_sample_hash rationale),
with a unit separator + per-column null sentinel so (NULL, 'a') never
collides with ('a', NULL) or with a literal containing the separator.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

# ASCII unit separator: cannot appear in the testdata's text columns and is
# vanishingly rare in real ones; the null sentinel includes it so a NULL can
# never equal any non-NULL string.
_SEP = "\x1f"
_NULL = "\x1f\x00"


def row_fingerprint(cols: Sequence[str]) -> Column:
    """md5 over the unit-separated, null-sentineled string forms of
    ``cols`` — order-sensitive, engine-portable (DuckDB computes the
    identical digest, which is what makes snapshot_diff oracle-provable)."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    verify_keys: bool = False,
) -> DataFrame:
    """One row per key present in either snapshot, with ``status`` in
    {'added','removed','changed','unchanged'}: added = key only in ``new``,
    removed = only in ``old``, changed = in both with differing
    fingerprints over ``compare_cols`` (default: all shared non-key
    columns, in ``new``'s column order).

    ``keys`` must be a unique grain on BOTH sides — a duplicated key makes
    the full-outer join emit one row per pairing and silently misclassify
    (row counts inflate; same-key rows with different payloads cross-match
    as 'changed'). ``verify_keys=True`` spends one counting aggregation per
    side to raise on the first duplicated key instead; leave it off in
    production jobs where the grain is contract-guaranteed."""
    if verify_keys:
        for side, frame in (("old", old), ("new", new)):
            dup = (
                frame.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                key_vals = {k: dup[0][k] for k in keys}
                raise ValueError(
                    f"snapshot_diff: keys {list(keys)} are not unique in the "
                    f"{side} snapshot (first duplicate: {key_vals}, "
                    f"n={dup[0]['n']})"
                )
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in set(keys)
        ]
    keys = list(keys)
    o = old.select(*keys, row_fingerprint(compare_cols).alias("_old_fp")).alias("o")
    n = new.select(*keys, row_fingerprint(compare_cols).alias("_new_fp")).alias("n")
    # Null-SAFE key equality: a NULL key present on both sides is one key
    # ('unchanged'/'changed'), not a spurious removed+added pair — the
    # null-unsafe `on=keys` form never matches NULLs. eqNullSafe keeps the
    # same hash-partitioned SMJ plan shape (pinned in tests/test_delta.py).
    cond = None
    for kcol in keys:
        c = F.col(f"o.{kcol}").eqNullSafe(F.col(f"n.{kcol}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .when(F.col("_new_fp").isNull(), F.lit("removed"))
        .when(F.col("_old_fp") != F.col("_new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"o.{kcol}"), F.col(f"n.{kcol}")).alias(kcol)
            for kcol in keys
        ],
        status.alias("status"),
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Status → (row count, share of the union key space), the refresh
    health report: an unexpected spike in 'removed' is how you catch an
    upstream truncation before publishing."""
    d = snapshot_diff(old, new, keys, compare_cols)
    per = d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(F.sum("n").alias("tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "status",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    state_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: collapse
    consecutive observations with identical state into versions and emit
    validity intervals — (*keys, version, *state, valid_from, valid_to,
    n_events, is_current), with ``valid_to`` null on the open (current)
    version. The warehouse-standard way to answer "what was this entity's
    state at time T" with a BETWEEN lookup.

    Change detection uses a null-sentinel fingerprint of ``state_cols`` (a
    real NULL and the string 'null' don't collide), so any column mix
    works. ``tiebreak_col`` makes same-timestamp observations
    deterministic — pass the log's unique id.

    Scale shape: one shuffle by key; the run-length collapse is one lag +
    one running sum + one groupBy at the version grain, and the
    valid_to/lead pass runs on the collapsed (versions-sized) frame, not
    the raw log. No driver state, no iteration."""
    keys = list(key_cols)
    states = list(state_cols)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    fp = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in states],
    )
    lagged = df.withColumn("_fp", fp).withColumn("_prev", F.lag("_fp").over(w))
    flagged = lagged.withColumn(
        "_chg",
        F.when(F.col("_prev").isNull() | (F.col("_prev") != F.col("_fp")), 1)
        .otherwise(0),
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = versioned.groupBy(*keys, "version").agg(
        *[F.min(c).alias(c) for c in states],
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(*keys).orderBy("version")
    return runs.select(
        *keys,
        "version",
        *states,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


def cdc_apply(
    snapshot,
    changes,
    keys,
    ts_col: str,
    op_col: str = "op",
    payload_cols=None,
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
):
    """Apply a CDC change feed to a snapshot (the MERGE INTO pattern):
    for every key, the LATEST change (by ``ts_col`` then ``tiebreak_col``)
    wins — an upsert replaces the payload columns, a ``delete_op`` removes
    the key; keys with no change carry over untouched; upserts of unseen
    keys insert.

    ``payload_cols`` defaults to the non-key columns the two frames share.
    Output: the new snapshot with the snapshot's FULL schema — snapshot
    columns absent from the feed are carried through unchanged (NULL for
    keys the feed inserts, since the snapshot has no row to carry from).

    Scale shape: per-key latest-change election is a window over the
    CHANGES feed only (a day's feed, not the snapshot); the merge is one
    full-outer join on the key. Write the snapshot bucketed by key and the
    join side is co-located — the feed side shuffles, the 100 TB snapshot
    does not move. No driver state.
    """
    keys = list(keys)
    if payload_cols is None:
        payload_cols = [
            c
            for c in snapshot.columns
            if c not in keys and c in changes.columns
        ]
    payload_cols = list(payload_cols)
    # Snapshot columns the feed doesn't carry: pass through unchanged so
    # the merged output keeps the snapshot's full schema.
    carry_cols = [
        c
        for c in snapshot.columns
        if c not in keys and c not in payload_cols
    ]

    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *keys,
            F.col(op_col).alias("_op"),
            *[F.col(c).alias(f"_chg_{c}") for c in payload_cols],
        )
    )
    snap = snapshot.withColumn("_in_snap", F.lit(True)).alias("s")
    merged = snap.join(latest.alias("c"), on=keys, how="full_outer")
    # delete wins over presence; an upsert prefers the change payload;
    # absence of a change keeps the snapshot row. The explicit _in_snap
    # marker (not a payload-NULL probe) keeps legitimately-NULL payloads
    # alive.
    kept = merged.filter(
        F.when(F.col("_op") == F.lit(delete_op), F.lit(False))
        .when(F.col("_op").isNotNull(), F.lit(True))
        .otherwise(F.col("_in_snap").isNotNull())
    )
    return kept.select(
        *keys,
        *[
            F.when(
                F.col("_op").isNotNull() & (F.col("_op") != F.lit(delete_op)),
                F.col(f"_chg_{c}"),
            )
            .otherwise(F.col(f"s.{c}"))
            .alias(c)
            for c in payload_cols
        ],
        *[F.col(f"s.{c}").alias(c) for c in carry_cols],
    )


def dataset_digest(
    df: DataFrame,
    cols: Sequence[str],
    by: Sequence[str] = (),
) -> DataFrame:
    """Order-independent content digest per group — the "did this table
    (partition) change?" primitive that lets a 100 TB snapshot comparison
    short-circuit: equal digests end the check with one scan per side and
    a constant-width exchange; only unequal groups proceed to the
    row-level :func:`snapshot_diff`.

    Two complementary folds over the md5-60 row hash (``\\x1f``-joined
    string forms, NULLs marked with ``\\x1e`` so NULL ≠ '' ≠ 'NULL'):

    - ``xor_digest`` — bit_xor of row hashes: commutative, fixed-width,
      but an even number of identical rows cancels to the same value;
    - ``sum_digest`` — the modular sum mod 2⁶¹−1, accumulated in
      DECIMAL(38,0) so the partial sums cannot overflow at any row count
      (a raw BIGINT sum of 60-bit terms overflows at 8 rows) — it
      catches exactly the duplicate-multiplicity changes xor cancels.

    With ``n_rows`` alongside, any insert/delete/update/duplication
    change moves at least one of the three. Columns are compared via
    their STRING casts — normalize floats/timestamps upstream (the same
    caller contract as ``row_fingerprint``); int/string/date columns
    replay bit-identically in the DuckDB oracle.

    Output: (by…, n_rows, xor_digest, sum_digest).

    Scale shape: map-only row hashing fused with the scan, one
    map-side-combined aggregate to the group grain; nothing but the
    3-number digest ever shuffles."""
    if not cols:
        raise ValueError("dataset_digest needs at least one column")
    g = list(by)
    rh = F.conv(
        F.substring(row_fingerprint(cols), 1, 15), 16, 10
    ).cast("long")
    base = df.select(*g, rh.alias("_rh"))
    return base.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_rh)").alias("xor_digest"),
        (
            F.sum(F.col("_rh").cast("decimal(38,0)"))
            % F.lit(2305843009213693951).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("sum_digest"),
    )
