"""Incremental recompute via content-hash cache invalidation (SURVEY.md
O8/S13, ConnectAndSave.py:122-123,194-195,294-300).

The reference md5-hashes a grain's token set and skips the LDA refit when
the hash matches the cached value. Generalized engine form:

    current  = per-group content hashes of the input NOW
    cached   = the hash table persisted by the previous run
    stale    = groups whose hash changed or appeared   (recompute these)
    retired  = cached groups that vanished             (delete results)
    fresh cache = current

Only `stale` groups flow into the expensive stage; results for unchanged
groups are reused as-is. This is snapshot-diff semantics on plain tables —
with Iceberg the `current` side would be an incremental scan instead of a
full rehash, but the stale/retired classification is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_hashes(df: DataFrame, group_col: str, content_col: str) -> DataFrame:
    """(group, content_hash): md5 over the sorted per-row hashes — order-
    insensitive, one groupBy (the md5_cache_key shape)."""
    return df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.md5(
            F.concat_ws("|", F.sort_array(F.collect_list(F.md5(F.col(content_col)))))
        ).alias("content_hash")
    )


def classify_groups(current: DataFrame, cached: DataFrame) -> DataFrame:
    """(group_key, state) with state ∈ {stale, unchanged, retired}."""
    cur = current.select("group_key", F.col("content_hash").alias("h_now"))
    old = cached.select("group_key", F.col("content_hash").alias("h_old"))
    joined = cur.join(old, on="group_key", how="full_outer")
    state = (
        F.when(F.col("h_now").isNull(), F.lit("retired"))
        .when(F.col("h_old").isNull() | (F.col("h_now") != F.col("h_old")), F.lit("stale"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select("group_key", state.alias("state"))


def incremental_refresh(
    data: DataFrame,
    cached_hashes: DataFrame,
    prev_results: DataFrame,
    group_col: str,
    content_col: str,
    compute_fn,
) -> tuple[DataFrame, DataFrame]:
    """Returns (results, new_cache): compute_fn runs ONLY over stale
    groups' rows; unchanged groups keep prev_results rows; retired groups
    drop out. compute_fn: DataFrame (stale rows) → DataFrame keyed by
    group_col."""
    current = group_hashes(data, group_col, content_col)
    states = classify_groups(current, cached_hashes)
    stale_keys = states.where(F.col("state") == "stale").select("group_key")
    unchanged_keys = states.where(F.col("state") == "unchanged").select("group_key")
    stale_rows = data.join(
        stale_keys.withColumnRenamed("group_key", group_col), on=group_col, how="left_semi"
    )
    recomputed = compute_fn(stale_rows)
    kept = prev_results.join(
        unchanged_keys.withColumnRenamed("group_key", group_col), on=group_col, how="left_semi"
    )
    return kept.unionByName(recomputed), current


def upsert_cache_table(state, name: str, current: DataFrame, cached: DataFrame) -> dict:
    """S13 on the state store: the content-hash cache as a keyed MERGE.

    Classifies ``current`` vs ``cached`` (the committed table), then
    routes through ``CrawlState.merge_into``: only stale/new group hashes
    upsert and retired groups delete — the table converges to ``current``
    with merge cost proportional to CHURNED buckets, not cache size (the
    reference rewrites its whole cache row set per run,
    ConnectAndSave.py:294-300)."""
    states = classify_groups(current, cached)
    stale = current.join(
        states.where(F.col("state") == "stale").select("group_key"),
        on="group_key",
        how="left_semi",
    )
    retired = states.where(F.col("state") == "retired").select("group_key")
    return state.merge_into(name, stale, delete_keys=retired)


def snapshot_diff(old: DataFrame, new: DataFrame, content_col: str = "text") -> DataFrame:
    """Document-level diff between two corpus snapshots: (doc_id, change)
    for every doc that was ``added``, ``removed``, or ``modified`` —
    the table-diff an Iceberg incremental scan between two snapshot ids
    produces, computed here from the data itself so it works on plain
    parquet snapshots too (the classify_groups stale/retired machinery
    at document grain, split into the add/modify cases a changelog
    consumer needs to distinguish).

    Plan: content hashes are computed scan-side (one md5 projection per
    snapshot — text never shuffles), then ONE co-partitioned full-outer
    join on doc_id carrying (doc_id, 32-byte hash) rows. Unchanged docs
    — the overwhelming majority between adjacent crawl snapshots — are
    filtered out before anything else sees the frame.
    """
    o = old.select("doc_id", F.md5(F.col(content_col)).alias("h_old"))
    n = new.select("doc_id", F.md5(F.col(content_col)).alias("h_new"))
    change = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        o.join(n, on="doc_id", how="full_outer")
        .select("doc_id", change.alias("change"))
        .where(F.col("change") != "unchanged")
    )


def snapshot_diff_sql(old_cte: str, new_cte: str, content_col: str = "text") -> str:
    """DuckDB twin over two CTEs each producing (doc_id, text)."""
    return f"""
        WITH old_snap AS ({old_cte}),
        new_snap AS ({new_cte}),
        o AS (SELECT doc_id, md5({content_col}) AS h_old FROM old_snap),
        n AS (SELECT doc_id, md5({content_col}) AS h_new FROM new_snap),
        j AS (
            SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old <> h_new THEN 'modified'
                        ELSE 'unchanged' END AS change
            FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        )
        SELECT doc_id, change FROM j WHERE change <> 'unchanged'
    """
