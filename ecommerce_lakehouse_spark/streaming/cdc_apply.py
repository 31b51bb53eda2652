"""Apply a CDC feed to a downstream table — continuous replication.

The change feed (``IcehouseTable.changes(cdc=True)`` batch-side,
``readStream.format("icehouse").option("cdc", "true")`` stream-side)
makes a 10^12-doc table consumable incrementally; this module closes the
loop by MAINTAINING a downstream replica from that feed — the
Delta-CDF-"apply changes" / Iceberg-mirror pattern a training-data
pipeline uses to keep a filtered/derived copy in sync without full
rescans. (The reference's pipelines rebuild gold tables from silver on
each run — e.g. reference/src/gold/gold_layer_master.py — this is the
incremental form of that contract.)

Semantics: a feed slice may carry MANY commits touching the same key.
:func:`collapse_cdc` reduces it to the net effect — per key, the change
from the highest ``_commit_snapshot_id`` wins, with row-creating images
(insert/update_after) outranking row-removing ones (delete/
update_before) within the same commit, exactly the pairing
``changes(cdc=True)`` emits. The result is one upsert set and one
delete-key set, applied as the engine's tested MERGE primitives. Replay
converges: re-merging identical upserts rewrites nothing new and
re-deleting absent keys matches nothing, so the at-least-once
``foreachBatch`` delivery of Structured Streaming yields an
exactly-once TABLE STATE.

Scale: the collapse is one window over the feed slice partitioned by
key — shuffle sized by the delta, never the table; the applies are the
same file-pruned merges a direct writer would issue.

Contract: ``key_cols`` must be a real key of the source (a merge-
maintained SCD1 table, the north-star shape). Mirroring a source that
carries duplicate keys (plain appends of colliding urls) collapses the
duplicates downstream — keyed replication of a non-keyed table is a
filter, not a copy. History coverage: a from-creation feed over a
source whose early snapshots were EXPIRED raises at planning
(format.py snapshot_range); a fresh :func:`mirror_table` falls back to
a full-scan bootstrap, an existing mirror surfaces the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..table.format import IcehouseTable

CDC_META = ("_change_type", "_commit_snapshot_id")

# images that ADD the row to the post-state outrank images that REMOVE it
# within one commit (an update emits both; the pair nets to the after-image)
_ROW_CREATING = ("insert", "update_after")


def collapse_cdc(
    feed: DataFrame, key_cols: list[str] | str
) -> tuple[DataFrame, DataFrame]:
    """Net effect of a CDC slice: (upsert rows, delete keys).

    Per key: latest commit wins; within a commit the after-image wins.
    Both outputs are key-unique, so they feed ``merge_into`` directly.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_commit_snapshot_id").desc(),
        F.col("_change_type").isin(*_ROW_CREATING).desc(),
    )
    winners = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = winners.filter(
        F.col("_change_type").isin(*_ROW_CREATING)
    ).drop(*CDC_META)
    delete_keys = winners.filter(
        F.col("_change_type") == "delete"
    ).select(*keys)
    return upserts, delete_keys


def apply_cdc(
    table: IcehouseTable, feed: DataFrame, key_cols: list[str] | str
) -> dict:
    """Apply a CDC slice to ``table``: collapse, then delete-merge the
    removed keys and upsert-merge the surviving images. Two commits at
    most (each the engine's normal file-pruned MERGE); an interruption
    between them leaves a consistent intermediate state the replay
    completes. Returns {"upserts": n, "deletes": n}."""
    from ..operators.merge import merge_into

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    upserts, delete_keys = collapse_cdc(feed, keys)
    # localCheckpoint: the two merges must see ONE consistent collapse —
    # and the upsert merge must not re-plan the feed after the delete
    # merge commits (changes() reads table state the delete just moved)
    upserts = upserts.localCheckpoint()
    delete_keys = delete_keys.localCheckpoint()
    n_del = delete_keys.count()
    if n_del:
        # collect_metrics=False: Observation.get deadlocks when the merge
        # runs on a foreachBatch callback (see merge_into docstring); the
        # counts here come from the collapse instead
        merge_into(table, delete_keys, keys,
                   delete_matched=True, insert_new=False,
                   collect_metrics=False)
    n_up = upserts.count()
    if n_up:
        merge_into(table, upserts, keys, collect_metrics=False)
    return {"upserts": n_up, "deletes": n_del}


def mirror_table(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    key_cols: list[str] | str,
    from_snapshot_id: int = 0,
) -> dict:
    """One-shot batch mirror: apply the source's CDC feed
    ``(from_snapshot_id, current]`` to the target (created on first
    apply). Run repeatedly with the last-applied snapshot id for
    incremental catch-up; :func:`mirror_stream` is the checkpointed
    streaming form of the same loop."""
    import os

    src = IcehouseTable(spark, source_path)
    to_snap = src.current_snapshot()
    try:
        feed = src.changes(
            from_snapshot_id, to_snap.snapshot_id if to_snap else None,
            cdc=True,
            key_cols=[key_cols] if isinstance(key_cols, str) else key_cols,
        )
    except ValueError:
        # history below from_snapshot_id expired: the feed cannot be
        # reconstructed. For a FRESH mirror, bootstrap from a full scan at
        # the current snapshot (Delta/Iceberg initial-snapshot semantics)
        # and continue incrementally from there; an EXISTING mirror has
        # genuinely lost changes — surface that, don't paper over it.
        if os.path.exists(os.path.join(target_path, "metadata")):
            raise
        IcehouseTable.create(spark, target_path, src.scan())
        return {
            "upserts": None, "deletes": 0, "created": True,
            "bootstrap_full_scan": True,
            "applied_through": to_snap.snapshot_id if to_snap else 0,
        }
    stats = _apply_to(spark, target_path, feed, key_cols)
    stats["applied_through"] = to_snap.snapshot_id if to_snap else from_snapshot_id
    return stats


def _apply_to(
    spark: SparkSession, target_path: str, feed: DataFrame, key_cols
) -> dict:
    import os

    if not os.path.exists(os.path.join(target_path, "metadata")):
        upserts, delete_keys = collapse_cdc(feed, key_cols)
        # first slice: the net state IS the table (delete winners never
        # existed downstream, so only the upsert set materializes)
        IcehouseTable.create(spark, target_path, upserts)
        return {"upserts": upserts.count(), "deletes": 0, "created": True}
    return apply_cdc(IcehouseTable(spark, target_path), feed, key_cols)


def mirror_stream(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    checkpoint_dir: str,
    key_cols: list[str] | str,
    available_now: bool = True,
    cdc_buckets: int | None = None,
    starting_snapshot_id: int | None = None,
):
    """Continuous replication: the streaming CDC source feeding
    :func:`apply_cdc` through ``foreachBatch``. Offsets are snapshot ids
    in the checkpoint, so a restart resumes exactly after the last
    batch whose apply completed; the collapse+merge replay of an
    interrupted batch converges to the same table state (see module
    docstring). ``available_now=True`` drains the backlog and stops —
    the incremental-maintenance cron form; ``False`` runs continuous.

    On a source whose early history has been EXPIRED, a from-creation
    stream raises at planning (snapshot_range refuses partial
    reconstruction). Bootstrap with :func:`mirror_table` (full-scan
    fallback) and pass its ``applied_through`` as
    ``starting_snapshot_id``."""
    from ..sources.datasource import register

    register(spark)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    reader = (
        spark.readStream.format("icehouse")
        .option("cdc", "true")
        .option("key_cols", ",".join(keys))
    )
    if cdc_buckets:
        reader = reader.option("cdc_buckets", str(cdc_buckets))
    if starting_snapshot_id is not None:
        reader = reader.option("starting_snapshot_id", str(starting_snapshot_id))
    feed = reader.load(source_path)

    def _apply(batch_df: DataFrame, _epoch: int) -> None:
        _apply_to(spark, target_path, batch_df, keys)

    writer = (
        feed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
