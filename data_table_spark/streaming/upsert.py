"""Streaming MERGE sink: maintain a keyed snapshot table from a stream
with ``foreachBatch`` + versioned parquet snapshots.

The reference has no streaming surface (it is a batch facade over an
RDBMS); this is the north-star extension pairing the batch
``merge_upsert`` / ``q71_incremental_agg`` patterns with Structured
Streaming. The sink contract:

- Every micro-batch produces a NEW immutable snapshot directory
  ``state_dir/v{batch_id}`` = ``merge_fn(current_snapshot, batch_df)``.
  Writing a fresh directory (instead of overwriting in place) matters:
  Spark reads lazily, so overwriting the parquet dir that the merge is
  still reading from would corrupt the state mid-job.
- A pointer file ``state_dir/_LATEST`` names the live snapshot and is
  swapped atomically (write-temp + ``os.replace``) only AFTER the
  snapshot write succeeds.
- Exactly-once under retries: foreachBatch re-delivers the same
  ``batch_id`` after a failure. A crash BEFORE the pointer swap leaves
  the pointer at the previous snapshot, so the retry recomputes the
  same ``v{batch_id}`` from the same inputs; a crash AFTER the swap
  (but before the checkpoint commit) is detected by the replay guard —
  pointer already at ``v{batch_id}`` means the batch is fully applied
  and the redelivery is skipped, which is what keeps non-idempotent
  merges (additive rollups) from double-applying.

``merge_fn(cur_or_none, batch_df) -> state_df`` owns the merge
semantics; it must be insensitive to how rows are split across batches
(associative in the state ∪ batch sense). Two canonical merges ship
below: ``latest_per_key_merge`` (SCD1 snapshot / changelog compaction)
and any ``merge_upsert``-based whole-row replace where batches are
known key-disjoint.

At scale: each snapshot write is one job over (state ∪ batch); keep
state bucketed by the key so the merge groupBy reuses the layout, and
compact old ``v*`` dirs with a retention sweep (they are pure history,
equivalent to Delta's versioned files before VACUUM).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POINTER = "_LATEST"


def _pointer_version(state_dir: str) -> str | None:
    ptr = os.path.join(state_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip()


def read_snapshot(spark, state_dir: str) -> DataFrame | None:
    """The live snapshot per the pointer file, or None before batch 0."""
    version = _pointer_version(state_dir)
    if version is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, version))


def _swap_pointer(state_dir: str, version: str) -> None:
    tmp = os.path.join(state_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(state_dir, _POINTER))


def latest_per_key_merge(keys: list[str], order_cols: list[str]):
    """merge_fn keeping, per key, the row with the greatest
    ``order_cols`` tuple (ties impossible when the tuple is unique, e.g.
    (ts, event_id)). One groupBy over state ∪ batch — the max(struct)
    form, no window, so the merge stays a single partial-aggregatable
    shuffle on the key."""

    def merge(cur: DataFrame | None, batch: DataFrame) -> DataFrame:
        inp = batch if cur is None else cur.unionByName(batch)
        payload = [c for c in inp.columns if c not in keys]
        # struct comparison is lexicographic over (order_cols, rest), so
        # the max row is decided by order_cols first
        rest = [c for c in payload if c not in order_cols]
        packed = inp.groupBy(*keys).agg(
            F.max(F.struct(*order_cols, *rest)).alias("_row")
        )
        return packed.select(
            *keys, *[F.col(f"_row.{c}").alias(c) for c in order_cols + rest]
        ).select(*inp.columns)

    return merge


def run_streaming_upsert(
    spark,
    source_dir: str,
    schema,
    state_dir: str,
    checkpoint_dir: str,
    merge_fn,
) -> DataFrame:
    """Replay parquet files as a stream and fold them into a snapshot
    table via foreachBatch (see module docstring for the sink contract).
    Returns the final snapshot DataFrame."""
    os.makedirs(state_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        version = f"v{batch_id}"
        # replay guard: a crash BETWEEN the pointer swap and the
        # checkpoint commit re-delivers this batch_id with the pointer
        # already at v{batch_id}. The pointer swaps only after a
        # successful snapshot write, so pointer == v{batch_id} means the
        # batch is fully applied: skip, instead of double-applying the
        # merge and overwriting the directory the merge would read from
        # (crashes BEFORE the swap leave the pointer at the previous
        # version and replay cleanly).
        applied = _pointer_version(state_dir)
        if applied == version:
            return
        # checkpoint/state-dir mismatch guard: a NEW query (fresh
        # checkpoint) restarts batch ids at 0; folding batch 0 onto a
        # state that already applied v{n>0} double-applies every batch
        # for non-idempotent merges (additive rollups). The pointer
        # carries the highest applied id — an incoming id BELOW it can
        # only mean the checkpoint does not belong to this state_dir,
        # so fail fast instead of silently corrupting the snapshot.
        if applied is not None and batch_id < int(applied.lstrip("v")):
            raise RuntimeError(
                f"streaming upsert replay mismatch: state {state_dir} "
                f"already applied {applied} but the checkpoint delivered "
                f"batch {batch_id} — fresh checkpoint against existing "
                "state? Point the query at a fresh state_dir or restore "
                "the original checkpoint."
            )
        sess = batch.sparkSession
        cur = read_snapshot(sess, state_dir)
        new_state = merge_fn(cur, batch)
        new_state.write.mode("overwrite").parquet(
            os.path.join(state_dir, version)
        )
        _swap_pointer(state_dir, version)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = read_snapshot(spark, state_dir)
    assert out is not None, "stream produced no batches"
    return out


def vacuum_snapshots(state_dir: str, keep: int = 2) -> list[str]:
    """Retention sweep: delete snapshot dirs older than the ``keep``
    newest, never touching the one named by ``_LATEST`` (equivalent to
    VACUUM on a versioned table). Returns the removed version names.
    Run it out-of-band — the sink never reads anything but the pointer
    target, so a sweep is safe concurrently with ingestion as long as
    ``keep >= 2`` (the pointer target plus the version a retried batch
    would rebuild from)."""
    import shutil

    if keep < 1:
        raise ValueError("keep must be >= 1")
    ptr = os.path.join(state_dir, _POINTER)
    live = None
    if os.path.exists(ptr):
        with open(ptr) as f:
            live = f.read().strip()
    versions = sorted(
        (d for d in os.listdir(state_dir)
         if d.startswith("v") and d[1:].isdigit()),
        key=lambda d: int(d[1:]),
    )
    doomed = [v for v in versions[:-keep] if v != live]
    for v in doomed:
        shutil.rmtree(os.path.join(state_dir, v))
    return doomed
