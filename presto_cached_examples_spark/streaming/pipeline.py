"""End-to-end incremental pipeline: stream → per-batch fold → snapshot
publish. This is EP3, the reference's double-buffer frame loop, run as
a real Structured Streaming query.

Reference trace (SURVEY.md §3.1 EP3,
/root/reference/src/DoublePsramBuffer480x480.cpp:130-215): each frame
updates per-row state (:142-170), touches only the dirty region
(:176-180), then atomically swaps buffers at the vsync barrier
(:196-202) so the reader only ever scans a complete frame.

Spark-native: each micro-batch is one frame. `foreachBatch` folds the
batch's partial aggregate into the running state (dirty keys only —
IncrementalAggregator), then publishes the new state as an atomic
snapshot (SnapshotPublisher) — readers of the published view never see
a half-merged batch. The micro-batch trigger IS the vsync barrier
(R43): state only advances at batch boundaries.

At 100 TB: the stream partitions by source file/offset ranges, the
fold shuffles only the batch's keys against co-partitioned state, and
the publish swaps a catalog pointer — none of the three steps scans
history.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from presto_cached_examples_spark.streaming.incremental import IncrementalAggregator


def run_incremental_pipeline(
    spark: SparkSession,
    source: DataFrame,
    keys: list[str],
    value_col: str,
    name: str,
    strategy: str = "incremental",
) -> IncrementalAggregator:
    """Drain a streaming `source` through per-batch incremental folds,
    publishing a snapshot after every batch; returns the aggregator
    whose `current()` is the final published snapshot.

    `strategy` is the CLEAR_TYPE knob (C4): "incremental" folds dirty
    keys; "full" recomputes from all batches seen — identical results
    (tests/test_properties.py), different cost."""
    agg = IncrementalAggregator(spark, keys=keys, value_col=value_col, name=name)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # Materialize the batch before folding: foreachBatch hands us a
        # view bound to this micro-batch's source offsets, and the
        # aggregator's state plan must not re-read those offsets later.
        agg.update(batch_df.localCheckpoint(eager=True), strategy=strategy)

    # Fresh checkpoint per run: a reused location would resume from old
    # offsets and silently skip the source.
    ckpt = tempfile.mkdtemp(prefix=f"pce_ckpt_{name}_")
    q = (
        source.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
    return agg
