"""Lineage-truncation policy: local by default, reliable by knob.

Iterative operators (connected components, PageRank) and session-cached
sub-pipelines (LSH pair graphs, fingerprint frames, recall-audit truth)
must truncate lineage each round or the plan grows with iterations —
the standard iterative-DataFrame trap. ``localCheckpoint`` does that
with executor-local storage blocks: fast, zero configuration, and the
right default on local[32].

On a real cluster it is also a LIABILITY: localCheckpoint trades the
lineage away, so when an executor is lost (preemptible/spot nodes, OOM
kills — routine at 1000-executor scale) the blocks it held are simply
GONE and the job dies with a "checkpoint block not found" error instead
of recomputing. The production answer is a RELIABLE checkpoint
(``df.checkpoint()``) to a fault-tolerant filesystem (HDFS/S3): slower
per round (a write + read of the frame), but executor loss costs a task
retry, not the job.

:func:`materialize` is the single switch point. Default: local.
When a checkpoint directory is configured — the
``SPARK_GRAFT_CHECKPOINT_DIR`` environment variable or the runtime
session conf ``spark.graft.checkpointDir`` (checked in that order) —
every call becomes a reliable ``df.checkpoint()`` into it. The knob is
read PER CALL, so a long-lived session can be switched without restart,
and results are bit-identical either way (checkpointing only changes
WHERE the materialized frame lives, never its rows — pinned by
tests/test_extensions.py::test_connected_components_reliable_checkpoint).

Cleanup: reliable checkpoint files are reclaimed by Spark's
ContextCleaner only when ``spark.cleaner.referenceTracking
.cleanCheckpoints=true``; deployments should set that (or lifecycle the
checkpoint bucket). :func:`release` frees LOCAL checkpoint blocks
eagerly (see its docstring) and is a safe no-op for reliable ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Runtime session conf consulted by :func:`materialize` (the env var
#: SPARK_GRAFT_CHECKPOINT_DIR takes precedence when both are set).
CHECKPOINT_DIR_CONF = "spark.graft.checkpointDir"


def reliable_dir(df: DataFrame) -> str | None:
    """The configured reliable-checkpoint directory, or None (= use
    localCheckpoint). Env var first, then the session conf."""
    env = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if env:
        return env
    try:
        return df.sparkSession.conf.get(CHECKPOINT_DIR_CONF, None) or None
    except Exception:
        return None


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: ``localCheckpoint`` by default,
    reliable ``checkpoint`` into the configured directory when the
    knob is set (see module docstring). Same rows either way."""
    target = reliable_dir(df)
    if target is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    # df.checkpoint() requires the SparkContext checkpoint dir; assert
    # it idempotently so flipping the conf mid-session just works.
    if sc.getCheckpointDir() != target:
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)


def release(df: DataFrame) -> None:
    """Free a LOCAL checkpoint's storage blocks NOW.

    ``DataFrame.unpersist`` is a no-op for checkpoint blocks — they
    hang off the backing RDD, not the cache manager (verified
    empirically: getRDDStorageInfo still lists the blocks after
    unpersist, and drops them after this). Without an explicit
    release, a deep iterative run pins one full label/edge-frame copy
    PER ROUND in executor storage until the 30-minute periodic
    ContextCleaner catches up — the exact litter class BENCH_NOTES
    measured inflating later queries 2-4×.

    For RELIABLE checkpoints this is a harmless no-op (their data is
    files, not storage blocks; the ContextCleaner deletes them when
    cleanCheckpoints is on and the RDD is garbage-collected)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        # plan isn't a bare LogicalRDD (wrapped/optimized differently)
        # — fall back to eventual ContextCleaner reclamation
        pass
