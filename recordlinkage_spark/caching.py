"""Materialize-once helper for the engine's lineage-truncation points.

Every iterative / multi-consumer stage in this package needs to (a) compute
an expensive subtree exactly once and (b) TRUNCATE lineage so driver-side
loops (connected components, greedy linking) don't grow the logical plan
without bound. ``persist()`` satisfies (a) but not (b), and its CacheManager
entries outlive the DataFrame reference (the session-6 leak this package
moved away from). The two Spark primitives that satisfy both:

- ``localCheckpoint`` (the default here): blocks live on executor local
  storage. Fast (no distributed FS write), and the ContextCleaner drops the
  blocks when the DataFrame is unreferenced. **Caveat (ADVICE r4): the
  blocks are NOT recomputable** — lineage is gone, so losing an executor
  (crash, decommission, dynamic-allocation scale-in) fails the job instead
  of recomputing. Spark's own docs advise against it with dynamic
  allocation. Fine for local mode and static clusters with
  ``spark.decommission`` off; not for elastic clusters.
- reliable ``checkpoint``: blocks go to ``spark.checkpoint.dir`` (set it
  first, e.g. an HDFS/S3 path), survive executor loss, and still truncate
  lineage. The right mode for 1000-executor elastic clusters; costs one
  compute + one distributed write per pin — the subtree is persisted
  around the checkpoint, because a bare ``Dataset.checkpoint()``
  RECOMPUTES the plan to write the files (Spark's own RDD.checkpoint
  doc), which would double every expensive Arrow pass and fire every
  accumulator twice. Reliable pins are therefore always EAGER (the
  persist window must close deterministically); ``eager=False`` only
  defers in local mode. Reliable checkpoint data is NOT deleted by
  default — iterative loops (connected components, greedy linking) pin
  every round, so also set
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (or clean the
  checkpoint dir per job) or a 30-iteration run leaves ~30 frame copies
  on the distributed store.

The mode is a session conf so deployments flip it without code changes::

    spark.conf.set("spark.recordlinkage.pin.mode", "reliable")
    spark.sparkContext.setCheckpointDir("s3://bucket/checkpoints")

Values: ``local`` (default) | ``reliable``. Anything else raises — a
typo'd mode silently falling back to localCheckpoint would reintroduce
the exact executor-loss failure the operator opted out of.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PIN_MODE_CONF = "spark.recordlinkage.pin.mode"
_MODES = ("local", "reliable")


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize ``df`` once and truncate its lineage.

    ``eager=False`` defers the materialization to the first action (the
    common shape here: pin, then probe with ``count()``); ``eager=True``
    materializes now (iterative loops that must bound the plan before the
    next round builds on it).
    """
    mode = df.sparkSession.conf.get(PIN_MODE_CONF, "local")
    if mode not in _MODES:
        raise ValueError(
            f"{PIN_MODE_CONF}={mode!r}: expected one of {_MODES}"
        )
    if mode == "reliable":
        # persist around the checkpoint: RDD.checkpoint recomputes the
        # subtree to write the files unless its blocks are cached, which
        # would double every compute and every accumulator (r5 review
        # fix). Always eager so the persist window closes here.
        # DISK_ONLY for the wrap-around persist (ADVICE r5): the blocks
        # live only for the duration of the checkpoint write, and the
        # frames pinned here are the large ones — a MEMORY_AND_DISK
        # persist would evict execution memory for a cache that is
        # dropped two lines later. Note pin() must receive a frame whose
        # query execution has not already been forced in reliable mode —
        # persist() after a prior action leaves the memoized physical
        # plan without the cache scan and checkpoint(eager) recomputes
        # the subtree (every call site here pins before the first
        # action).
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.DISK_ONLY)
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=eager)
