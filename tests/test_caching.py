"""The pin() materialization seam (ADVICE r4: localCheckpoint blocks are
not recomputable, so elastic clusters need a fault-tolerant mode). Default
mode keeps r4's localCheckpoint behavior; `spark.recordlinkage.pin.mode =
reliable` swaps every lineage-truncation point in the engine to reliable
checkpoint() without code changes."""

import pytest
from pyspark.sql import functions as F

from recordlinkage_spark.caching import PIN_MODE_CONF, pin


def test_pin_default_is_local_checkpoint(spark):
    df = pin(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    # lineage truncated: after the first action the plan is an RDD scan,
    # not the original Range + Project
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_pin_rejects_unknown_mode(spark):
    spark.conf.set(PIN_MODE_CONF, "relaible")
    try:
        with pytest.raises(ValueError, match="pin.mode"):
            pin(spark.range(1))
    finally:
        spark.conf.unset(PIN_MODE_CONF)


def test_pin_reliable_mode_checkpoints(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set(PIN_MODE_CONF, "reliable")
    try:
        df = pin(spark.range(5), eager=True)
        assert df.count() == 5
        # reliable checkpoint writes RDD blocks under the checkpoint dir
        ckpt_files = list((tmp_path / "ckpt").rglob("*"))
        assert ckpt_files, "reliable pin must write to the checkpoint dir"
    finally:
        spark.conf.unset(PIN_MODE_CONF)


def test_pin_reliable_lazy_request_still_materializes(spark, tmp_path):
    """Reliable pins are always eager (the persist-around-checkpoint
    window must close deterministically); an eager=False request still
    returns a working, checkpointed frame."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    spark.conf.set(PIN_MODE_CONF, "reliable")
    try:
        df = pin(spark.range(3))
        assert df.count() == 3
    finally:
        spark.conf.unset(PIN_MODE_CONF)


def test_pin_reliable_computes_subtree_once(spark, tmp_path):
    """A bare Dataset.checkpoint() RECOMPUTES the plan to write the
    checkpoint files; pin() persists around it so expensive subtrees run
    once and accumulators fire once (r5 review fix). Pinned via an
    accumulator-counting mapInPandas in the subtree."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt4"))
    spark.conf.set(PIN_MODE_CONF, "reliable")
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    try:
        src = spark.range(10).repartition(1).mapInPandas(
            count_rows, "id long")
        out = pin(src, eager=True)
        assert acc.value == 10  # one compute, not two
        assert out.count() == 10
        assert acc.value == 10  # checkpointed reads don't re-run the UDF
    finally:
        spark.conf.unset(PIN_MODE_CONF)


def test_engine_pass_runs_under_reliable_mode(spark, tmp_path):
    """An end-to-end engine path (connected components' distributed loop
    pins every iteration) must work unchanged in reliable mode."""
    from recordlinkage_spark.network import ConnectedComponents

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt3"))
    spark.conf.set(PIN_MODE_CONF, "reliable")
    try:
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], "id_1 string, id_2 string"
        )
        cc = ConnectedComponents(driver_threshold=0)  # force the Spark loop
        out = {r["id"]: r["cluster_id"] for r in cc.compute(pairs).collect()}
        assert out["a"] == out["b"] == out["c"]
        assert out["x"] == out["y"] != out["a"]
    finally:
        spark.conf.unset(PIN_MODE_CONF)
