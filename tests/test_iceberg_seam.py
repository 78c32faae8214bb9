"""Unit coverage for the Iceberg branch of the stage-table seam
(pipeline._write_stage/_read_stage). The runtime has no Iceberg catalog
jars, so the catalog surface is faked with mocks; what these tests pin is
the ENGINE's side of the contract (VERDICT r2 "Next round" #4):

- a stage write goes through ``df.writeTo(<ns>.<stage>).createOrReplace()``
  and the committed snapshot id is captured into the manifest,
- the manifest records ``format`` and ``snapshot_id`` per stage,
- resume reads back through ``spark.read.option("snapshot-id", ...)``
  so a restart pins the immutable snapshot, not "latest".
"""

import json
from unittest import mock

from recordlinkage_spark.config import EngineConfig
from recordlinkage_spark.pipeline import DedupPipeline


def _fake_spark(snapshot_id=77, rows=123):
    spark = mock.MagicMock(name="spark")
    spark.sql.return_value.collect.return_value = [{"snapshot_id": snapshot_id}]
    # _record derives the stage row count from ONE
    # groupBy(spark_partition_id()).agg(count).collect() scan (pipeline._record)
    # — stub that chain on both stage-reader shapes (fresh write + resume)
    part_rows = [{"partition_id": 0, "rows": rows}]
    for reader_df in (
        spark.read.table.return_value,
        spark.read.option.return_value.table.return_value,
    ):
        reader_df.count.return_value = rows
        reader_df.groupBy.return_value.agg.return_value.collect.return_value = (
            part_rows
        )
    return spark


def _cfg():
    return EngineConfig(stage_format="iceberg", iceberg_namespace="dedup_ns")


def test_write_stage_uses_writeto_and_captures_snapshot(tmp_path):
    pipe = DedupPipeline(_cfg(), work_dir=tmp_path)
    spark = _fake_spark(snapshot_id=9001)
    df = mock.MagicMock(name="df")
    out, location, snap = pipe._write_stage(spark, "signatures", df)
    df.writeTo.assert_called_once_with("dedup_ns.signatures")
    df.writeTo.return_value.createOrReplace.assert_called_once_with()
    assert location == "dedup_ns.signatures"
    assert snap == 9001
    # the snapshot id must come from the table's snapshots metadata view
    sql = spark.sql.call_args[0][0]
    assert "dedup_ns.signatures.snapshots" in sql
    spark.read.table.assert_called_once_with("dedup_ns.signatures")
    assert out is spark.read.table.return_value


def test_stage_manifest_records_format_and_snapshot(tmp_path, spark):
    # the real session keeps pyspark Column construction working inside
    # _record's lineage write; the df itself is a mock
    pipe = DedupPipeline(_cfg(), work_dir=tmp_path)
    fake = _fake_spark(snapshot_id=42, rows=7)
    df = mock.MagicMock(name="df")
    pipe._stage(fake, "candidates", lambda: df)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    entry = manifest["candidates"]
    assert entry["format"] == "iceberg"
    assert entry["snapshot_id"] == 42
    assert entry["path"] == "dedup_ns.candidates"
    assert entry["rows"] == 7


def test_resume_pins_snapshot_id_option(tmp_path, spark):
    # first run writes the stage; a fresh pipeline resumes it
    pipe = DedupPipeline(_cfg(), work_dir=tmp_path)
    fake = _fake_spark(snapshot_id=42)
    pipe._stage(fake, "candidates", lambda: mock.MagicMock(name="df"))

    pipe2 = DedupPipeline(_cfg(), work_dir=tmp_path)
    pipe2._load_manifest()
    fake2 = _fake_spark()
    out = pipe2._stage(fake2, "candidates", lambda: (_ for _ in ()).throw(
        AssertionError("resume must not rebuild the stage")
    ))
    fake2.read.option.assert_called_once_with("snapshot-id", "42")
    fake2.read.option.return_value.table.assert_called_once_with(
        "dedup_ns.candidates"
    )
    assert out is fake2.read.option.return_value.table.return_value


def test_parquet_default_has_no_snapshot(tmp_path, spark):
    """The parquet path (tested default) records format + null snapshot —
    same manifest shape, so tooling reads one schema for both formats."""
    from recordlinkage_spark.datagen import webtext_corpus

    docs, _ = webtext_corpus(spark, n_docs=30, dup_fraction=0.2, seed=3)
    pipe = DedupPipeline(EngineConfig(), work_dir=tmp_path)
    pipe._stage(spark, "probe", lambda: docs.select("url"))
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["probe"]["format"] == "parquet"
    assert manifest["probe"]["snapshot_id"] is None
