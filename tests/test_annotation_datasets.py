"""Annotation file I/O + Krebsregister loader (r4 — closes two
survey-skipped components; reference recordlinkage/annotation.py and
recordlinkage/datasets/external.py:55-188)."""

import json
import zipfile

import pytest

from recordlinkage_spark import annotation
from recordlinkage_spark.datasets import KREBS_FEATURES, load_krebsregister


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [
            ("p1", "alice", 34.0),
            ("p2", "alicia", float("nan")),
            ("p3", "bob", 51.0),
        ],
        "id string, name string, age double",
    )


def test_annotation_write_read_dedup(spark, people, tmp_path):
    pairs = spark.createDataFrame(
        [("p1", "p2"), ("p1", "p3")], "id_1 string, id_2 string"
    )
    fp = tmp_path / "ann.json"
    annotation.write_annotation_file(
        fp, pairs, people, id_col="id", dataset_a_name="people"
    )
    doc = json.loads(fp.read_text())
    assert doc["version"] == annotation.SCHEMA_VERSION_LATEST
    assert len(doc["pairs"]) == 2
    rec = {p["identifiers"]["a"]["record"]: p for p in doc["pairs"]}
    p = rec["p1"]
    assert p["identifiers"]["a"]["dataset"] == "people"
    assert p["identifiers"]["b"]["dataset"] == "people"
    fields = {f["a"]["name"]: f for f in p["fields"]}
    assert set(fields) == {"name", "age"}
    assert fields["name"]["a"]["value"] == "alice"
    assert fields["name"]["similarity"] is None
    # NaN age of p2 must be rendered as JSON null (reference _cast_value)
    p12 = [q for q in doc["pairs"] if q["identifiers"]["b"]["record"] == "p2"][0]
    assert {f["a"]["name"]: f["b"]["value"] for f in p12["fields"]}["age"] is None

    # unlabeled file: links/distinct None, unknown = all pairs (reference
    # tests/test_annotator.py asserts exactly this on fresh files)
    res = annotation.read_annotation_file(fp)
    assert res.links is None and res.distinct is None
    assert sorted(res.unknown) == [("p1", "p2"), ("p1", "p3")]


def test_annotation_link_and_labels(spark, people, tmp_path):
    other = spark.createDataFrame(
        [("q1", "alyce", 33.0)], "id string, name string, age double"
    )
    pairs = spark.createDataFrame([("p1", "q1")], "id_1 string, id_2 string")
    fp = tmp_path / "link.json"
    annotation.write_annotation_file(
        fp, pairs, people, other, id_col="id",
        dataset_a_name="a", dataset_b_name="b",
    )
    doc = json.loads(fp.read_text())
    assert doc["pairs"][0]["identifiers"]["b"] == {"dataset": "b", "record": "q1"}

    # simulate the annotator labeling: label 1 -> link
    doc["pairs"][0]["label"] = 1
    fp.write_text(json.dumps(doc))
    res = annotation.read_annotation_file(fp)
    assert res.links == [("p1", "q1")]
    assert res.distinct is None and res.unknown is None
    df = res.links_df(spark)
    assert [(r["id_1"], r["id_2"]) for r in df.collect()] == [("p1", "q1")]
    assert res.distinct_df(spark).count() == 0


def test_annotation_writer_count_gate(spark, people, tmp_path, monkeypatch):
    monkeypatch.setattr(annotation, "MAX_ANNOTATION_PAIRS", 1)
    pairs = spark.createDataFrame(
        [("p1", "p2"), ("p1", "p3")], "id_1 string, id_2 string"
    )
    with pytest.raises(ValueError, match="manual labeling"):
        annotation.write_annotation_file(tmp_path / "x.json", pairs, people, id_col="id")


KREBS_HEADER = (
    "id_1,id_2,cmp_fname_c1,cmp_fname_c2,cmp_lname_c1,cmp_lname_c2,"
    "cmp_sex,cmp_bd,cmp_bm,cmp_by,cmp_plz,is_match"
)


def _write_block(tmp_path, i, rows, as_zip=False):
    csv = "\n".join([KREBS_HEADER] + rows)
    if as_zip:
        with zipfile.ZipFile(tmp_path / f"block_{i}.zip", "w") as z:
            z.writestr(f"block_{i}.csv", csv)
    else:
        (tmp_path / f"block_{i}.csv").write_text(csv)


def test_krebsregister_loader(spark, tmp_path):
    _write_block(tmp_path, 1, [
        "37291,53113,1,?,1,?,1,1,1,1,0,TRUE",
        "39086,47614,1,?,1,?,1,1,1,1,1,TRUE",
        "1,2,0.16667,?,0.1,?,0,0,0,1,0,FALSE",
    ])
    _write_block(tmp_path, 2, [
        "3,4,0.5,?,0.25,?,1,0,0,0,0,FALSE",
    ], as_zip=True)

    feats, matches = load_krebsregister(spark, str(tmp_path), block=[1, 2])
    assert feats.columns == ["id_1", "id_2"] + KREBS_FEATURES
    assert feats.count() == 4
    assert {(r["id_1"], r["id_2"]) for r in matches.collect()} == {
        (37291, 53113), (39086, 47614)
    }
    row = {r["id_1"]: r for r in feats.collect()}
    assert row[1]["cmp_firstname1"] == pytest.approx(0.16667)
    assert row[1]["cmp_firstname2"] is None  # '?' -> null

    # single-block int + missing fill
    feats1, _ = load_krebsregister(spark, str(tmp_path), block=1, missing_values=9.0)
    assert feats1.count() == 3
    assert feats1.filter("cmp_firstname2 = 9.0").count() == 3

    with pytest.raises(ValueError, match="block"):
        load_krebsregister(spark, str(tmp_path), block=11)
    with pytest.raises(FileNotFoundError):
        load_krebsregister(spark, str(tmp_path), block=3)


def test_write_annotation_file_missing_id_raises(spark, tmp_path):
    """A pair whose id is absent from the record frames must fail fast —
    the inner join previously dropped it silently, so a human labeled a
    truncated candidate set (session-8 review fix)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string")
    pairs = spark.createDataFrame([(1, 2), (1, 99)], "id_1 bigint, id_2 bigint")
    with pytest.raises(ValueError, match="missing"):
        annotation.write_annotation_file(tmp_path / "f.json", pairs, df)


def test_annotation_integer_ids_round_trip(spark, tmp_path):
    """Integer ids must come back as bigint from links_df, not strings —
    a string=bigint join coerces to double, lossy past 2^53 (session-8
    review fix)."""
    big = 2**53 + 3
    df = spark.createDataFrame(
        [(big, "a"), (big + 1, "b")], "id bigint, name string"
    )
    pairs = spark.createDataFrame(
        [(big, big + 1)], "id_1 bigint, id_2 bigint"
    )
    fp = tmp_path / "ann.json"
    annotation.write_annotation_file(fp, pairs, df)
    d = json.loads(fp.read_text())
    d["pairs"][0]["label"] = 1
    fp.write_text(json.dumps(d))
    links = annotation.read_annotation_file(fp).links_df(spark)
    assert dict(links.dtypes) == {"id_1": "bigint", "id_2": "bigint"}
    assert links.collect()[0]["id_1"] == big
