"""Annotation file I/O for human labeling.

Reference: recordlinkage/annotation.py:17-284 — renders candidate pairs
plus their full field values into the version-1 JSON schema consumed by
the browser-based annotator app, and reads labeled files back
(label 1 = link, 0 = distinct, absent = unknown). Round 4 closes this
previously survey-skipped component: the file format needs no external
service, only the schema.

Spark-first shape: the expensive part — joining pair ids to their full
records — runs as two distributed joins; only the final (small, by
construction human-sized) labeled set is collected to build the JSON.
A count gate enforces "human-sized": an annotation file with millions
of pairs is a mistake, not a workload, so the writer fails fast instead
of OOMing the driver.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_VERSION_LATEST = 1

# Annotation is manual labeling; nobody labels more pairs than this.
MAX_ANNOTATION_PAIRS = 10_000


def _cast_value(v):
    """JSON-safe scalar: NaN/None -> None, numpy -> python (the
    reference's _cast_value, annotation.py:153-160)."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def write_annotation_file(
    fp,
    pairs: DataFrame,
    df_a: DataFrame,
    df_b: DataFrame | None = None,
    id_col: str = "id",
    dataset_a_name: str | None = None,
    dataset_b_name: str | None = None,
) -> None:
    """Render pairs + record fields into a version-1 annotation file.

    ``pairs`` is a (id_1, id_2) DataFrame; ``df_a``/``df_b`` carry the
    full records keyed by ``id_col`` (dedup when ``df_b`` is None, link
    otherwise — reference annotation.py:17-71). Field values for BOTH
    sides come from df_a's column set, like the reference (it iterates
    ``columns_a`` for both records, annotation.py:141-157)."""
    n = pairs.count()
    if n > MAX_ANNOTATION_PAIRS:
        raise ValueError(
            f"annotation files are for manual labeling: {n} pairs > "
            f"{MAX_ANNOTATION_PAIRS}. Sample or filter the candidate set "
            "first (e.g. pairs.limit(500))."
        )
    if df_b is None:
        df_b = df_a
        dataset_b_name = dataset_a_name
    columns_a = [c for c in df_a.columns if c != id_col]
    a_side = df_a.select(
        F.col(id_col).alias("id_1"),
        *[F.col(c).alias(f"_a_{c}") for c in columns_a],
    )
    b_side = df_b.select(
        F.col(id_col).alias("id_2"),
        *[F.col(c).alias(f"_b_{c}") if c in df_b.columns else F.lit(None).alias(f"_b_{c}")
          for c in columns_a],
    )
    rows = (
        pairs.select("id_1", "id_2")
        .join(a_side, "id_1")
        .join(b_side, "id_2")
        .collect()
    )
    if len(rows) != n:
        # inner joins silently drop pairs whose id is missing from the
        # record frames (and duplicate record ids inflate them) — a human
        # would label a truncated candidate set with no warning
        # (session-8 review fix)
        raise ValueError(
            f"pair/record mismatch: {n} pairs but {len(rows)} joined rows "
            "— some pair ids are missing from df_a/df_b (stale candidate "
            "set? id type mismatch?) or record ids are duplicated"
        )
    result = {"version": SCHEMA_VERSION_LATEST, "pairs": []}
    for r in rows:
        fields = []
        for c in columns_a:
            fields.append({
                "a": {"name": c, "value": _cast_value(r[f"_a_{c}"]),
                      "type": "String"},
                "b": {"name": c, "value": _cast_value(r[f"_b_{c}"]),
                      "type": "String"},
                "similarity": None,
            })
        result["pairs"].append({
            "fields": fields,
            "identifiers": {
                "a": {"dataset": _cast_value(dataset_a_name),
                      "record": _cast_value(r["id_1"])},
                "b": {"dataset": _cast_value(dataset_b_name),
                      "record": _cast_value(r["id_2"])},
            },
        })
    with open(str(fp), "w") as f:
        json.dump(result, f, indent=2)


class AnnotationResult:
    """Labeled annotation file (reference annotation.py:178-284).

    ``links`` / ``distinct`` / ``unknown`` return the pairs labeled
    1 / 0 / unlabeled as lists of (record_a, record_b) tuples, or None
    when empty (the reference returns None, not an empty MultiIndex).
    ``links_df(spark)`` etc. return the same as (id_1, id_2) DataFrames
    for joining back into the pipeline."""

    def __init__(self, pairs=None, version=SCHEMA_VERSION_LATEST):
        self.version = version
        self.pairs = pairs

    def _labeled(self, label):
        if self.pairs is None:
            return None
        out = [
            (p["identifiers"]["a"]["record"], p["identifiers"]["b"]["record"])
            for p in self.pairs
            if p.get("label", None) == label
        ]
        return out or None

    @property
    def links(self):
        return self._labeled(1)

    @property
    def distinct(self):
        return self._labeled(0)

    @property
    def unknown(self):
        return self._labeled(None)

    def _to_df(self, spark: SparkSession, tuples):
        if tuples is None:
            return spark.createDataFrame([], "id_1 string, id_2 string")
        # keep the ids' native JSON type: integer ids come back as bigint
        # so the frame joins the source tables without implicit casts
        # (pre-ANSI Spark coerces string = bigint to DOUBLE — lossy past
        # 2^53, i.e. silently wrong joins on large ids; session-8 review
        # fix). Mixed/other types fall back to strings as before.
        all_int = all(
            isinstance(a, int) and isinstance(b, int)
            and not isinstance(a, bool) and not isinstance(b, bool)
            for a, b in tuples
        )
        if all_int:
            return spark.createDataFrame(tuples, "id_1 bigint, id_2 bigint")
        return spark.createDataFrame(
            [(str(a), str(b)) for a, b in tuples], "id_1 string, id_2 string"
        )

    def links_df(self, spark: SparkSession) -> DataFrame:
        return self._to_df(spark, self.links)

    def distinct_df(self, spark: SparkSession) -> DataFrame:
        return self._to_df(spark, self.distinct)

    def __repr__(self):  # same surface as the reference
        return f"<Annotator pairs, version={self.version}>"

    @classmethod
    def from_dict(cls, d):
        return cls(pairs=d["pairs"], version=d["version"])

    @classmethod
    def from_file(cls, fp):
        with open(str(fp)) as f:
            return cls.from_dict(json.load(f))


def read_annotation_file(fp) -> AnnotationResult:
    """Read a (possibly labeled) annotation file
    (reference annotation.py:74-101)."""
    return AnnotationResult.from_file(fp)
