"""External-dataset loaders.

Reference: recordlinkage/datasets/external.py:55-188 — the Krebsregister
(IMBEI / Mainz epidemiological cancer-registry) comparison-pattern
dataset: 5,749,132 pre-blocked record pairs in 10 blocks, 9 comparison
features + a manually-reviewed is_match flag, distributed by UCI as
``block_{1..10}.zip`` CSVs with ``?`` for missing values.

Spark-first split of responsibilities: the reference DOWNLOADS into a
per-user data home and parses with pandas; here the download stays out
of the library (no network I/O inside a cluster job — ship the files to
shared storage once) and parsing is a distributed ``spark.read.csv``
over all requested block files at once, so a 5.7M-row load is one
partition-parallel scan instead of a driver-side concat of 10 pandas
frames.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KREBS_FEATURES = [
    "cmp_firstname1",
    "cmp_firstname2",
    "cmp_lastname1",
    "cmp_lastname2",
    "cmp_sex",
    "cmp_birthday",
    "cmp_birthmonth",
    "cmp_birthyear",
    "cmp_zipcode",
]


def load_krebsregister(
    spark: SparkSession,
    data_dir: str,
    block=None,
    missing_values: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Load Krebsregister comparison vectors from ``data_dir``.

    ``data_dir`` holds the UCI distribution files ``block_{i}.zip`` (or
    pre-extracted ``block_{i}.csv``) — obtain them once out-of-band; the
    reference's auto-download (external.py:142-161) is deliberately not
    reproduced inside the library. ``block`` selects an int or list of
    ints in 1..10 (default all). ``missing_values`` optionally fills the
    ``?`` NAs, mirroring external.py:134-135.

    Returns ``(features, matches)``: features is (id_1, id_2, cmp_*) and
    matches is the (id_1, id_2) pairs flagged as true matches — the
    DataFrame equivalent of the reference's (DataFrame, MultiIndex)
    return. The reference's ``shuffle`` flag only randomizes pandas row
    order for order-sensitive sklearn consumers; DataFrames are
    unordered, so it has no equivalent here (sort or sample at use site).
    """
    if block is None:
        block = list(range(1, 11))
    if not isinstance(block, (list, tuple)):
        block = [block]
    bad = [b for b in block if b not in range(1, 11)]
    if bad:
        raise ValueError(
            "Argument 'block' has to be integer in [1..10] or list of "
            f"integers, got {bad}"
        )
    root = Path(data_dir)
    paths = []
    for b in block:
        for cand in (root / f"block_{b}.csv", root / f"block_{b}.zip"):
            if cand.exists():
                paths.append(str(cand))
                break
        else:
            raise FileNotFoundError(
                f"{root}/block_{b}.csv (or .zip) not found — download the "
                "UCI 'donation' archive and place its blocks there"
            )
    if any(p.endswith(".zip") for p in paths):
        # Spark's csv reader handles gzip natively but not zip archives;
        # extract once next to the source (idempotent) and scan the csvs.
        import zipfile

        csv_paths = []
        for p in paths:
            if p.endswith(".csv"):
                csv_paths.append(p)
                continue
            target = Path(p).with_suffix(".csv")
            if not target.exists():
                with zipfile.ZipFile(p) as z:
                    # pick the first real CSV member, not namelist()[0]
                    # blindly (archives may lead with directories or
                    # metadata entries)
                    members = [
                        m for m in z.namelist()
                        if m.lower().endswith(".csv") and not m.endswith("/")
                    ] or [m for m in z.namelist() if not m.endswith("/")]
                    if not members:
                        raise ValueError(f"{p}: no extractable file in archive")
                    # atomic publish: write to a temp sibling then rename,
                    # so a concurrent reader of the shared data_dir never
                    # sees (and then permanently caches) a half-written
                    # CSV (session-8 review fix)
                    tmp = target.with_name(target.name + f".tmp{os.getpid()}")
                    tmp.write_bytes(z.read(members[0]))
                    os.replace(tmp, target)
            csv_paths.append(str(target))
        paths = csv_paths
    raw = (
        spark.read.option("header", True)
        .option("nullValue", "?")
        .option("inferSchema", False)
        .csv(paths)
    )
    cols = raw.columns
    if len(cols) != 12:
        raise ValueError(
            f"expected 12 columns (id_1, id_2, 9 features, is_match), got {cols}"
        )
    named = raw.select(
        F.col(cols[0]).cast("long").alias("id_1"),
        F.col(cols[1]).cast("long").alias("id_2"),
        *[
            F.col(c).cast("double").alias(name)
            for c, name in zip(cols[2:11], KREBS_FEATURES)
        ],
        F.lower(F.col(cols[11])).eqNullSafe("true").alias("is_match"),
    )
    features = named.drop("is_match")
    if missing_values is not None:
        features = features.fillna(float(missing_values), subset=KREBS_FEATURES)
    matches = named.filter(F.col("is_match")).select("id_1", "id_2")
    return features, matches
