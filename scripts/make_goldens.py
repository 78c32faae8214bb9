"""Regenerate the committed golden CSVs for the oracle-less driver
queries (tests/goldens/*.csv, asserted by tests/test_goldens.py).

Run ONLY when an intentional semantic change is made to one of these
passes; commit the diff alongside the change so the review shows
exactly what moved:

    python scripts/make_goldens.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = REPO / "tests" / "goldens"


def main() -> None:
    import __spark_entry__ as entry
    from golden_util import GOLDEN_QUERIES, canonicalize
    from recordlinkage_spark.config import get_spark

    spark = get_spark("make-goldens", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(exist_ok=True)
    qs = entry.queries()
    for name in GOLDEN_QUERIES:
        pdf = canonicalize(qs[name](spark, SF_DIR).toPandas())
        path = OUT / f"{name}.csv"
        pdf.to_csv(path, index=False)
        print(f"{name}: {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
