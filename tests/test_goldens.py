"""Golden-pinned outputs for the driver queries the DuckDB oracle
cannot check (seed/hash-dependent — CORRECTNESS records them rows-only;
see golden_util.GOLDEN_QUERIES for the current list).

Each test reruns the exact driver query at sf0.01 and asserts canonical
equality against the committed CSV (VERDICT r3 next-round #2). The
recall-floor tests catch quality drift; these catch silent semantic
drift the oracle can't see. Regenerate intentionally with
scripts/make_goldens.py and commit the diff.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from golden_util import GOLDEN_QUERIES, canonicalize  # noqa: E402

GOLDEN_DIR = Path(__file__).parent / "goldens"
SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="driver testdata absent")
@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden(spark, name):
    import __spark_entry__ as entry

    got = canonicalize(entry.queries()[name](spark, SF_DIR).toPandas())
    want = pd.read_csv(
        GOLDEN_DIR / f"{name}.csv", dtype=str, keep_default_na=False
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} rows vs golden {len(want)}"
    mism = (got.to_numpy() != want.to_numpy())
    if mism.any():
        i, j = next(zip(*mism.nonzero()))
        raise AssertionError(
            f"{name}: first mismatch row {i} col {got.columns[j]}: "
            f"got {got.iat[i, j]!r} want {want.iat[i, j]!r}"
        )
