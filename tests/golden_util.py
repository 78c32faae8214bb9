"""Canonicalization shared by scripts/make_goldens.py and
tests/test_goldens.py.

The seed/hash-dependent driver queries listed in GOLDEN_QUERIES have no
DuckDB oracle (CORRECTNESS records them rows-only), so their outputs are
pinned as committed golden CSVs at sf0.01 instead (VERDICT r3 next-round
#2): recall floors catch quality drift, goldens catch silent semantic
drift.

Canonical form: columns sorted by name, every value rendered to a
stable string (floats via round(9) + %.9g — these queries already round
their float outputs to 1e-4..1e-6, so this is exact), rows sorted.
Partition order, float noise below 1e-9, and int32/int64 width
differences can therefore never flap a golden.
"""

from __future__ import annotations

import pandas as pd


def _render(v) -> str:
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, float):
        return format(round(v, 9), ".9g")
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_render(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return pd.DataFrame(rows, columns=cols, dtype=str)


GOLDEN_QUERIES = [
    "random_index_documents",
    "phonetic_codes",
    "simhash_candidates",
    "substring_span_pairs",
    "substring_span_removal",
    "embedding_near_dup_lsh",
    "ecm_params",
    "multimodal_features",
    "ann_ivf_topk",
    "semantic_dedup",
    "compare_string_sw_lcs",
    "webtext_e2e",
]
