"""Micro-benchmark: HOF lambda-capture re-evaluation vs bind_once.

Measures the cost of referencing a COMPUTED expression (split+filter
tokenization) from inside a higher-order-function lambda versus binding
it once via ``textfns.bind_once``.  Spark evaluates captured
expressions per element — ``transform(sequence(...), i -> slice(toks,
i+1, n))`` re-tokenizes the whole document once per n-gram, an
O(tokens^2) blowup per row — while a lambda-bound variable is
evaluated once per row.

Runs word-shingling over a deterministic synthetic corpus at local[4]
and prints one JSON line with both timings.  Usage:

  python scripts/micro_bind_once.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F

from recordlinkage_spark.textfns import bind_once, tokens


def old_word_shingles(tok_col, n):
    """The pre-fix expression: tok_col captured inside both lambdas."""
    joined = F.array_join(tok_col, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tok_col) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
    )
    return F.when(
        F.size(tok_col) <= n, F.array_distinct(F.array(joined))
    ).otherwise(F.array_distinct(grams))


def new_word_shingles(tok_col, n):
    def _grams(toks):
        joined = F.array_join(toks, " ")
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
        return F.when(
            F.size(toks) <= n, F.array_distinct(F.array(joined))
        ).otherwise(F.array_distinct(grams))

    return bind_once(tok_col, _grams)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    toks_per_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("micro_bind_once")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic corpus: each doc is toks_per_doc pseudo-words
    df = (
        spark.range(n_docs)
        .select(
            F.col("id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(toks_per_doc - 1)),
                    lambda i: F.concat(
                        F.lit("w"), ((F.col("id") * 131 + i * 7919) % 5000).cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint()  # materialize so generation cost is excluded
    )

    results = {}
    for name, fn in (("captured", old_word_shingles), ("bind_once", new_word_shingles)):
        tok = tokens(F.col("text"))
        expr = fn(tok, 5)
        t0 = time.time()
        n = (
            df.select(F.size(expr).alias("k"))
            .agg(F.sum("k").alias("total"))
            .collect()[0]["total"]
        )
        results[name] = {"secs": round(time.time() - t0, 2), "total_shingles": int(n)}

    results["n_docs"] = n_docs
    results["tokens_per_doc"] = toks_per_doc
    results["speedup"] = round(
        results["captured"]["secs"] / max(results["bind_once"]["secs"], 1e-9), 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
