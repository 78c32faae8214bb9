"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 in Spark and its oracle_sql() in DuckDB; compare row count,
column names, and order-insensitive values (floats rounded)."""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 5)
    if isinstance(v, int):
        return int(v)
    return str(v)


def main(sf_dir: str, only: list[str]):
    from recordlinkage_spark.config import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        print(f"... {name}: spark", flush=True)
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:32s} SPARK ERROR: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"{name:32s} rows={len(srows):>8} (rows-only, no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        print(f"... {name}: oracle (spark took {time.time() - t0:.1f}s)", flush=True)
        try:
            ores = con.sql(oracles[name])
            ocols = sorted(ores.columns)
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:32s} DUCKDB ERROR: {str(e)[:300]}")
            continue
        ok = True
        msgs = []
        if scols != ocols:
            ok = False
            msgs.append(f"cols {scols} != {ocols}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(srows)} != {len(orows)}")
        if ok:
            # repr-keyed sort: tuples may mix None/int/str per column
            # (e.g. nullable cluster ids), which tuple-< cannot order
            sset = sorted(
                (tuple(norm(r[c]) for c in scols) for r in srows), key=repr
            )
            # duckdb rows are positional in SELECT order; map by column name
            oidx = [ores.columns.index(c) for c in ocols]
            oset = sorted(
                (tuple(norm(r[i]) for i in oidx) for r in orows), key=repr
            )
            if sset != oset:
                ok = False
                oset_s, sset_s = set(oset), set(sset)
                diff_s = [x for x in sset if x not in oset_s][:3]
                diff_o = [x for x in oset if x not in sset_s][:3]
                msgs.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
        status = "OK " if ok else "FAIL"
        print(f"{name:32s} {status} rows={len(srows):>8} [{time.time() - t0:.1f}s] {'; '.join(msgs)}")
        if not ok:
            failures.append((name, "; ".join(msgs)))
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, m in failures:
            print(f"  {n}: {m[:500]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    main(sf, sys.argv[2:])
