"""SemDeDup at-scale evidence run (round 4).

Generates a deterministic synthetic embedding corpus DISTRIBUTEDLY
(seeded counter-style block RNG — no driver-side materialization, no
partitioning dependence), runs semdedup.semantic_dedup end-to-end, and
appends a probe-bracketed record to BENCH/SEMDEDUP_SCALE.json:

  - wall time split into train / dedup (assign + edges + components)
  - planted dup-pair recall (closed-form truth: groups of ``dup_copies``
    consecutive ids at every ``dup_every`` boundary)
  - removed/kept counts and dropped-cluster accumulator value

Corpus geometry: ``n_blobs`` well-separated gaussian blobs (same-blob
non-dup cosine ~0.92 at the default scales — safely below the 0.999 dup
threshold), planted dup groups = anchor vector + 1e-4 jitter (cosine
~1.0). ``mega_n > 0`` additionally plants ``mega_n`` near-copies of ONE
anchor — a semantic mega-cluster that must trip ``cluster_cap`` (rows
stay kept, accumulator counts the drop) without costing clean recall:
the at-scale version of tests/test_semdedup.py::test_mega_cluster_cap.

Usage:
  python scripts/semdedup_scale.py [n] [slots] [mega_n] [max_wait_min]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUIET_SCAN_ROWS_PER_SEC = 1_577_548.8  # BENCH/CONTROLS.json scan.local4
HEALTH_FACTOR = 1.5

DIM = 64
N_BLOBS = 32
DUP_EVERY = 100
DUP_COPIES = 3
NOISE = 3.0
DUP_NOISE = 1e-4
BLOCK = 4096
SEED = 42


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "scaling_control.py"),
         "--child", "scan", "4"],
        capture_output=True, text=True, cwd=str(REPO), timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            res = json.loads(line)
            res["healthy"] = (
                res["rows_per_sec"] >= QUIET_SCAN_ROWS_PER_SEC / HEALTH_FACTOR
            )
            return res
    return {"error": (out.stdout[-200:] + out.stderr[-200:]).strip(),
            "healthy": False}


def synth_embeddings(spark, n: int, mega_n: int):
    """(vec_id bigint, embedding array<double>) — deterministic blob +
    planted-dup corpus, generated on executors in Arrow batches.

    Per-row determinism without per-row RNG construction: noise for row
    x comes from row (x % BLOCK) of a (BLOCK, DIM) normal matrix seeded
    by x // BLOCK — identical output under any partitioning or batch
    split. Ids with id % DUP_EVERY in [1, DUP_COPIES) are near-copies of
    anchor id - (id % DUP_EVERY); the first ``mega_n`` non-dup ids are
    near-copies of anchor 3 (the mega group), when requested.
    """
    import numpy as np
    import pandas as pd

    centers = np.random.RandomState(SEED).normal(scale=10.0,
                                                 size=(N_BLOBS, DIM))

    def block_noise(xs: "np.ndarray", tag: int) -> "np.ndarray":
        out = np.empty((len(xs), DIM))
        blocks = xs // BLOCK
        rows = xs % BLOCK
        for b in np.unique(blocks):
            m = blocks == b
            rs = np.random.RandomState((SEED * tag + int(b) * 7919) % (2**31 - 1))
            out[m] = rs.normal(size=(BLOCK, DIM))[rows[m]]
        return out

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            r = ids % DUP_EVERY
            anchor = np.where(r < DUP_COPIES, ids - r, ids)
            if mega_n:
                # ids 3..(mega_n+2) that are NOT already dup members
                # become near-copies of anchor 3 (itself a non-dup id? 3
                # % 100 = 3 >= DUP_COPIES, so yes: its own anchor)
                in_mega = (ids >= 3) & (ids < 3 + mega_n) & (r >= DUP_COPIES)
                anchor = np.where(in_mega, 3, anchor)
            is_copy = anchor != ids
            V = centers[anchor % N_BLOBS] + NOISE * block_noise(anchor, 1)
            if is_copy.any():
                V[is_copy] += DUP_NOISE * block_noise(ids[is_copy], 2)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(V)})

    return spark.range(n).mapInPandas(
        gen, schema="vec_id bigint, embedding array<double>"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    mega_n = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    max_wait_min = int(sys.argv[4]) if len(sys.argv) > 4 else 60

    deadline = time.time() + max_wait_min * 60
    pre = probe()
    print(json.dumps({"event": "probe", **pre}), flush=True)
    while not pre.get("healthy") and time.time() < deadline:
        time.sleep(240)
        pre = probe()
        print(json.dumps({"event": "probe", **pre}), flush=True)
    forced = not pre.get("healthy")

    from pyspark.sql import functions as F

    from recordlinkage_spark.ann import ivf_train
    from recordlinkage_spark.config import get_spark
    from recordlinkage_spark.semdedup import semantic_dedup

    spark = get_spark("semdedup-scale", master=f"local[{slots}]",
                      shuffle_partitions=2 * slots)
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_embeddings(spark, n, mega_n)
    # materialize the corpus once so generation cost is not measured
    emb.write.mode("overwrite").parquet("/tmp/semdedup_scale_corpus")
    emb = spark.read.parquet("/tmp/semdedup_scale_corpus")

    n_lists = max(8, n // 2000)  # ~2k-vector clusters
    acc = spark.sparkContext.accumulator(0)

    t0 = time.time()
    centroids = ivf_train(emb, n_lists, "vec_id", "embedding", seed=SEED)
    t_train = time.time() - t0

    t1 = time.time()
    out = semantic_dedup(
        emb, threshold=0.999, centroids=centroids, dropped_acc=acc,
    ).cache()
    n_out = out.count()
    t_dedup = time.time() - t1

    removed = out.filter(~F.col("keep")).count()

    # planted-pair recall: members of a dup group share the anchor; a
    # truth pair is found iff both ends got the same component ->
    # sum over (anchor, component) of C(cnt,2) vs closed-form truth.
    r = F.col("id") % DUP_EVERY
    members = out.withColumn(
        "anchor",
        F.when(r < DUP_COPIES, F.col("id") - r).otherwise(F.col("id")),
    )
    if mega_n:
        members = members.withColumn(
            "anchor",
            F.when(
                (F.col("id") >= 3) & (F.col("id") < 3 + mega_n)
                & (r >= DUP_COPIES), F.lit(3),
            ).otherwise(F.col("anchor")),
        )
    grp = (
        members.filter(F.col("anchor") != F.col("id"))
        .select(F.col("anchor"), F.col("component"))
    )
    mega_stats = None
    if mega_n:
        # the mega group and its blob are the planted hazard: its rows
        # may be cap-dropped (kept, correct) or legitimately deduped if
        # a sub-cell lands under cluster_cap; report its fate separately
        # and measure CLEAN recall over the other blobs only (mirrors
        # tests/test_skew_demo.py's non-carrier recall).
        mega_members = members.filter(F.col("anchor") == 3)
        mega_stats = {
            "mega_rows": mega_members.count(),
            "mega_removed": mega_members.filter(~F.col("keep")).count(),
        }
        grp = grp.filter(
            (F.col("anchor") % N_BLOBS != 3) & (F.col("anchor") != 3)
        )
    anchors = members.filter(F.col("anchor") == F.col("id")).select(
        F.col("anchor"), F.col("component").alias("anchor_component")
    )
    # pairs within each planted group (anchor + copies): count same-
    # component pairs among {anchor} U copies
    sizes = (
        grp.join(anchors, "anchor", "left")
        .withColumn("same", (F.col("component") == F.col("anchor_component")).cast("int"))
        .groupBy("anchor")
        .agg(F.count("*").alias("n_copies"), F.sum("same").alias("n_same"))
    )
    # found pairs per group: same-component members form a clique with
    # the anchor: C(n_same+1, 2); truth: C(n_copies+1, 2). (Copies that
    # match each other but not the anchor are not credited — at 1e-4
    # jitter that case is geometrically negligible, and undercounting
    # only makes the gate harder.)
    agg = sizes.agg(
        F.sum(F.expr("n_same * (n_same + 1) / 2")).alias("found"),
        F.sum(F.expr("n_copies * (n_copies + 1) / 2")).alias("truth"),
    ).collect()[0]
    recall = float(agg["found"]) / float(agg["truth"])

    # stop Spark BEFORE probing: a worked JVM (even idle) costs the probe
    # child ~5x (see bench.py) — the probe must see only the host
    spark.stop()
    post = probe()
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n": n, "dim": DIM, "n_lists": n_lists, "slots": slots,
        "mega_n": mega_n, "threshold": 0.999,
        "probe_pre": pre, "probe_post": post, "forced_degraded": forced,
        "t_train_s": round(t_train, 1), "t_dedup_s": round(t_dedup, 1),
        "vecs_per_sec": round(n / (t_train + t_dedup), 1),
        "rows_out": n_out, "removed": removed,
        "dropped_clusters": acc.value,
        "dup_pair_recall": round(recall, 5),
        "mega": mega_stats,
    }
    path = REPO / "BENCH" / "SEMDEDUP_SCALE.json"
    hist = json.loads(path.read_text()) if path.exists() else []
    hist.append(rec)
    path.write_text(json.dumps(hist, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
