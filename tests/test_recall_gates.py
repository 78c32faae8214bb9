"""Hard CI gates for the approximate passes that are rows-only at the
driver contract (VERDICT r2 "Next round" #3): each LSH-family pass gets a
seeded recall assertion against its own EXACT oracle, so a recall
regression fails pytest instead of only drifting a bench number.

- MinHash/LSH at the shipped pipeline config vs exact 3-gram Jaccard.
- Embedding LSH near-dup pairs vs exact cosine_all_pairs.
- SimHash candidate superset at hamming <= hamming_k (pigeonhole
  guarantee made exact: every all-pairs signature pair within the
  Hamming budget must appear among the candidates).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from recordlinkage_spark import ann
from recordlinkage_spark.datagen import webtext_corpus
from recordlinkage_spark.minhash import MinHashLSH
from recordlinkage_spark.simhash import SimHash
from recordlinkage_spark.textfns import tokens, word_shingles


@pytest.fixture(scope="module")
def corpus(spark):
    docs, truth = webtext_corpus(spark, n_docs=600, dup_fraction=0.35, seed=1535)
    docs = docs.cache()
    docs.count()
    return docs


def _exact_jaccard_pairs(docs, threshold):
    """All-pairs exact 3-gram Jaccard >= threshold (the LSH ground truth)."""
    sh = docs.select(
        F.col("url").alias("id"),
        F.array_distinct(word_shingles(tokens(F.col("text")), 3)).alias("s"),
    ).filter(F.size("s") > 0)
    a = sh.select(F.col("id").alias("id_1"), F.col("s").alias("s1")).repartition(8)
    b = sh.select(F.col("id").alias("id_2"), F.col("s").alias("s2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_1") > F.col("id_2"))
        .withColumn(
            "j",
            F.size(F.array_intersect("s1", "s2")).cast("double")
            / F.size(F.array_union("s1", "s2")),
        )
        .filter(F.col("j") >= threshold)
        .select("id_1", "id_2")
    )


def _norm_pairs(rows):
    return {
        (min(r["id_1"], r["id_2"]), max(r["id_1"], r["id_2"])) for r in rows
    }


def test_minhash_lsh_recall_vs_exact_jaccard(corpus):
    """Pipeline config (128 perms, 32x4) must keep >=0.99 recall against
    the exact-Jaccard truth at the verify threshold — the BASELINE.json
    recall gate, pinned in CI rather than only in BENCH_r*.json."""
    truth = _norm_pairs(_exact_jaccard_pairs(corpus, 0.5).collect())
    assert len(truth) > 50  # fixture sanity: the gate must test something
    lsh = MinHashLSH(num_perm=128, bands=32, rows=4, shingle_size=3)
    got = _norm_pairs(
        lsh.verified_pairs(corpus, "url", "text", threshold=0.5).collect()
    )
    recall = len(truth & got) / len(truth)
    assert recall >= 0.99


def test_embedding_lsh_recall_vs_exact_cosine(spark):
    """embedding_near_dup_pairs must recover >=0.95 of the exact
    cosine_all_pairs truth on a seeded corpus with planted near-dups."""
    rng = np.random.RandomState(1535)
    base = rng.normal(size=(250, 32))
    rows = [(i, (v / np.linalg.norm(v)).tolist()) for i, v in enumerate(base)]
    for i in range(40):  # planted near-dups, cosine ~0.995
        v = base[i] + rng.normal(scale=0.05, size=32)
        rows.append((1000 + i, (v / np.linalg.norm(v)).tolist()))
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    truth = _norm_pairs(
        ann.cosine_all_pairs(vecs, threshold=0.9).collect()
    )
    assert len(truth) >= 40
    got = _norm_pairs(
        ann.embedding_near_dup_pairs(
            vecs, dim=32, threshold=0.9, bits=8, tables=8
        ).collect()
    )
    recall = len(truth & got) / len(truth)
    assert recall >= 0.95


def test_simhash_candidates_superset_within_hamming_budget(corpus):
    """Exact pigeonhole gate: EVERY signature pair at hamming <= hamming_k
    (with blocks >= hamming_k+1) must appear among the candidates — this
    guarantee is deterministic, so the assertion is exact, not a recall
    floor."""
    sh = SimHash(hamming_k=3, blocks=4, shingle_size=2)
    sigs = {r["id"]: r["simhash"] for r in
            sh.signatures(corpus, "url", "text").collect()}
    ids = sorted(sigs)
    codes = np.array([sigs[i] for i in ids], dtype=np.int64).astype(np.uint64)
    # all-pairs hamming distance on the driver (600 docs -> 180k pairs)
    x = codes[:, None] ^ codes[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    for _ in range(64):  # popcount via shift-and-mask (no np.popcount in np1)
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    i, j = np.nonzero(np.triu(ham <= 3, k=1))
    truth = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(i, j)}
    assert len(truth) > 10
    got = _norm_pairs(sh.candidate_pairs(corpus, "url", "text").collect())
    missing = truth - got
    assert not missing, f"{len(missing)} hamming<=3 pairs missed: {sorted(missing)[:5]}"


def test_ivf_topk_recall_vs_exact_cosine(spark):
    """r4: IVF (trained coarse quantizer) recall gates vs the exact
    brute-force baseline on a seeded corpus with planted near-dups.

    The rank-1 neighbor (a ~0.999-cosine twin) must ALWAYS be found —
    a near-duplicate quantizes to the same list as its query at any
    nprobe — and tail recall@10 must climb with nprobe (measured 0.70 at
    4/16 probes, 0.90 at 8/16; gated with margin)."""
    rng = np.random.RandomState(1535)
    base = rng.normal(size=(250, 32))
    rows = [(i, (v / np.linalg.norm(v)).tolist()) for i, v in enumerate(base)]
    for i in range(40):
        v = base[i] + rng.normal(scale=0.05, size=32)
        rows.append((1000 + i, (v / np.linalg.norm(v)).tolist()))
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    queries = vecs.filter("vec_id >= 1000")
    exact_rows = ann.cosine_topk(vecs, queries, k=10).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    e1 = {(r["query_id"], r["neighbor_id"]) for r in exact_rows if r["rank"] == 1}
    for nprobe, floor in ((4, 0.6), (8, 0.8)):
        got = ann.ivf_topk(
            vecs, queries, k=10, n_lists=16, nprobe=nprobe, seed=7
        ).collect()
        a = {(r["query_id"], r["neighbor_id"]) for r in got}
        a1 = {(r["query_id"], r["neighbor_id"]) for r in got if r["rank"] == 1}
        assert e1 == a1, f"nprobe={nprobe}: a planted rank-1 twin was missed"
        recall = len(e & a) / len(e)
        assert recall >= floor, f"nprobe={nprobe}: recall@10 {recall:.3f} < {floor}"
