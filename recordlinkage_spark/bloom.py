"""Bloom-filter incremental exact dedup: filter a NEW crawl against an
existing corpus WITHOUT ever shuffling the corpus.

No reference counterpart: recordlinkage indexes two bounded record sets
against each other (``Index.index(df_a, df_b)``); it has no
new-snapshot-vs-corpus membership pass. This is the incremental tier a
recurring web-crawl pipeline runs BEFORE the pairwise tiers — the shape
Dolma's bloom-filter dedupe tool uses for URL/paragraph dedup at
corpus scale (Soldaini et al. 2024, arXiv:2402.00159 §4) — so it slots
in front of ``DedupPipeline`` / ``MinHashLSH.candidate_pairs_against``.

Plan shape (what matters at 100 TB, where the corpus is the 100 TB side
and the new crawl is the small side):

1. fingerprint — ``F.xxhash64`` over the key columns, pure JVM.
2. BUILD — one ``mapInPandas`` pass over the corpus: each partition ORs
   its fingerprints into a local m-bit numpy bitmap and emits only its
   NON-ZERO 4 MiB chunks. The chunks are OR-reduced executor-side
   (shuffle on chunk_id — at most n_partitions * m/8 bytes on the wire,
   less because empty chunks are skipped), so the corpus scan runs with
   FULL parallelism in one job; the driver then streams the <= n_chunks
   reduced rows and holds one bitmap + one chunk. (A driver-side
   ``toLocalIterator`` over the raw partials — the obvious shape —
   executes one partition per job, serializing the entire corpus scan;
   measured 0.45 scaling efficiency at 2->8 slots before the reduce.)
3. PROBE — the bitmap is broadcast; one vectorized pandas-UDF pass tags
   each new row. Bloom-NEGATIVE rows are *definitely* absent from the
   corpus (a Bloom filter has no false negatives) and pass through with
   no join at all — at typical dup rates that is most of the crawl.
4. RESCUE (exact mode) — only bloom-POSITIVE rows (true dups + ~fpp of
   the uniques) are verified with a semi-join on the REAL key columns:
   positives' keys are broadcast at the corpus scan (count-gated, same
   fallback contract as DedupPipeline's verify gather), so exactness
   holds even across xxhash64 collisions and the corpus still never
   shuffles. With ``exact=False`` the rescue is skipped: ~fpp of the
   unique new rows are silently dropped — the Dolma tradeoff — for a
   corpus that is scanned exactly once.

Semantics (exact mode) == ANSI ``WHERE NOT EXISTS (SELECT 1 FROM corpus
c WHERE c.k1 = n.k1 AND ...)``: null keys never match, so null-keyed new
rows always survive. Duplicates WITHIN the new snapshot are untouched —
compose with ``textfns.exact_dup_groups`` / ``DedupPipeline`` for
intra-snapshot dedup.

Scale envelope: m = -n·ln(fpp)/ln(2)^2 bits for n corpus keys — 1e9 keys
at fpp=0.01 is a 1.2 GB bitmap (broadcastable on a real cluster; tune
fpp up to shrink it). ``max_bitmap_bytes`` guards the driver/broadcast:
past it, build raises and names the alternatives rather than OOMing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from recordlinkage_spark.caching import pin
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BloomFilter", "build_bloom", "dedup_against"]

_CHUNK_BYTES = 4 << 20  # Arrow row payload cap for the build pass


def _sizing(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits and k hashes for n items at fpp."""
    n = max(1, int(expected_items))
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m_bits = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m_bits = ((max(m_bits, 64) + 63) // 64) * 64
    k = max(1, round(m_bits / n * math.log(2)))
    return m_bits, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — derives
    the second hash for Kirsch-Mitzenmacher double hashing."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _positions(fp: np.ndarray, k: int, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(byte_idx, bit_mask) arrays of shape (n, k) for int64 fingerprints.

    g_i = h1 + i*h2 mod m (Kirsch & Mitzenmacher 2006: two hashes give
    the asymptotic fpp of k independent ones); h1 is the xxhash64 value,
    h2 an odd splitmix64 remix of it.
    """
    h1 = np.ascontiguousarray(fp, dtype=np.int64).view(np.uint64)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit_mask = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return byte_idx, bit_mask


@dataclass
class BloomFilter:
    """An immutable built filter: the bitmap plus its sizing parameters."""

    m_bits: int
    k: int
    bitmap: np.ndarray  # uint8, m_bits // 8 bytes
    expected_items: int
    fpp: float

    def might_contain_np(self, fp: np.ndarray) -> np.ndarray:
        """Vectorized membership test over int64 fingerprints -> bool[n]."""
        if len(fp) == 0:
            return np.zeros(0, dtype=bool)
        byte_idx, bit_mask = _positions(fp, self.k, self.m_bits)
        return ((self.bitmap[byte_idx] & bit_mask) != 0).all(axis=1)

    def add_np(self, fp: np.ndarray) -> None:
        if len(fp) == 0:
            return
        byte_idx, bit_mask = _positions(fp, self.k, self.m_bits)
        # bitwise_or.at handles duplicate byte indices within the batch
        np.bitwise_or.at(self.bitmap, byte_idx.ravel(), bit_mask.ravel())


def _fingerprint(keys) -> Column:
    cols = [keys] if isinstance(keys, (str, Column)) else list(keys)
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def build_bloom(
    corpus: DataFrame,
    keys,
    expected_items: int | None = None,
    fpp: float = 0.01,
    max_bitmap_bytes: int = 512 << 20,
) -> BloomFilter:
    """Build a BloomFilter over ``xxhash64(keys)`` of every corpus row.

    One distributed scan (plus one ``count()`` when ``expected_items`` is
    not given — pass it to keep the corpus single-scan). Per-partition
    bitmaps are chunked map-side, OR-reduced executor-side on chunk_id,
    and only the <= n_chunks reduced rows (m/8 bytes total) reach the
    driver — the corpus itself never shuffles and driver memory stays at
    one bitmap regardless of partition count.
    """
    fps = corpus.select(_fingerprint(keys).alias("_fp"))
    if expected_items is None:
        expected_items = fps.count()
    m_bits, k = _sizing(expected_items, fpp)
    m_bytes = m_bits // 8
    if m_bytes > max_bitmap_bytes:
        raise ValueError(
            f"bloom bitmap would be {m_bytes / 2**20:.0f} MiB for "
            f"{expected_items} items at fpp={fpp} (> max_bitmap_bytes="
            f"{max_bitmap_bytes / 2**20:.0f} MiB). Raise fpp or "
            "max_bitmap_bytes, or use a pairwise tier instead "
            "(MinHashLSH.candidate_pairs_against / a plain left_anti join)."
        )

    n_chunks = (m_bytes + _CHUNK_BYTES - 1) // _CHUNK_BYTES

    def build_partial(batches):
        bitmap = np.zeros(m_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            fp = pdf["_fp"].to_numpy(dtype=np.int64)
            if len(fp):
                seen = True
                byte_idx, bit_mask = _positions(fp, k, m_bits)
                np.bitwise_or.at(bitmap, byte_idx.ravel(), bit_mask.ravel())
        if not seen:
            return
        for cid in range(n_chunks):
            chunk = bitmap[cid * _CHUNK_BYTES:(cid + 1) * _CHUNK_BYTES]
            if chunk.any():  # empty chunks cost nothing on the wire
                yield pd.DataFrame(
                    {"chunk_id": [cid], "bits": [chunk.tobytes()]}
                )

    def or_partials(batches):
        # executor-side OR-reduce after the chunk_id shuffle: incremental
        # over Arrow batches, so task memory = (chunks in this reducer)
        # * chunk size ~= m_bytes / n_reducers, never the full group.
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            for cid, raw in zip(pdf["chunk_id"].to_numpy(), pdf["bits"]):
                arr = np.frombuffer(raw, dtype=np.uint8)
                buf = acc.get(int(cid))
                if buf is None:
                    acc[int(cid)] = arr.copy()
                else:
                    np.bitwise_or(buf, arr, out=buf)
        for cid, buf in acc.items():
            yield pd.DataFrame({"chunk_id": [cid], "bits": [buf.tobytes()]})

    parts = fps.mapInPandas(build_partial, "chunk_id int, bits binary")
    sc = corpus.sparkSession.sparkContext
    n_red = max(1, min(n_chunks, sc.defaultParallelism))
    reduced = parts.repartition(n_red, "chunk_id").mapInPandas(
        or_partials, "chunk_id int, bits binary"
    )
    agg = np.zeros(m_bytes, dtype=np.uint8)
    # The first toLocalIterator job materializes the shuffle, which runs
    # every corpus-scan map task IN PARALLEL; the remaining <= n_red - 1
    # jobs reuse the shuffle files (skipped stages). Driver never holds
    # more than the aggregate bitmap + one reduced chunk row.
    for row in reduced.toLocalIterator():
        off = row["chunk_id"] * _CHUNK_BYTES
        chunk = np.frombuffer(row["bits"], dtype=np.uint8)
        np.bitwise_or(agg[off:off + len(chunk)], chunk,
                      out=agg[off:off + len(chunk)])
    return BloomFilter(m_bits=m_bits, k=k, bitmap=agg,
                       expected_items=expected_items, fpp=fpp)


def _might_contain_col(df: DataFrame, bf: BloomFilter, fp_col: str) -> Column:
    """Boolean pandas-UDF column testing ``fp_col`` against the broadcast
    bitmap (one torrent broadcast per call; Arrow-batched probes)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bf.bitmap.tobytes())
    k, m_bits = bf.k, bf.m_bits

    @F.pandas_udf("boolean")
    def probe(fp: pd.Series) -> pd.Series:
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        arr = fp.to_numpy(dtype=np.int64)
        if len(arr) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        byte_idx, bit_mask = _positions(arr, k, m_bits)
        return pd.Series(((bitmap[byte_idx] & bit_mask) != 0).all(axis=1))

    return probe(F.col(fp_col))


def dedup_against(
    new: DataFrame,
    corpus: DataFrame,
    keys,
    fpp: float = 0.01,
    expected_items: int | None = None,
    exact: bool = True,
    max_bitmap_bytes: int = 512 << 20,
    broadcast_threshold: int = 2_000_000,
    bf: BloomFilter | None = None,
) -> DataFrame:
    """Rows of ``new`` whose ``keys`` do not appear in ``corpus``.

    Exact mode == SQL ``NOT EXISTS`` on the key columns (null keys never
    match, xxhash64 collisions are rescued by the real-key join). With
    ``exact=False`` the rescue join is skipped and ~fpp of the UNIQUE
    new rows are dropped along with the duplicates — corpus scanned once,
    zero joins. Pass a prebuilt ``bf`` to amortize one corpus build over
    many snapshots. ``keys`` is a column name or list of names present in
    BOTH frames.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    if bf is None:
        bf = build_bloom(corpus, key_cols, expected_items=expected_items,
                         fpp=fpp, max_bitmap_bytes=max_bitmap_bytes)
    flagged = new.withColumn("_fp", _fingerprint(key_cols))
    flagged = flagged.withColumn("_might", _might_contain_col(flagged, bf, "_fp"))
    if exact:
        # exact mode consumes `flagged` three times (pos_keys.count() gate,
        # the negatives filter, the positives/rescue branch) — without a
        # materialization each consumer re-runs the fingerprint + bitmap
        # probe over the full snapshot. localCheckpoint (lazy) computes the
        # probe once; blocks are ContextCleaner-collected when the result
        # is unreferenced. (exact=False consumes it once — no checkpoint.)
        flagged = pin(flagged)
    negatives = flagged.filter(~F.col("_might")).drop("_fp", "_might")
    if not exact:
        return negatives
    positives = flagged.filter(F.col("_might")).drop("_fp", "_might")
    pos_keys = positives.select(*key_cols).dropna().distinct()
    # Count-gate the broadcast (same contract as DedupPipeline's verify
    # gather): past the gate fall back to a shuffle semi-join and let AQE
    # plan it — still correct, just no longer corpus-shuffle-free.
    n_pos = pos_keys.count()
    gathered = F.broadcast(pos_keys) if n_pos <= broadcast_threshold else pos_keys
    present = (
        corpus.select(*key_cols)
        .join(gathered, on=key_cols, how="leftsemi")
        .distinct()
    )
    if n_pos <= broadcast_threshold:
        present = F.broadcast(present)
    rescued = positives.join(present, on=key_cols, how="left_anti")
    return negatives.unionByName(rescued)
