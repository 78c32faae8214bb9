"""Post-classification graph operators.

Reference: recordlinkage/network.py. The clustering stage is the core of
the dedup engine at web scale (north_rule names connected components
explicitly), so ConnectedComponents is an iterative min-label-propagation
driver loop with per-iteration ``localCheckpoint`` (lineage blowup) and an
``observe``-style convergence count — no networkx, no driver-side graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from recordlinkage_spark.caching import pin


class OneToManyLinking:
    """Drop pairs whose id on the given side is duplicated, keep first by
    input order (recordlinkage/network.py:84-148)."""

    def __init__(self, level: int = 0):
        if level not in (0, 1):
            raise ValueError("level must be 0 or 1")
        self.level = level

    def compute(self, pairs: DataFrame, order_col: str = "seq") -> DataFrame:
        key = "id_1" if self.level == 0 else "id_2"
        # (id_1, id_2) tiebreak: row_number over order_col alone breaks
        # order_col ties by partition arrival order — same input,
        # different survivor across runs. Same determinization as
        # OneToOneLinking's struct-min key (session-8 review fix).
        w = Window.partitionBy(key).orderBy(
            F.col(order_col), F.col("id_1"), F.col("id_2")
        )
        return (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )


class OneToOneLinking:
    """Greedy maximal matching in input order (recordlinkage/network.py:7-81).

    The reference iterates pairs sequentially, keeping a pair iff neither
    endpoint was seen (network.py:38-49) — order-dependent. Distributed
    equivalence: a pair is accepted by sequential greedy iff it is the
    minimum-seq pair on BOTH its endpoints among still-alive pairs; accept
    all such local minima, drop conflicts, iterate to fixpoint. Each
    accepted set is exactly what sequential greedy would accept at that
    "wavefront", so the final matching is identical.
    """

    def __init__(self, driver_threshold: int = 5_000_000,
                 prewave_min_rows: int | None = None, prewave_rounds: int = 2):
        # Below this pair count the exact sequential greedy runs on the
        # driver in one shot. Above it, compute() processes the pairs in
        # RANK-RANGE CHUNKS of this size (r3): sequential greedy only
        # ever depends on EARLIER pairs, so the K globally-smallest
        # ranks can be resolved exactly on the driver given the seen-
        # endpoint sets from previous chunks — ceil(n/K) deterministic
        # rounds, versus the round-2 wave loop's O(block diameter)
        # rounds (measured 2.41x the driver path at 10M pairs; the
        # chunked path replaces it).
        self.driver_threshold = driver_threshold
        # OPT-IN (r4): chunks larger than prewave_min_rows run
        # prewave_rounds distributed greedy waves BEFORE the driver pull:
        # each wave accepts every alive pair that is min on both its
        # endpoints and kills its conflicts — exactly the wave-fixpoint
        # step of the class docstring, so the accepted set is a provable
        # prefix of sequential greedy and only the unresolved tangle
        # crosses to the driver. Measured at 10M pairs / K=5M chunks the
        # waves are SHUFFLE-BOUND and cost more wall-clock than the pull
        # saves (4.1x vs 0.35x of the one-shot driver path, PLANS.md r4),
        # so the default is OFF; enable it when the driver pull itself is
        # the memory constraint (chunks near driver capacity) rather
        # than time.
        self.prewave_min_rows = prewave_min_rows
        self.prewave_rounds = prewave_rounds

    def _compute_driver(self, pairs: DataFrame, order_col: str) -> DataFrame:
        """Literal reference semantics (network.py:38-49): iterate pairs in
        seq order, keep a pair iff its id_1 is unseen AMONG id_1s and its
        id_2 unseen among id_2s — the reference tracks the two levels in
        SEPARATE sets (set_a/set_b, network.py:40-47), so one record may
        appear once on each side.

        Vectorized as the equivalent wave fixpoint (see class docstring):
        each round accepts every still-alive pair that is min-seq on both
        its endpoints (two np.minimum.at scatters), kills conflicting
        pairs, repeats — no per-row Python even at the 5M-pair threshold.
        The explicit schema keeps both paths type-identical."""
        spark = pairs.sparkSession
        sel = pairs.select("id_1", "id_2", order_col)
        pdf = sel.toPandas()
        if len(pdf) == 0:
            return spark.createDataFrame([], sel.schema)
        kept = self._greedy_pandas(pdf, order_col, set(), set())
        return spark.createDataFrame(kept, schema=sel.schema)

    @staticmethod
    def _greedy_pandas(pdf, order_col: str, seen_a: set, seen_b: set):
        """Exact greedy over one pandas chunk, honoring (and updating)
        the seen-endpoint sets carried from earlier rank ranges."""
        import numpy as np

        if seen_a:
            pdf = pdf[~pdf["id_1"].isin(seen_a) & ~pdf["id_2"].isin(seen_b)]
        n = len(pdf)
        if n == 0:
            return pdf
        # total order: (seq, id_1, id_2) — seq ties (caller gave no strict
        # input order) are determinized identically to the distributed
        # wave prune's struct-min key, so every path agrees bit-for-bit
        pdf = pdf.sort_values(
            [order_col, "id_1", "id_2"], kind="stable"
        ).reset_index(drop=True)
        ia = pdf["id_1"].factorize()[0]
        ib = pdf["id_2"].factorize()[0]
        rank = np.arange(n, dtype=np.int64)
        na, nb = int(ia.max()) + 1, int(ib.max()) + 1
        alive = np.ones(n, dtype=bool)
        keep = np.zeros(n, dtype=bool)
        while alive.any():
            ma = np.full(na, n, dtype=np.int64)
            mb = np.full(nb, n, dtype=np.int64)
            np.minimum.at(ma, ia[alive], rank[alive])
            np.minimum.at(mb, ib[alive], rank[alive])
            win = alive & (rank == ma[ia]) & (rank == mb[ib])
            keep |= win
            dead_a = np.zeros(na, dtype=bool)
            dead_b = np.zeros(nb, dtype=bool)
            dead_a[ia[win]] = True
            dead_b[ib[win]] = True
            alive &= ~(dead_a[ia] | dead_b[ib])
        kept = pdf[keep]
        seen_a.update(kept["id_1"].tolist())
        seen_b.update(kept["id_2"].tolist())
        return kept

    def _wave_prune(self, alive: DataFrame, order_col: str):
        """Distributed exact-greedy prefix over one chunk: each wave
        accepts every alive pair that is min-(order,id_1,id_2) on BOTH
        endpoints (the wave-fixpoint step of the class docstring) and
        anti-joins out the pairs its endpoints kill. After any number of
        waves the accepted set is exactly the prefix sequential greedy
        would accept, and the unresolved tangle is a closed residual
        subproblem — finish it anywhere (here: the driver) with empty
        seen sets. Returns (tangle, accepted-or-None)."""
        kept: DataFrame | None = None
        key = F.struct(F.col(order_col), F.col("id_1"), F.col("id_2"))
        for _ in range(self.prewave_rounds):
            keyed = alive.withColumn("_k", key)
            ma = keyed.groupBy("id_1").agg(F.min("_k").alias("_ka"))
            mb = keyed.groupBy("id_2").agg(F.min("_k").alias("_kb"))
            wins = pin(
                keyed.join(ma, "id_1").join(mb, "id_2")
                .filter((F.col("_k") == F.col("_ka"))
                        & (F.col("_k") == F.col("_kb")))
                .select("id_1", "id_2", order_col),
                eager=True,
            )
            if wins.limit(1).count() == 0:
                break
            kept = wins if kept is None else pin(kept.union(wins), eager=True)
            # re-assert column order: a join moves its key to the FIRST
            # column, and every downstream createDataFrame(pandas, schema)
            # maps positionally — without this select the id_2-keyed
            # anti-join silently swaps id_1/id_2
            alive = pin(
                alive.join(wins.select("id_1"), "id_1", "left_anti")
                .join(wins.select("id_2"), "id_2", "left_anti")
                .select("id_1", "id_2", order_col),
                eager=True,
            )
        return alive, kept

    def compute(self, pairs: DataFrame, order_col: str = "seq") -> DataFrame:
        spark = pairs.sparkSession
        # localCheckpoint (lazy) before the size probe, like
        # ConnectedComponents.compute: count() executes a lazy caller's
        # upstream DAG and the chosen path would re-run it in full
        # (session-8 review fix)
        sel = pin(pairs.select("id_1", "id_2", order_col))
        n = sel.count()
        if self.driver_threshold and n <= self.driver_threshold:
            return self._compute_driver(sel, order_col)
        # Rank-range chunking (r3, replaces the wave loop): greedy's
        # acceptance of a pair depends only on pairs with SMALLER rank,
        # so the K globally-smallest remaining ranks form a closed
        # subproblem. Wave-prune the chunk distributedly, finish the
        # residual tangle exactly on the driver, prune the remainder
        # against the accepted endpoints (distributed anti-joins),
        # advance the rank bound. ceil(n/K) rounds, each one
        # quantile-probe + filter + waves + two anti-joins — no
        # O(block diameter) wavefront tail, no unbounded driver state
        # (accepted pairs accumulate as a checkpointed DataFrame union,
        # not a driver concat — ADVICE r3).
        K = self.driver_threshold or 5_000_000
        remaining = pin(sel, eager=True)
        n_rem = n
        kept_total: DataFrame | None = None
        while n_rem > 0:
            if n_rem <= K:
                chunk, chunk_n, bound = remaining, n_rem, None
            else:
                # approximate K-th smallest rank: one pass, no sort and
                # no TopK heap (an exact K-row TopK holds a K-row queue
                # PER TASK — measured pathological at K=5M). The sketch's
                # relativeError is a fraction of n_rem, so scale it to
                # the CHUNK: err = 0.01*K/n_rem keeps the guaranteed rank
                # window at K ± 1%·K however large the remainder is
                # (ADVICE r3 — at err=0.01 flat, 1e9 remaining pairs and
                # K=5e6 allowed a ~15M-row pull). <= bound keeps boundary
                # ties whole.
                frac = min(K / n_rem, 1.0)
                bound = remaining.approxQuantile(
                    order_col, [frac], max(1e-6, 0.01 * frac)
                )[0]
                chunk = remaining.filter(F.col(order_col) <= bound)
                chunk_n = chunk.count()
                # re-probe guard: if sketch error or tie mass still
                # overflowed the window, halve the target rank until the
                # realized chunk is back under 1.5K (a tie block bigger
                # than 1.5K is pulled whole — correctness needs it)
                while chunk_n > int(1.5 * K) and frac > 1e-9:
                    frac /= 2.0
                    b2 = remaining.approxQuantile(
                        order_col, [frac], max(1e-6, 0.01 * frac)
                    )[0]
                    c2 = remaining.filter(F.col(order_col) <= b2)
                    c2n = c2.count()
                    if c2n == 0:
                        break
                    bound, chunk, chunk_n = b2, c2, c2n
            wave_kept = None
            if (self.prewave_min_rows is not None
                    and chunk_n > self.prewave_min_rows
                    and self.prewave_rounds > 0):
                chunk, wave_kept = self._wave_prune(chunk, order_col)
            tangle_kept = self._greedy_pandas(
                chunk.toPandas(), order_col, set(), set()
            )
            accepted = wave_kept
            if len(tangle_kept):
                # positional column mapping — order must match sel.schema
                tangle_kept = tangle_kept[["id_1", "id_2", order_col]]
                tk = spark.createDataFrame(tangle_kept, schema=sel.schema)
                accepted = tk if accepted is None else accepted.union(tk)
            if accepted is not None:
                accepted = pin(accepted, eager=True)
                kept_total = (
                    accepted if kept_total is None
                    else pin(kept_total.union(accepted), eager=True)
                )
            if bound is None:
                break
            nxt = remaining.filter(F.col(order_col) > bound)
            if accepted is not None:
                # prune against THIS round's accepted endpoints only —
                # earlier rounds' endpoints were already anti-joined out.
                # Re-select after the joins: each join fronts its key
                # column, and later pandas round-trips map positionally.
                nxt = nxt.join(
                    accepted.select("id_1"), "id_1", "left_anti"
                ).join(
                    accepted.select("id_2"), "id_2", "left_anti"
                ).select("id_1", "id_2", order_col)
            remaining = pin(nxt, eager=True)
            n_rem = remaining.count()
        if kept_total is None:
            return spark.createDataFrame([], sel.schema)
        return kept_total


class ConnectedComponents:
    """Cluster assignment via iterative min-label propagation.

    Reference returns a list of per-component edge MultiIndexes
    (recordlinkage/network.py:151-197) — a shape that cannot scale; the
    equivalent contract is "same partition of ids", emitted as
    ``(id, cluster_id = min id in component)``.

    Algorithm: alternating min-label propagation (the DataFrame-friendly
    variant of large-star/small-star, Kiveris et al. 2014): each iteration
    joins labels to edges, takes the min neighbor label per node, converges
    when no label changes. O(log n) iterations on real dedup graphs
    (components are near-cliques, diameter ~2-3). Per-iteration
    ``localCheckpoint`` truncates lineage; at cluster scale swap for an
    Iceberg/parquet checkpoint (pipeline.py does).
    """

    def __init__(self, max_iter: int = 50, driver_threshold: int = 5_000_000):
        self.max_iter = max_iter
        # Graphs at or below this edge count are solved on the driver with a
        # vectorized numpy min-label propagation instead of the Spark loop:
        # each loop iteration costs 3-4 scheduled jobs (join, agg, checkpoint,
        # convergence count) of pure fixed overhead when the edge list is
        # tiny, while 5M edges collect to ~80 MB and solve in <1s. At
        # 10^12-doc scale the edge list is far larger and the distributed
        # loop runs. Set to 0 to force the loop.
        self.driver_threshold = driver_threshold

    def compute(self, pairs: DataFrame, checkpoint=None,
                input_pinned: bool = False) -> DataFrame:
        """pairs(id_1,id_2) -> (id, cluster_id). Singletons not in any pair
        are not emitted (join the records table to give them their own id).

        ``input_pinned``: callers whose edge frame is ALREADY materialized
        (e.g. a pipeline stage table) skip the defensive lineage pin below
        — one less localCheckpoint materialization per compute."""
        if self.driver_threshold:
            # localCheckpoint (lazy) BEFORE the size probe: the probe
            # executes the caller's upstream DAG, and without a
            # materialization the chosen path (driver solve or the
            # distributed edge build) would re-execute it — for a lazy
            # caller like semantic_dedup that is the whole edge-expansion
            # kernel twice, plus doubled dropped-cluster accumulators
            # (session-8 review fix). Pipeline callers pass materialized
            # stages and are unaffected.
            #
            # The probe is a BOUNDED collect (limit threshold+1), not a
            # count() followed by a separate toPandas(): the driver path
            # needs the edge list on the driver anyway, so probing with
            # the collect itself saves one full job per compute() — and
            # the transfer stays capped at threshold+1 rows (~80 MB of
            # id pairs at the 5M default) even when the graph is huge,
            # in which case the collected prefix is discarded and the
            # distributed loop runs as before.
            if not input_pinned:
                pairs = pin(pairs)
            pdf = (
                pairs.select("id_1", "id_2")
                .limit(self.driver_threshold + 1)
                .toPandas()
            )
            if len(pdf) <= self.driver_threshold:
                return self._compute_driver(pairs, pdf)
        checkpoint = checkpoint or (lambda d: pin(d, eager=True))
        # symmetric edge list (both directions) — label flows both ways
        edges = pairs.select(
            F.col("id_1").alias("src"), F.col("id_2").alias("dst")
        ).union(
            pairs.select(F.col("id_2").alias("src"), F.col("id_1").alias("dst"))
        ).distinct()
        edges = checkpoint(edges)
        labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
            "cluster_id", F.col("id")
        )
        labels = checkpoint(labels)
        converged = False
        for _ in range(self.max_iter):
            # candidate label for each node: min over neighbors' labels
            neighbor_min = (
                edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("cluster_id").alias("nbr_min"))
                .withColumnRenamed("src", "id")
            )
            propagated = labels.join(neighbor_min, "id", "left").select(
                "id",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("cluster_id"),
            )
            # pointer jumping: follow the label chain one hop per iteration
            # (label <- label-of-label), so label distance to the component
            # min shrinks geometrically — O(log diameter) rounds instead of
            # the O(diameter) of plain propagation. Labels are always ids
            # of nodes in the same component, so the self-join always hits.
            ptr = propagated.select(
                F.col("id").alias("cluster_id"), F.col("cluster_id").alias("_jump")
            )
            new_labels = propagated.join(ptr, "cluster_id").select(
                "id",
                "_old",
                F.least(F.col("cluster_id"), F.col("_jump")).alias("cluster_id"),
            )
            new_labels = checkpoint(new_labels)
            changed = (
                new_labels.filter(F.col("cluster_id") != F.col("_old"))
                .limit(1)
                .count()
            )
            labels = new_labels.drop("_old")
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"ConnectedComponents did not converge in {self.max_iter} "
                "iterations — raise max_iter (rounds grow ~log(diameter) "
                "with pointer jumping; this graph is pathological)"
            )
        return labels

    def _compute_driver(self, pairs: DataFrame, pdf=None) -> DataFrame:
        """Driver-side solve for small graphs: vectorized min-label
        propagation with pointer jumping (same algorithm as the loop,
        collapsed to numpy scatter-mins). Bit-equivalent output:
        (id, cluster_id = min id in component). ``pdf`` lets compute()
        hand over the edge frame its size probe already collected."""
        import numpy as np
        import pandas as pd

        spark = pairs.sparkSession
        if pdf is None:
            pdf = pairs.select("id_1", "id_2").toPandas()
        id_field = pairs.schema["id_1"].dataType
        if len(pdf) == 0:
            return spark.createDataFrame(
                [], schema=f"id {id_field.simpleString()}, cluster_id {id_field.simpleString()}"
            )
        # rank-encode ids so "min label" == "min original id"
        uniq = np.unique(
            np.concatenate([pdf["id_1"].to_numpy(), pdf["id_2"].to_numpy()])
        )
        s = np.searchsorted(uniq, pdf["id_1"].to_numpy())
        d = np.searchsorted(uniq, pdf["id_2"].to_numpy())
        src = np.concatenate([s, d])
        dst = np.concatenate([d, s])
        lab = np.arange(len(uniq), dtype=np.int64)
        converged = False
        for _ in range(self.max_iter):
            new = lab.copy()
            np.minimum.at(new, src, lab[dst])   # min over neighbor labels
            new = np.minimum(new, new[new])     # pointer jump
            while True:                         # full path compression
                nn = new[new]
                if (nn == new).all():
                    break
                new = nn
            if (new == lab).all():
                converged = True
                break
            lab = new
        if not converged:
            # same failure contract as the distributed loop (which
            # raises): silently returning a partial labeling would split
            # one component across cluster_ids (session-8 review fix)
            raise RuntimeError(
                f"connected components did not converge in "
                f"{self.max_iter} iterations"
            )
        out = pd.DataFrame({"id": uniq, "cluster_id": uniq[lab]})
        return spark.createDataFrame(out)


def select_representatives(
    clusters: DataFrame,
    attrs: DataFrame,
    id_col: str,
    cluster_col: str = "cluster_id",
    order_cols: list | None = None,
) -> DataFrame:
    """Pick ONE surviving document per duplicate cluster by an explicit
    keep policy instead of min-id: training pipelines keep the best copy
    (highest quality score, earliest crawl, longest text), not the
    lexicographically smallest url.

    ``order_cols`` is a list of Columns (e.g. ``[F.desc("quality"),
    F.asc("warc_ts")]``); ``(cluster_col, id_col ascending)`` is always
    appended as the final tiebreak so selection is total and
    deterministic. Docs absent from ``clusters`` (singletons never paired)
    are kept as their own representative.

    Returns ``attrs``' rows plus (cluster_col, is_representative).

    Scale: the row_number window runs over the CLUSTERED rows only — the
    inner join against ``clusters`` restricts the attrs side to docs that
    appear in some duplicate cluster (typically a small fraction of the
    corpus), so the full corpus never enters the window shuffle; the
    singletons rejoin via a left-anti join (AQE broadcasts the cluster ids
    when they fit) as their own trivially-kept representative. Window skew
    equals cluster skew, which upstream cluster caps already bound.
    """
    from pyspark.sql import Window

    order = list(order_cols or []) + [F.asc(id_col)]
    clustered = attrs.join(
        clusters.select(F.col(id_col), F.col(cluster_col)), id_col, "inner"
    )
    w = Window.partitionBy(cluster_col).orderBy(*order)
    ranked = clustered.withColumn(
        "is_representative", F.row_number().over(w) == 1
    )
    singletons = (
        attrs.join(clusters.select(id_col), id_col, "left_anti")
        .withColumn(cluster_col, F.col(id_col))
        .withColumn("is_representative", F.lit(True))
    )
    return ranked.unionByName(singletons)
