"""Distributed connected components over near-duplicate pair graphs.

The dedup operators (MinHash/SimHash/embedding) emit verified PAIRS; an
actual dedup decision needs the duplicate CLUSTER: connected components
over the pair graph, keep one representative per component. This is the
iterative-algorithm leg of the engine (no reference analog — the reference
dedups nothing).

Algorithm: hash-min label propagation. Every node starts labeled with its
own id; each round a node takes the min of its label and its neighbors'
labels; stop when no label changes. Rounds = graph diameter. That is the
right choice for THIS workload: near-dup components are overwhelmingly
small cliques, and oversized boilerplate buckets arrive STAR-SHAPED from
operators/skew.py (diameter ≤ 2), so propagation converges in 2–3 rounds
regardless of corpus size.

For GENERAL graphs with long chains, `algorithm="star"` switches to the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", 2014): each round halves chain
lengths, so convergence is O(log n) rounds independent of diameter —
the property-tested scale path when the input is not star-guarded.

Scale shape per round: one shuffle join (edges ⋈ labels on dst) + one hash
agg (min per src) + one join back — all on node-id keys. `localCheckpoint`
every round truncates the growing lineage so round N's plan does not
re-execute rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: for every node u, connect each strictly-larger
    neighbor to min(Γ(u) ∪ {u}). Input/output: undirected edge list."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("m"))
        .withColumn("m", F.least("m", "src"))
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges large→small; for every node u,
    connect u and all its smaller neighbors to the minimum of them."""
    o = (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    m = o.groupBy("src").agg(F.min("dst").alias("m"))
    nbrs = (
        o.join(m, "src")
        .filter(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    centers = m.select("src", F.col("m").alias("dst"))
    return nbrs.unionByName(centers).filter(
        F.col("src") != F.col("dst")
    ).distinct()


def _star_components(edges: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large/small-star to a fixed point: the edge set becomes
    a forest of stars (node → component min). O(log n) rounds."""
    e = edges.localCheckpoint(eager=True)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixed-point check in ONE action (r3 verdict #6 — was count() +
        # exceptAll().count(), two jobs/round): both frames are distinct
        # edge sets, so equality ⟺ empty symmetric difference, computed
        # as two anti-joins unioned under a limit(1)
        sym_diff = e2.join(e, ["src", "dst"], "left_anti").unionByName(
            e.join(e2, ["src", "dst"], "left_anti")
        )
        same = sym_diff.limit(1).count() == 0
        e = e2
        if same:
            roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
                "component", F.col("node")
            )
            return (
                e.select(F.col("src").alias("node"),
                         F.col("dst").alias("component"))
                .unionByName(roots)
                .distinct()
            )
    raise RuntimeError(
        f"star connected components did not converge in {max_iter} rounds"
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "hash_min",
    materialize_input: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; component =
    min node id of the connected component. Converges early when a round
    changes nothing; raises if max_iter rounds were not enough.

    `algorithm`: "hash_min" (default — rounds = diameter; right for the
    star-guarded near-dup graphs) or "star" (large-star/small-star,
    O(log n) rounds; use for general graphs with long chains).

    EAGERNESS: connected_components is an inherently EAGER operator — the
    fixed-point loop must run Spark actions at call time to decide
    convergence, so calling it executes the full upstream lineage
    regardless of flags (unlike the dedup candidate generators, which are
    plan-only until an action). `materialize_input=False` does NOT make
    construction lazy (r4 review #3), and it is a PESSIMIZATION when the
    result is consumed: the input projection is referenced 2–3 times
    (edge union / nodes union), so an expensive unmaterialized lineage
    re-executes per reference (r4 review pass 2, #1). Use False only to
    inspect how the frame is BUILT."""
    from .skew import materialize

    # one materialization of the (src, dst) projection: both algorithms
    # reference it multiply (edges union + nodes scan + anti-join), and
    # `pairs` may carry an expensive unmaterialized LSH/verify lineage
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if materialize_input:
        e = materialize(e)
    if algorithm == "star":
        labeled = _star_components(
            e.filter(F.col("src") != F.col("dst")).distinct(), max_iter
        )
        # nodes whose ONLY appearance is a self-pair were dropped with the
        # self-loop filter; restore them as their own singleton component
        # (contract: every node appearing in `pairs` — r3 review #2)
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        singletons = nodes.join(
            labeled.select("node"), "node", "left_anti"
        ).withColumn("component", F.col("node"))
        return labeled.unionByName(singletons)
    if algorithm != "hash_min":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node"), F.col("label").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "graph diameter exceeds max_iter (raise it, or pre-star the input)"
    )


def near_dedup_keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    materialize_input: bool = True,
) -> DataFrame:
    """Dedup decision from verified near-dup pairs: every doc in a
    component except its min-id representative is dropped."""
    cc = connected_components(pairs, materialize_input=materialize_input)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def full_near_dedup_keep_first(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    materialize_frames: bool = True,
) -> DataFrame:
    """The production dedup composition: EXACT-collapse first, then the
    MinHash near-dup path over distinct texts only.

    Web corpora are dominated by byte-identical duplicates; running the
    shingle/signature/verify machinery on every copy is pure waste. Here:

    1. one hash aggregation groups identical texts; the min-id doc is the
       text-group representative;
    2. MinHash → band buckets → Jaccard verify → connected components run
       on the REPRESENTATIVES only;
    3. dropped = exact losers (non-rep copies) ∪ near losers (non-rep
       cluster members among representatives).

    Same keep-set as running near-dedup over all docs with min-id
    keep-first (pinned by tests: full==direct on a fuzzed dup corpus):
    every doc's cluster contains its text-group rep (which holds the
    group-min id), so the cluster minimum over reps equals the cluster
    minimum over all docs. Two documented boundaries of that equality:

    - NULL texts are excluded from the collapse (md5(NULL) would group
      them; the direct path keeps every NULL-text doc, so must we);
    - when exact copies inflate a direct-path band bucket past
      `max_bucket`, the direct path star-caps (drops some member↔member
      candidates) while the reps-only path stays under the cap — the
      keep-sets may then differ, and the composition's answer is the
      HIGHER-RECALL one (capping fires less on collapsed input).

    MEASURED trade (BENCH/dedup_scale.json; both keep-sets verified
    identical by symmetric difference = 0): scale- and corpus-dependent.
    At 200k docs / 25% exact dups the composition WINS (11.2 s vs 19.3 s
    direct); at 1M docs the direct path won in every run, though its own
    wall time varied 50–145 s across runs on this VM — the rep semi-join
    shuffles the full text column, and whether that beats the saved
    signature work depends on dup rate, doc size and near-dup config.
    Numbers, not intuition: the harness re-measures both every run."""
    from .dedup import jaccard_verify, minhash_lsh_candidates
    from .skew import materialize

    # (id, md5) is narrow — materialized so the text scan + hash run once
    # across the rep groupBy, the losers join and the semi-join (each
    # frame below is referenced twice). materialize_frames=False removes
    # the candidate-generation checkpoint jobs, but the composition still
    # executes eagerly overall: the CC fixed-point loop below runs actions
    # at call time (see connected_components EAGERNESS note, r4 review #3)
    h = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_h")
    )
    if materialize_frames:
        h = materialize(h)
    rep = h.groupBy("_h").agg(F.min("_id").alias("_rep_id"))
    if materialize_frames:
        rep = materialize(rep)
    exact_losers = (
        h.join(rep, "_h")
        .filter(F.col("_id") != F.col("_rep_id"))
        .select(F.col("_id").alias(id_col))
    )
    reps_df = df.join(
        rep.select(F.col("_rep_id").alias(id_col)), id_col, "left_semi"
    )
    cand = minhash_lsh_candidates(reps_df, id_col, text_col, k=k,
                                  n_hashes=n_hashes, bands=bands,
                                  materialize_frames=materialize_frames)
    pairs = jaccard_verify(cand, reps_df, id_col, text_col, k=k,
                           threshold=threshold,
                           materialize_frames=materialize_frames)
    cc = connected_components(pairs, materialize_input=materialize_frames)
    near_losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    losers = exact_losers.unionByName(near_losers)
    return df.join(losers, id_col, "left_anti")
