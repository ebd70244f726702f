"""Duplicate-cluster resolution: candidate pairs → connected components
→ canonical-document election.

Pair generators (``dedup.py``, ``similarity.py``) emit *edges*; an
actual corpus-dedup pipeline must then partition the duplicate graph
into clusters and keep one canonical document per cluster (the
reference's dedup surface stops at pair SQL for the same reason ours
stops at pairs — clustering is the engine-side step a warehouse cannot
express; cf. ``modeling_tables/business_layer/*.sql`` which always
reduce through GROUP BY, never through a transitive closure).

Algorithm: iterative min-label propagation (each node adopts the
smallest label among itself and its neighbors until fixpoint), the
standard BSP formulation of connected components. Each round is one
shuffle (join edges↔labels + groupBy min) — all built-in DataFrame
ops, whole-stage codegen, no UDFs.

Scale posture (100 TB):

- Rounds = graph diameter. Duplicate graphs are star-shaped
  (copies cluster around an original), so diameter is 2-4 and the
  loop converges in ≤ a handful of rounds; for adversarial long-chain
  graphs the upgrade path is alternating large-star/small-star
  contraction (Kiveris et al., "Connected Components in MapReduce and
  Beyond") which converges in O(log n) rounds with the same
  join+min building blocks.
- Lineage is truncated each round with ``localCheckpoint`` —
  an iterative join would otherwise compound the plan and
  re-evaluate every prior round at each action.
- Convergence is detected by the per-round sum of labels: labels
  only ever decrease, so an unchanged sum IS the fixpoint — one
  cheap aggregate per round, no extra join against the previous
  labels.
- ``max_iter`` is a hard bound that RAISES on non-convergence
  (no silent caps — a truncated component map is corrupt output).

Oracle: the same component map computed by DuckDB with a recursive
CTE (transitive closure → MIN(reachable label)), composed on top of
the verbatim MinHash pair CTEs from ``dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipeline_gcp_spark.functions import dedup
from datapipeline_gcp_spark.schemas import load_testdata

#: LSH pairs at or above this signature-match fraction become edges of
#: the duplicate graph (0.5 ≈ Jaccard 0.5 — conservative near-dup).
EDGE_THRESHOLD = 0.5


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Component label (the minimum reachable node id) for every node
    that appears in ``edges``. Returns (node, component).

    Runs eagerly (it is an iterative fixpoint, each round is a Spark
    job); the returned frame is a localCheckpoint — small (two longs
    per noded-in-a-duplicate-pair), already materialized.

    Min-label propagation converges in diameter rounds — 2-4 on the
    star-shaped duplicate graphs this engine clusters, which is why it
    is the default. A graph that does NOT converge within ``max_iter``
    rounds (a long chain — adversarial here, but routine in other graph
    domains) hands off to :func:`connected_components_star`, the
    O(log n)-round contraction algorithm, instead of raising (VERDICT
    r7 #6; property-tested on a path graph ≫ ``max_iter`` long in
    ``tests/test_properties.py``). The handoff restarts from the edge
    list — correct because both algorithms compute the same min-label
    fixpoint, and the label-prop rounds already spent are wasted only
    on the rare high-diameter input.
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
        # Partition the EDGE table by the per-round join key ONCE (guide
        # §2.4: two operations keyed the same way share one exchange).
        # Every round joins sym on ``nbr``; without this the distinct's
        # (node, nbr) partitioning forces a re-exchange of the edge list
        # per round — the one table that is fact-scale at 100 TB. The
        # checkpoint preserves the partitioning, so each round exchanges
        # only the (node-scale) label table.
        .repartition("nbr")
        # lazy: the seed-sum aggregate below materializes sym and labels
        # in one cascade instead of two eager checkpoint jobs
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select("node")
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        lab = labels.select(F.col("node").alias("lnode"), "label")
        # One aggregation per round instead of groupBy-min + left-join
        # (guide §2.4): min(own label ∪ neighbor labels) expressed as a
        # union into a single min-agg — same fixpoint values, one join
        # and one shuffle fewer per round.
        labels = (
            sym.join(lab, sym.nbr == lab.lnode)
            .select("node", "label")
            .unionAll(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # lazy: the convergence sum below materializes the cache —
            # one job per round instead of two
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = new_sum
    # diameter > max_iter: a long-chain graph. Contraction converges in
    # O(log n) rounds regardless of diameter — fall back rather than
    # raise (a truncated component map would be corrupt output, and a
    # hard error on a valid graph is a scale bug of its own).
    return connected_components_star(edges, src, dst)


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014): converges in O(log n) rounds on ANY graph —
    the high-diameter complement to :func:`connected_components`'s
    O(diameter) label propagation. Returns (node, component) with
    component = the minimum reachable node id, identical to label
    propagation's fixpoint.

    Each round is two grouped aggregations and two joins over the edge
    list — all built-in ops, no UDFs; the edge list SHRINKS toward a
    star forest (every node → its component minimum), so rounds get
    cheaper as they proceed. Convergence = the directed edge multiset
    is unchanged (checked via count + an order-insensitive xxhash64
    sum — one cheap aggregate, same idiom as label-prop's label sum;
    ``max_iter`` still bounds the loop and raises, but at O(log n)
    rounds 50 covers graphs beyond any physical corpus size).
    """
    # canonical direction (big, small): both star steps emit (node, min)
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # lazy: the seed fingerprint below materializes e; all_nodes
        # (used only for the final left join) materializes off e's cache
        # when the result is assembled — two eager jobs saved
        .localCheckpoint(eager=False)
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _fingerprint(df: DataFrame) -> tuple[int, int]:
        # decimal-space sum: a long sum of 64-bit hashes overflows
        # (which THROWS under ANSI); decimal(38,0) cannot overflow
        # before ~10^19 rows
        row = df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    def _large_star(df: DataFrame) -> DataFrame:
        # per node x over symmetric neighborhood: attach every STRICTLY
        # LARGER neighbor to m = min(Γ(x) ∪ {x})
        sym = df.select("u", "v").unionAll(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # edges already point big→small: group by the big endpoint,
        # attach every (small) neighbor AND the node itself to the min
        m = df.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = df.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        selfs = m.select(F.col("u"), F.col("m").alias("v"))
        return (
            nbrs.unionAll(selfs)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    fp = _fingerprint(e)
    for _ in range(max_iter):
        # LAZY checkpoint: the fingerprint aggregate right below is the
        # materializing action, so each round runs ONE job instead of a
        # checkpoint job + a fingerprint job (the loop is fixed-cost
        # dominated — ~2 aggregations over a shrinking edge list — and
        # the round count is O(log n), so job count is the wall clock).
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_fp = _fingerprint(e)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — this exceeds O(log n) for any physical graph and "
            "indicates a bug, not a data property"
        )
    # fixpoint: e is a star forest (node → component min). Centers have
    # no outgoing edge — they are their own component.
    comp = e.groupBy("u").agg(F.min("v").alias("component"))
    return (
        all_nodes.join(comp, all_nodes.node == comp.u, "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )


def cluster_summary(components: DataFrame) -> DataFrame:
    """Per-node cluster roll-up: (doc_id, component, cluster_size,
    keep_flag) — keep_flag marks the elected canonical document (the
    minimum doc_id, i.e. the component label itself)."""
    w = Window.partitionBy("component")
    return components.select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("node") == F.col("component")).cast("long").alias("keep_flag"),
    )


# ---------------------------------------------------------------------------
# Registered query + oracle
# ---------------------------------------------------------------------------


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs ≥ EDGE_THRESHOLD → connected components →
    canonical election, over the shared near-dup fixture."""
    sigs = dedup.minhash_signatures(dedup.neardup_fixture(spark, sf_dir))
    edges = dedup.lsh_candidate_pairs(sigs).filter(
        F.col("sig_match_frac") >= EDGE_THRESHOLD
    )
    return cluster_summary(connected_components(edges))


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {dedup.MINHASH_PAIR_CTES},
edges AS (
  SELECT doc_a, doc_b FROM scored WHERE sig_match_frac >= {EDGE_THRESHOLD}
),
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM edges
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, node FROM sym
  UNION
  SELECT s.nbr, reach.r FROM reach JOIN sym s ON s.node = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT
  CAST(node AS BIGINT) AS doc_id,
  CAST(component AS BIGINT) AS component,
  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
  CAST(CASE WHEN node = component THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM comp
"""

# ---------------------------------------------------------------------------
# Incremental connected components (daily-ingest clustering)
# ---------------------------------------------------------------------------


def incremental_components(
    components: DataFrame, new_edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Merge a NEW batch of duplicate edges into a PERSISTED component
    map without re-running CC over the historical edge list — the
    clustering twin of :func:`dedup.incremental_neardup_pairs`
    (VERDICT r5 #6a). Returns the updated (node, component) map.

    The persisted map is the old graph contracted to STARS (every node
    → its component label, which is the component's minimum node id).
    Star contraction preserves both connectivity and the min id, so
    ``CC(stars ∪ new_edges) == CC(old_edges ∪ new_edges)`` — but the
    input is O(previously-clustered nodes + batch edges), never the
    accumulated edge history. At 100 TB/day that is the difference
    between clustering a day and re-clustering the corpus: yesterday's
    map is a compact two-long-column table, today's edges are
    batch-scale, and a new edge that bridges two old components merges
    them through exactly the same min-label propagation (the smaller
    label flows across the bridge and down the other star).

    ``components`` is (node, component) — in production the persisted
    table written after yesterday's run; ``new_edges`` is (doc_a,
    doc_b) from the batch probes (new↔corpus and new↔new pairs)."""
    stars = components.select(
        F.col("node").alias("doc_a"), F.col("component").alias("doc_b")
    )
    return connected_components(
        stars.unionAll(new_edges.select("doc_a", "doc_b")), max_iter=max_iter
    )


#: every id the incremental batch plants is ≥ this; the near-dup corpus
#: (docs ∪ +500k exact ∪ +1M near) stays below it — the id range IS the
#: old/new partition, so one pair pass serves both edge sets
_NEW_ID_FLOOR = 2_000_000


#: (applicationId, plan-fingerprint) pairs whose id-floor check already
#: ran — the max() is a single-column scan (Spark does not serve plain
#: aggregates from parquet min/max stats by default; ADVICE r7), so
#: repeat invocations in one session skip it rather than re-scan inside
#: benched timing. Same write-once-per-session pattern as the DPP layer.
_ID_FLOOR_CHECKED: set[tuple[str, str]] = set()


def assert_below_id_floor(docs: DataFrame) -> None:
    """The +500k/+1M corpus planting and the +2M/+3M/+4M batch planting
    assume base ``doc_id`` stays a full corpus-planting span below
    ``_NEW_ID_FLOOR`` (ADVICE r6: the shipped testdata tops out at
    doc_id 4999, but a larger fixture must fail LOUDLY here instead of
    silently misclassifying edges into the wrong old/new set). One
    max-aggregate over a single pruned column — a column SCAN, not a
    stats read, so the verdict is cached per (session, source plan) and
    only the first invocation pays it.

    Cache-key caveat (ADVICE r8, accepted for the bench protocol): the
    plan string does not fingerprint the DATA, so overwriting the
    parquet at the same path with larger doc_ids within one session
    would skip the guard. The driver/bench protocol never rewrites
    fixtures mid-session; a deployment that does should key on a data
    fingerprint (file mtimes / snapshot id) instead."""
    key = (docs.sparkSession.sparkContext.applicationId, docs._jdf.queryExecution().logical().toString())
    if key in _ID_FLOOR_CHECKED:
        return
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0][0] or 0
    if max_id + 1_000_000 >= _NEW_ID_FLOOR:
        raise AssertionError(
            f"documents doc_id max {max_id} leaves the +1M corpus "
            f"planting at or above the {_NEW_ID_FLOOR} id floor — the "
            "old/new edge split would misclassify; raise the floor and "
            "the planted offsets together"
        )
    _ID_FLOOR_CHECKED.add(key)


def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest clustering composed end to end: yesterday's
    component map (here derived from the near-dup corpus so the query
    is self-contained; in production read from the persisted table) +
    today's batch edges (new↔corpus LSH probes and new↔new pairs at
    the same threshold) → :func:`incremental_components` → canonical
    election. The DuckDB oracle computes CC over the FULL edge set
    (old ∪ cross ∪ within-batch) with a recursive CTE — matching it
    proves the star-contraction shortcut loses nothing.

    Signatures and LSH pairs are computed in ONE pass over the union
    corpus and split into old/batch edge sets by the fixture's id
    ranges (checkpointed — the pair list feeds two CC fixpoints). In
    production the split is free: old pairs aren't recomputed at all
    (their contraction is the persisted map) and the batch pass is
    :func:`dedup.probe_lsh_index` + a within-batch self-pair — this
    query pays the corpus side only to DERIVE yesterday's map."""
    assert_below_id_floor(
        load_testdata(spark, sf_dir, ("documents",))["documents"]
    )
    existing = dedup.neardup_fixture(spark, sf_dir)
    new = _incremental_batch(spark, sf_dir)
    pairs = (
        dedup.lsh_candidate_pairs(
            dedup.minhash_signatures(existing.unionByName(new))
        )
        .filter(F.col("sig_match_frac") >= EDGE_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    # doc_a < doc_b and batch ids sit above the corpus range, so a pair
    # touches the batch iff doc_b does
    old_edges = pairs.filter(F.col("doc_b") < _NEW_ID_FLOOR)
    new_edges = pairs.filter(F.col("doc_b") >= _NEW_ID_FLOOR)
    comp_old = connected_components(old_edges)
    merged = incremental_components(comp_old, new_edges)
    return cluster_summary(merged)


def _incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Today's batch against the near-dup corpus: near copies (``%5``,
    suffixed — also near-match the corpus's planted copies of the same
    doc), exact copies (``%13``), and fresh novel docs (``%11=3``) that
    must stay isolated (they enter no component). Same planting scheme
    as ``dedup.incremental_fixture`` so the oracle CTEs compose."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    near = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn(
            "text", F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(" " + dedup._NEAR_SUFFIX))
        )
    )
    exact = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + 3_000_000
    )
    fresh = docs.filter(F.col("doc_id") % 11 == 3).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        F.concat(
            F.lit(dedup._FRESH_PREFIX),
            F.col("doc_id").cast("string"),
            F.lit(dedup._FRESH_SUFFIX),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return (
        near.unionAll(exact)
        .unionAll(fresh)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )


_NEWB_SQL = f"""
  SELECT doc_id + 2000000 AS doc_id, concat(text, ' {dedup._NEAR_SUFFIX}') AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 13 = 0
  UNION ALL
  SELECT doc_id + 4000000,
         concat('{dedup._FRESH_PREFIX}', CAST(doc_id AS VARCHAR),
                '{dedup._FRESH_SUFFIX}')
  FROM documents WHERE doc_id % 11 = 3
"""

# Full-graph CC over old ∪ cross ∪ within-batch pairs — the recursive
# ground truth the star-contraction shortcut must reproduce. Reuses the
# verbatim MinHash pair CTEs (``exploded``/``scored`` are the corpus
# side) plus the new batch's banding, mirroring _INCREMENTAL_ORACLE.
_CLUSTERS_INCR_ORACLE = f"""
WITH RECURSIVE {dedup.MINHASH_PAIR_CTES},
newb AS ({_NEWB_SQL}),
shn AS (SELECT doc_id, {dedup._D_SHINGLES} AS sh FROM newb),
sign AS (SELECT doc_id, {dedup._D_MINHASH} AS minhash FROM shn),
xn AS (
  SELECT doc_id, minhash, u.band AS band_idx,
         array_to_string(minhash[u.band*{dedup.ROWS}+1 : u.band*{dedup.ROWS}+{dedup.ROWS}], ',')
           AS band_key
  FROM sign, (SELECT unnest(generate_series(0, {dedup.BANDS - 1})) AS band) u
),
cross_scored AS (
  SELECT DISTINCT n.doc_id AS doc_a, e.doc_id AS doc_b,
    list_sum(list_transform(generate_series(1, {dedup.NUM_HASHES}),
      i -> CASE WHEN n.minhash[i] = e.minhash[i] THEN 1 ELSE 0 END))
      / {float(dedup.NUM_HASHES)} AS sig_match_frac
  FROM xn n JOIN exploded e
    ON n.band_idx = e.band_idx AND n.band_key = e.band_key
),
within_scored AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    list_sum(list_transform(generate_series(1, {dedup.NUM_HASHES}),
      i -> CASE WHEN a.minhash[i] = b.minhash[i] THEN 1 ELSE 0 END))
      / {float(dedup.NUM_HASHES)} AS sig_match_frac
  FROM xn a JOIN xn b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a, doc_b FROM scored WHERE sig_match_frac >= {EDGE_THRESHOLD}
  UNION
  SELECT doc_a, doc_b FROM cross_scored WHERE sig_match_frac >= {EDGE_THRESHOLD}
  UNION
  SELECT doc_a, doc_b FROM within_scored WHERE sig_match_frac >= {EDGE_THRESHOLD}
),
sym AS (
  SELECT doc_a AS node, doc_b AS nbr FROM edges
  UNION
  SELECT doc_b AS node, doc_a AS nbr FROM edges
),
reach(node, r) AS (
  SELECT node, node FROM sym
  UNION
  SELECT s.nbr, reach.r FROM reach JOIN sym s ON s.node = reach.node
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT
  CAST(node AS BIGINT) AS doc_id,
  CAST(component AS BIGINT) AS component,
  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
  CAST(CASE WHEN node = component THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
FROM comp
"""


# ---------------------------------------------------------------------------
# PageRank (fixed-point, cross-engine deterministic)
# ---------------------------------------------------------------------------

PR_ITERS = 3
PR_DAMPING = 0.85
PR_SCALE = 1e12
PR_TOPK = 50


def pagerank(
    edges: DataFrame,
    n_nodes: int | None = None,
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
    assume_no_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (src, dst) —
    the standard BSP formulation: each round joins ranks to edges,
    splits rank over out-degree, and sums contributions per target.
    Every shuffle keys on the node id, so rounds reuse one hash
    partitioning; no collect, no UDFs, pure built-in ops.

    Determinism across engines (the bit that makes this oracle-checkable
    when DuckDB sums doubles in arbitrary order): per-edge contributions
    are FLOOR-quantized to integer fixed-point (×10^12) and summed as
    BIGINT — an exact, order-free reduction — then the damped update is
    a fixed sequence of individually correctly-rounded IEEE ops on
    identical operands. floor (not round) because both engines define
    floor identically, with no tie-breaking rule in play.

    ``n_nodes`` is a driver-side scalar (one COUNT job — metadata-scale
    even at 100 TB, same policy as the asof fixture split).

    General directed graphs are handled correctly (ADVICE r2): the node
    universe is the union of ``src`` and ``dst`` (pure sinks count
    toward ``n_nodes`` and receive rank), and dangling mass — rank held
    by nodes with no out-edges — is redistributed uniformly each round
    via one quantized scalar aggregate (broadcast, no extra shuffle of
    the rank table). Graphs with no dangling nodes (e.g. bidirectional
    edge lists) detect that once, structurally, and skip the term — the
    plan is then identical to the dangling-free formulation, keeping the
    registered ``graph_pagerank`` oracle bit-identical.

    The graph structure is materialized with ``localCheckpoint`` before
    the loop — every iteration reads it, and without the checkpoint each
    round re-executes the whole upstream edge-derivation pipeline
    (measured 37 s → 9 s at sf0.1 for a 3-iteration run; same
    lineage-truncation policy as ``connected_components``). The
    loop-invariant ``edges ⋈ outdeg`` join is hoisted out of the loop
    and checkpointed as ``edges_deg`` (one fact-scale join total instead
    of one per iteration), and in the ``assume_no_dangling`` case the
    node list is read straight off ``outdeg`` (its srcs are the node
    set, already distinct) instead of a union+distinct over the edge
    list (measured 8.9 s → 6.0 s solo at sf0.1).

    r14: the seed checkpoints are LAZY (``eager=False``, the r13 CC
    pattern — the ``n_nodes`` count materializes the
    edges→outdeg→nodes cascade in one job instead of separate eager
    checkpoint jobs), and ``edges_deg`` is built over the CHECKPOINTED
    ``outdeg`` — previously the out-degree aggregation executed twice
    (once inside edges_deg's eager checkpoint, once for outdeg's own).
    A cached (``persist``) loop that preserved hash partitioning into
    the iterations was A/B-REJECTED: it removes three per-iteration
    exchanges from the plan (localCheckpoint scans back with
    UnknownPartitioning on this build) but the InMemoryRelation
    build/read overhead cost more than the 18 MB exchanges it saved
    (old min 6.86 s vs cached 8.48 s at sf0.1, slower in 4/4
    interleaved pairs)."""
    edges = edges.localCheckpoint(eager=False)
    outdeg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    # The per-edge (src, dst, outdeg) triple is loop-invariant — join it
    # ONCE here instead of once per iteration (hoisting a fact-scale join
    # out of the BSP loop; at 100 TB this saves iters−1 shuffles of the
    # edge table).
    edges_deg = edges.join(outdeg, "src").localCheckpoint(eager=False)
    if assume_no_dangling:
        # every node has an out-edge ⇒ outdeg's srcs ARE the node set —
        # already distinct by construction, no union+distinct shuffle
        nodes = outdeg.select(F.col("src").alias("node"))
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        ).localCheckpoint(eager=False)
    if n_nodes is None:
        n_nodes = nodes.count()
    if not n_nodes:
        # empty graph: no nodes, no rank — not a ZeroDivisionError
        # (empty-input robustness probe, tests/test_properties.py)
        return nodes.withColumn("rank", F.lit(0.0))
    # Structural dangling check: one metadata-scale probe before the
    # loop, not per round. head(1) short-circuits after the first hit;
    # the checkpoint (per-round reuse) is only paid when danglers exist.
    # ``assume_no_dangling=True`` skips the probe job entirely — for
    # callers whose edge construction guarantees every node has an
    # out-edge (e.g. a bidirectional/unioned edge list).
    if assume_no_dangling:
        has_dangling = False
        dangling = None
    else:
        dangling = nodes.join(outdeg, nodes.node == outdeg.src, "left_anti")
        has_dangling = bool(dangling.head(1))
        if has_dangling:
            dangling = dangling.localCheckpoint()
    rank = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contrib = (
            edges_deg.join(rank.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst"),
                F.floor(
                    (F.col("rank") / F.col("outdeg")) * F.lit(PR_SCALE)
                ).alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        damped = F.lit(damping) * (
            F.coalesce(F.col("s"), F.lit(0)).cast("double") / F.lit(PR_SCALE)
        )
        if has_dangling:
            # Dangling mass, floor-quantized like the edge contributions
            # so the redistribution is order-free and cross-engine exact.
            dmass = dangling.join(rank, "node").agg(
                F.coalesce(
                    F.sum(
                        F.floor(F.col("rank") * F.lit(PR_SCALE)).cast("bigint")
                    ),
                    F.lit(0).cast("bigint"),
                ).alias("dangling_q")
            )
            rank = (
                nodes.join(summed, nodes.node == summed.dst, "left")
                .crossJoin(F.broadcast(dmass))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + damped
                        + F.lit(damping)
                        * (
                            (F.col("dangling_q").cast("double") / F.lit(PR_SCALE))
                            / F.lit(float(n_nodes))
                        )
                    ).alias("rank"),
                )
            )
        else:
            rank = nodes.join(summed, nodes.node == summed.dst, "left").select(
                "node", (F.lit(base) + damped).alias("rank")
            )
    return rank


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier↔customer trade graph (distinct
    (l_suppkey, o_custkey) pairs, both directions): which entities sit
    at the center of the purchasing network. Top-k by rank with a
    total-order tie-break."""
    t = load_testdata(spark, sf_dir, ("lineitem", "orders"))
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # a graph edge needs two IDENTITIES: a NULL key row is dropped
        # in both engines (r8 nullkeys sweep — without the filter Spark's
        # NULL-poisoning concat makes a NULL node while DuckDB's
        # NULL-skipping concat makes a ghost 'c_' node, and the rank
        # mass distribution diverges). Pushed into the scans.
        .filter(F.col("l_suppkey").isNotNull() & F.col("o_custkey").isNotNull())
        .select(
            F.concat(F.lit("s_"), F.col("l_suppkey")).alias("s"),
            F.concat(F.lit("c_"), F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    # both directions in ONE pass over pairs (r14): the unionAll spelling
    # re-executed the whole lineitem⋈orders+distinct derivation once per
    # branch (profiled: two ~22 s / 140 MB scan stages at sf0.1 for one
    # materialization) — explode emits the same row multiset from a
    # single subtree, so the derivation runs once.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # bidirectional edges → every node appears as a src with outdeg ≥ 1,
    # so the dangling-mass probe is provably vacuous here — skip its job
    ranks = pagerank(edges, assume_no_dangling=True)
    return ranks.orderBy(F.desc("rank"), "node").limit(PR_TOPK)


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """Unrolled-CTE twin of :func:`pagerank` — same op order, same
    fixed-point quantization, literals in `85e-2` form (a bare 0.85
    parses as DECIMAL in both dialects and would contaminate the
    double arithmetic)."""
    cte = f"""
WITH pairs AS (
  SELECT DISTINCT concat('s_', l_suppkey) AS s, concat('c_', o_custkey) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey IS NOT NULL AND o_custkey IS NOT NULL
),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (
  SELECT node, 1e0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    for i in range(1, iters + 1):
        cte += f""",
c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(CAST(FLOOR((r.rank / o.outdeg) * 1e12) AS BIGINT))
              AS BIGINT) AS s
  FROM edges e
  JOIN r{i - 1} r ON e.src = r.node
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         ((1e0 - 85e-2) / (SELECT n FROM nn))
         + 85e-2 * (CAST(COALESCE(c.s, 0) AS DOUBLE) / 1e12) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)"""
    return (
        cte
        + f"""
SELECT node, rank FROM r{iters}
ORDER BY rank DESC, node
LIMIT {PR_TOPK}
"""
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------

#: supplier pairs must share at least this many orders to form an edge —
#: thresholding keeps the co-occurrence graph sparse (the standard guard
#: against projection blowup when folding a bipartite relation)
TRI_MIN_SHARED = 5
TRI_TOPK = 50


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge list ``(u, v)``
    with ``u < v``, deduplicated. Returns (node, n_triangles).

    Algorithm: degree-ordered orientation (the MapReduce-era standard —
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11). Every edge is directed from its lower endpoint to
    its higher endpoint under the total order (degree, id); wedges are
    generated only at each triangle's LOWEST-ordered vertex, so a hub of
    degree d contributes O(d_out²) with d_out ≤ √(2m) instead of O(d²) —
    the skew-killer that makes the plan survive power-law graphs at
    100 TB. Each triangle is emitted exactly once, then attributed to
    its three corners with one explode.

    Shape: two shuffles to attach degrees, one self-join on the wedge
    apex (hash join on ``src``), one closure join on the (y, z) edge
    key, one final count — no UDFs, no driver-side state.

    The edge list and its oriented form are each read by MULTIPLE plan
    branches (degree union, both wedge sides, the closure probe) —
    without lineage truncation Spark re-derives the upstream edge
    pipeline once per branch (measured 30 s → 5 s at sf0.1). Both are
    edge-scale tables, the same ``localCheckpoint`` policy as
    ``pagerank``/``connected_components``.
    """
    edges = edges.localCheckpoint()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = edges.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
        )
        # partition by the wedge-apex key once: the o1⋈o2 self-join below
        # then runs exchange-free on both sides (§2.4)
        .repartition("src")
        .localCheckpoint()
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, "src").filter(
        (F.col("o1.ddst") < F.col("o2.ddst"))
        | (
            (F.col("o1.ddst") == F.col("o2.ddst"))
            & (F.col("o1.dst") < F.col("o2.dst"))
        )
    )
    closure = oriented.select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = wedges.select(
        F.col("src").alias("x"),
        F.col("o1.dst").alias("y"),
        F.col("o2.dst").alias("z"),
    ).join(closure, ["y", "z"])
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-supplier graph: suppliers are linked when
    they appear in at least ``TRI_MIN_SHARED`` common orders (the
    one-mode projection of the order–supplier bipartite relation,
    thresholded to stay sparse). Top-k nodes by triangle count — the
    cheap clustering-coefficient numerator used to find tightly-knit
    supplier communities. The per-order self-join's fan-out is bounded
    by items-per-order² (TPC-H ≤ 7 items), so pair generation is
    key-local and scale-safe."""
    li = load_testdata(spark, sf_dir, ("lineitem",))["lineitem"]
    # One exchange serves the dedup AND the per-order self-join (§2.4):
    # hash-partitioning by l_orderkey colocates equal (orderkey, suppkey)
    # rows, so dropDuplicates adds no second exchange, and the checkpoint
    # preserves the partitioning so the a⋈b self-join below is
    # exchange-free on BOTH sides. Previously the distinct exchanged on
    # the pair and the join re-exchanged both branches on the order key
    # (and the un-checkpointed subtree scanned lineitem once per branch).
    so = (
        li.select("l_orderkey", "l_suppkey")
        .repartition("l_orderkey")
        .dropDuplicates()
        .localCheckpoint()
    )
    a = so.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = so.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    und = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= TRI_MIN_SHARED)
        .select("u", "v")
    )
    counts = triangle_counts(und)
    return (
        counts.select(
            F.col("node").cast("bigint").alias("node"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
        )
        .orderBy(F.desc("n_triangles"), "node")
        .limit(TRI_TOPK)
    )


# Naive closure by node id — enumerates the SAME triangle set as the
# degree-ordered Spark plan (orientation changes the enumeration
# schedule, never the set), at DuckDB-on-sf0.01 scale where naive is fine.
_TRIANGLES_ORACLE = f"""
WITH so AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
und AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v
  FROM so a JOIN so b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
  HAVING COUNT(*) >= {TRI_MIN_SHARED}
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node
ORDER BY n_triangles DESC, node
LIMIT {TRI_TOPK}
"""


def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree distribution of the trade graph — the first
    diagnostic for every graph algorithm here: a heavy tail predicts
    skewed shuffles (PageRank's hot nodes, triangle counting's hub
    wedges) and tells you whether degree-ordered orientation / salting
    is worth it BEFORE running the expensive op.

    Binning by ``floor(log2(degree))`` is engine-safe: log2 is exact at
    the only inputs where floor changes value (powers of two), so the
    bin edges cannot disagree across engines. Cost: the edge-build
    aggregation plus a degree-cardinality rollup."""
    t = load_testdata(spark, sf_dir, ("lineitem", "orders"))
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # NULL keys carry no graph identity — same edge rule as
        # graph_pagerank (r8 nullkeys sweep)
        .filter(F.col("l_suppkey").isNotNull() & F.col("o_custkey").isNotNull())
        .select(
            F.concat(F.lit("s_"), F.col("l_suppkey")).alias("s"),
            F.concat(F.lit("c_"), F.col("o_custkey")).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionAll(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("degree"))
    b = F.floor(F.log2(F.col("degree").cast("double"))).cast("bigint")
    return (
        deg.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


_DEGREE_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT concat('s_', l_suppkey) AS s, concat('c_', o_custkey) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_suppkey IS NOT NULL AND o_custkey IS NOT NULL
),
edges AS (
  SELECT s AS src, c AS dst FROM pairs
  UNION ALL
  SELECT c AS src, s AS dst FROM pairs
),
deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src
)
SELECT CAST(floor(log2(CAST(degree AS DOUBLE))) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(degree) AS min_degree,
       MAX(degree) AS max_degree
FROM deg GROUP BY 1
"""


def graph_components_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components on a HIGH-DIAMETER planted graph — the
    external proof of :func:`connected_components_star` (VERDICT r7 #6:
    label propagation is O(diameter) rounds; this tier must not be).

    Fixture: within each source, consecutive documents (doc_id order)
    are chained, with the link (a, b) dropped when ``(a + b) % 7 = 0``
    — long path segments of varying length (diameter scales with the
    corpus, exactly the regime that starves label propagation) plus
    singleton nodes where both links broke. The engine runs the REAL
    O(log n)-round star contraction over the edge list; the oracle
    exploits the planted structure (a path segment's component is the
    segment minimum) with two window passes — break-flag running sum →
    segment id → MIN per segment — no recursion needed, which is what
    makes a transitive closure checkable in plain SQL at this size.

    Returns (doc_id, component, component_size). Scale shape: edge
    build is ONE window over (source, doc_id); contraction is two
    grouped aggregations per round over a SHRINKING edge list; the
    size rollup is component-cardinality."""
    docs = load_testdata(spark, sf_dir, ("documents",))["documents"]
    # the chain is defined over LOGICAL documents: an exact duplicate
    # storage row (r9 dupkeys) would otherwise make lead() see the
    # copy as "the next document" — a self-edge plus shifted links —
    # and double the per-doc output; distinct mirrors the oracle's
    # DISTINCT source
    docs = docs.select("source", "doc_id").distinct()
    w = Window.partitionBy("source").orderBy("doc_id")
    edges = (
        docs
        .withColumn("nxt", F.lead("doc_id").over(w))
        .filter(F.col("nxt").isNotNull() & ((F.col("doc_id") + F.col("nxt")) % 7 != 0))
        .select(F.col("doc_id").alias("doc_a"), F.col("nxt").alias("doc_b"))
    )
    comp = connected_components_star(edges)
    out = (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    wc = Window.partitionBy("component")
    return out.select(
        "doc_id",
        "component",
        F.count("*").over(wc).cast("bigint").alias("component_size"),
    )


_CHAIN_ORACLE = """
WITH linked AS (
  SELECT source, doc_id,
         lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS nxt,
         lag(doc_id)  OVER (PARTITION BY source ORDER BY doc_id) AS prv
  FROM (SELECT DISTINCT source, doc_id FROM documents)
),
seg AS (
  -- a row STARTS a new segment when its backward link is absent/broken;
  -- the running sum of start flags within a source is the segment id
  SELECT source, doc_id,
         SUM(CASE WHEN prv IS NULL OR (prv + doc_id) % 7 = 0
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM linked
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY source, seg_id) AS component,
       CAST(COUNT(*) OVER (PARTITION BY source, seg_id) AS BIGINT)
         AS component_size
FROM seg
"""


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "dedup_clusters_incremental": dedup_clusters_incremental,
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
    "graph_degree_histogram": graph_degree_histogram,
    "graph_components_chain": graph_components_chain,
}
ORACLES = {
    "dedup_clusters": _CLUSTERS_ORACLE,
    "dedup_clusters_incremental": _CLUSTERS_INCR_ORACLE,
    "graph_pagerank": _pagerank_oracle(),
    "graph_triangles": _TRIANGLES_ORACLE,
    "graph_degree_histogram": _DEGREE_ORACLE,
    "graph_components_chain": _CHAIN_ORACLE,
}
