"""Connected components over near-duplicate candidate pairs.

LSH (MinHash or SimHash) emits PAIRS; deduplication needs GROUPS —
"a≈b, b≈c" must collapse to one cluster {a, b, c} with a single
canonical survivor.  This module closes that gap with a distributed
min-label propagation, the standard iterative-join formulation of
connected components on Spark.

Scale shape
-----------
Each round is one shuffle-join (labels ⋈ edges) + one min-aggregation —
both partial-aggregated, AQE-planned hash joins keyed on the node id.
Rounds needed = graph diameter (labels flow one hop per round along the
symmetrized edge list).  Near-dup graphs are unions of near-cliques
(every member of a dup cluster shares buckets with most others), so the
diameter is tiny — 2-4 rounds in practice, independent of corpus size.
For adversarial high-diameter graphs (long chains), the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log²n) rounds; the
per-round dataflow here is the same, only the edge-rewrite rule differs.

Per round the labels frame goes through ``cut_lineage``: the plan
would otherwise grow by two joins per iteration and re-execute from
the source each round.  ``cut_lineage`` picks reliable ``checkpoint``
when a checkpoint dir is configured (the multi-executor deployment
path — survives executor loss) and ``localCheckpoint`` in single-JVM
local mode; see ``lineage.py``.

Reference provenance: the reference has no graph operator — this is a
north-star extension (BASELINE.json: dedup for LLM training pipelines);
its per-ZIP top-1 (BlueForty.py:441-448) is the closest analog of
"collapse a candidate set to one canonical row".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lineage import cut_lineage


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve an undirected edge list to ``(node, component_id)`` where
    ``component_id`` is the minimum node id reachable from ``node``.

    Only nodes that appear in at least one pair are returned (isolated
    rows need no clustering — callers union them back as their own
    canonical, see :func:`dedup_near_duplicates`).
    """
    # Persist the pair projection BEFORE symmetrizing: the union below
    # references it twice, and the upstream pair generator (an LSH
    # bucket join) is far too expensive to run once per branch.
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    edges = (
        p.union(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .transform(cut_lineage)
    )
    for _ in range(max_iter):
        # Min label among neighbors: one hop of propagation.  Edges are
        # symmetric, so every round halves the remaining label distance
        # along any path in the best case, and moves it one hop worst
        # case.
        nbr_min = (
            edges.join(labels, edges["u"] == labels["node"])
            .select(F.col("v").alias("node"), F.col("comp"))
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_min"))
        )
        # Carry a per-node _changed flag through the checkpoint so the
        # convergence probe is a filter over the materialized round
        # instead of a self-join of two label tables (round-14: one
        # join per round removed).
        new_comp = F.least(
            F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
        )
        new_labels = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node",
                new_comp.alias("comp"),
                (new_comp != F.col("comp")).alias("_changed"),
            )
            .transform(cut_lineage)
        )
        labels = new_labels.select("node", "comp")
        if not new_labels.filter(F.col("_changed")).take(1):
            break
    edges.unpersist()
    p.unpersist()
    return labels.select(F.col("node"), F.col("comp").alias("component_id"))


def dedup_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """End-to-end near-dup dedup keep-list: cluster the candidate pairs,
    keep the minimum-id document of every cluster, and keep every
    document that was never paired.  Deterministic (min-id canonical),
    unlike dropDuplicates.

    Returns ``df`` filtered to survivors (original schema preserved).
    """
    comps = connected_components(pairs, src=src, dst=dst)
    # Survivor set: nodes whose id IS their component's min (canonical),
    # plus all unpaired ids (left anti against the paired node list).
    canonical = comps.filter(F.col("node") == F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    unpaired = df.select(id_col).join(
        comps.select(F.col("node").alias(id_col)), on=id_col, how="left_anti"
    )
    survivors = canonical.union(unpaired)
    return df.join(survivors, on=id_col, how="inner")


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank with EXACT integer fixed-point arithmetic: ranks are
    bigints scaled by ``scale`` and every update is

        rank' = (1 − d)·scale + (d_pct · Σ (rank_in ÷ out_deg)) ÷ 100

    using integer division throughout, so partial-aggregation order
    cannot change a single bit — the same reason the engine sums
    doubles as FLOOR-micros.  Dangling nodes keep only the teleport
    term (the standard simplified formulation; no global redistribution
    pass).

    Iteration shape (the canonical Spark iterative-algorithm loop):
    each round is contribs = edges ⋈ ranks (one shuffle on src) →
    groupBy(dst) sum (partial-aggregated) → left join onto the node
    list.  Ranks are persisted per round and the previous round is
    unpersisted; every ``checkpoint_every`` rounds the lineage is
    truncated with ``cut_lineage`` so the plan does not grow
    unboundedly (reliable ``checkpoint`` automatically when a
    checkpoint dir is configured — see ``lineage.py``).

    Returns ``(node, rank_e9)``.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = e.join(deg, on="u").persist()
    nodes = (
        e.select("u").union(e.select(F.col("v").alias("u")))
        .distinct()
        .select(F.col("u").alias("node"))
        .persist()
    )
    base = (scale * (100 - damping_pct)) // 100
    ranks = nodes.select(
        "node", F.lit(scale).cast("bigint").alias("rank_e9")
    ).transform(cut_lineage)
    checkpoint_every = 4
    for i in range(iterations):
        contribs = (
            out_edges.join(ranks, out_edges["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                F.expr("rank_e9 div deg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        new_ranks = nodes.join(contribs, on="node", how="left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(
                    f"CAST({damping_pct} AS BIGINT)"
                    " * coalesce(_s, CAST(0 AS BIGINT)) div 100"
                )
            ).alias("rank_e9"),
        )
        old = ranks
        ranks = (
            new_ranks.transform(cut_lineage)
            if (i + 1) % checkpoint_every == 0 or i == iterations - 1
            else new_ranks.persist()
        )
        ranks.count()  # materialize before dropping the parent
        old.unpersist()
    # the final ranks are checkpointed (lineage cut), so the loop's
    # cached inputs can be released before returning
    e.unpersist()
    out_edges.unpersist()
    nodes.unpersist()
    return ranks


def flatten_hierarchy(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 30,
) -> DataFrame:
    """Flatten a parent-pointer forest to (node, root, depth) — the
    DataFrame analog of SQL's ``WITH RECURSIVE`` ancestor walk (org
    charts, BOM explosions, category trees, reply threads).  ``depth``
    is the edge count from the node to its root; roots are nodes that
    appear only as parents (or never appear as children) and emit
    (root, root, 0).

    Iteration shape: pointer chasing by iterative equi-join — round k
    resolves every node whose current ancestor has no parent, and the
    unresolved frontier re-joins the (persisted) edge table.  The
    frontier only shrinks; rounds are bounded by tree HEIGHT, not node
    count, and each round's frontier is cut (``cut_lineage``) so the plan
    stays flat (the connected_components / pagerank convention).  For
    trees deeper than a few dozen levels, pointer-doubling (joining
    the partial paths to themselves) halves the round count at the
    cost of materializing midpoint paths — height-bounded chasing is
    the right default for the shallow-wide hierarchies data work
    actually meets.

    Raises if ``max_depth`` rounds leave an unresolved frontier — a
    cycle, which a parent-pointer forest must not contain.
    """
    e = edges.select(
        F.col(child_col).alias("_c"), F.col(parent_col).alias("_p")
    ).persist()
    nodes = (
        e.select(F.col("_c").alias("_n"))
        .union(e.select(F.col("_p").alias("_n")))
        .distinct()
    )
    frontier = nodes.select(
        F.col("_n").alias("node"),
        F.col("_n").alias("_anc"),
        F.lit(0).cast("int").alias("depth"),
    ).transform(cut_lineage)
    done = None
    for _ in range(max_depth + 1):
        # Cut the JOINED step once per round: the resolved and frontier
        # branches are both filters over the materialized step, so the
        # round's join runs exactly once, and the returned `done` union
        # reads checkpointed rounds instead of replaying every join
        # against a by-then-unpersisted edge table (round-14: the old
        # shape re-scanned the source once per round at consumption).
        step = cut_lineage(
            frontier.join(
                e, frontier["_anc"] == e["_c"], how="left"
            ).select(
                "node",
                F.col("_p").alias("_next"),
                "depth",
                F.col("_anc"),
            )
        )
        resolved = step.filter(F.col("_next").isNull()).select(
            "node", F.col("_anc").alias("root"), "depth"
        )
        done = resolved if done is None else done.unionByName(resolved)
        frontier = step.filter(F.col("_next").isNotNull()).select(
            "node",
            F.col("_next").alias("_anc"),
            (F.col("depth") + 1).alias("depth"),
        )
        if not frontier.take(1):
            break
    else:
        raise ValueError(
            f"hierarchy deeper than max_depth={max_depth} "
            "(or contains a cycle)"
        )
    e.unpersist()
    return done


def dedup_keep_best(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware near-dup dedup: within each duplicate cluster keep
    the HIGHEST-``quality_col`` member (id as tiebreak) instead of the
    arbitrary min-id — when near-duplicates differ in cleanliness or
    length, min-id canonicalization throws away the best copy about
    half the time.  Unpaired documents always survive.

    Scale shape: the same label-propagation clustering as
    :func:`dedup_near_duplicates`, plus ONE per-cluster argmax window
    over the (tiny) paired-node set — never over the corpus.
    """
    from pyspark.sql import Window

    comps = connected_components(pairs, src=src, dst=dst)
    scored = comps.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col)),
        on="node",
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc(quality_col), F.asc("node")
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("node").alias(id_col))
    )
    unpaired = df.select(id_col).join(
        comps.select(F.col("node").alias(id_col)),
        on=id_col,
        how="left_anti",
    )
    return df.join(best.union(unpaired), on=id_col, how="inner")


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle census over an undirected graph — the clustering
    /community-density statistic (and the classic "can your join engine
    do graph analytics" benchmark).  Edge-iterator form: canonicalize
    every edge to (lo < hi) and distinct it, build wedges by joining
    edge (a,b) to edge (b,c), close each wedge against edge (a,c) —
    because every edge is id-ordered, each triangle a<b<c is produced
    EXACTLY once, no post-hoc ÷6.

    Returns one row: (n_nodes, n_edges, n_triangles).

    Scale shape: two equi-joins on edge endpoints — never an all-pairs
    product.  Wedge volume is Σ_v deg(v)²; the id-ordering already
    halves it, and the production refinement is orienting edges by
    DEGREE order instead of id order (cuts the hub term to the
    classic O(m^1.5) bound).  At 100 TB you'd also pre-bucket both
    join sides on the wedge key to co-locate the closes.  The
    canonical edge table feeds FIVE plan branches (both wedge sides,
    the close side, node count, edge count), so it is cut from its
    lineage with a lazy cut_lineage — materialized once at first
    action, ContextCleaner-released, never five upstream scans.
    """
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )
    wedges = (
        e.alias("e1")
        .join(
            e.alias("e2"),
            on=[F.col("e1.b") == F.col("e2.a")],
        )
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = (
        wedges.alias("w")
        .join(
            e.alias("e3"),
            on=[
                F.col("w.a") == F.col("e3.a"),
                F.col("w.c") == F.col("e3.b"),
            ],
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def k_core_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
) -> DataFrame:
    """Bounded-round k-core peel: repeatedly remove nodes of degree
    < k (with the edges they carry) for EXACTLY ``rounds`` rounds —
    the dense-subgraph extractor behind community mining and spam/
    bot-ring detection.

    The round count is part of the CONTRACT, not an optimization
    stop: a fixed unrollable recurrence is engine-replayable (an
    unrolled-CTE oracle can mirror it exactly, like the ADPCM
    recursive decode), whereas iterate-to-fixpoint is not.  The
    ``converged`` flag reports whether round ``rounds`` changed
    nothing — when TRUE, the output IS the exact k-core; when FALSE
    the caller raises ``rounds`` (each round is one degree
    aggregation + one semi-join, so cost is linear in rounds).

    Input: undirected edges as (src, dst) with src < dst, both
    directions implied.  Output: surviving (node, degree) plus the
    converged flag on every row.  Per round: one map-side-combinable
    degree count and two broadcast-friendly semi-joins — no
    all-pairs anything; lineage stays bounded because each round
    materializes only the shrinking edge set.
    """
    # Each round references the previous edge set five times (degree
    # union + two semi-joins), so without lineage cuts the LOGICAL
    # plan grows ~5^rounds and the analyzer itself OOMs long before
    # execution.  cut_lineage per round truncates it — the same
    # bounded-iteration discipline as connected_components/pagerank.
    cur = edges.select("src", "dst").transform(cut_lineage)
    prev_nodes = None
    for _ in range(rounds):
        deg = (
            cur.select(F.col("src").alias("v"))
            .unionAll(cur.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("v")
        cur = (
            cur.join(
                keep.withColumnRenamed("v", "src"), "src", "left_semi"
            ).join(
                keep.withColumnRenamed("v", "dst"), "dst", "left_semi"
            )
        ).select("src", "dst").transform(cut_lineage)
        # keep's own lineage is one aggregation off the checkpointed
        # edge set — small enough to stay lazy (no extra blocks held
        # in the 1g-heap bare sessions the driver runs)
        prev_nodes = keep
    final_deg = (
        cur.select(F.col("src").alias("v"))
        .unionAll(cur.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") >= k)
    )
    # converged iff no node that survived the last peel now falls
    # below k (i.e. one more round would remove nothing)
    dropped = prev_nodes.join(
        final_deg.withColumnRenamed("v", "_v"),
        prev_nodes["v"] == F.col("_v"),
        "left_anti",
    ).agg(F.count("*").alias("n_dropped"))
    return final_deg.crossJoin(F.broadcast(dropped)).select(
        F.col("v").alias("node"),
        F.col("degree").cast("long").alias("degree"),
        (F.col("n_dropped") == 0).alias("converged"),
    )


def resource_allocation_pairs(
    edges: DataFrame,
    hub_col: str,
    item_col: str,
    min_common: int = 2,
    max_degree: int = 1000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Link prediction over a bipartite graph by the Resource
    Allocation index (Zhou, Lu, Zhang 2009): for each item pair, sum
    ``1/deg(hub)`` over the hubs they share — the standard
    co-occurrence affinity score (co-purchase, co-citation,
    user-item).  Integer fixed-point: each hub contributes
    ``floor(scale / deg)``, so the pair score is an exact BIGINT sum
    with no float summation order anywhere.

    Scale shape: candidate pairs come from a self-join on the hub key
    — per-hub work is quadratic in hub degree, which is why
    ``max_degree`` drops super-hubs (a hub shared by thousands of
    items contributes ~0 weight each but ~millions of pairs; every
    published RA/LSH pipeline caps or down-weights them).  The cap is
    DEFAULT-ON; pass ``None`` to disable.  Everything else is
    hash-partitioned groupBys on bounded keys.

    Returns (item_a, item_b, n_common, ra_score_e6) with
    ``item_a < item_b``, filtered to ``n_common >= min_common``.
    """
    # The distinct edge set feeds the degree agg and BOTH pair sides;
    # a lazy cut runs the dedup shuffle once instead of three times
    # (round-14, guide §5).
    e = cut_lineage(
        edges.select(
            F.col(hub_col).alias("hub"), F.col(item_col).alias("item")
        ).distinct(),
        eager=False,
    )
    deg = e.groupBy("hub").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    w = deg.withColumn("w", F.expr(f"{scale} div deg"))
    ew = e.join(w, "hub")
    a = ew.select("hub", F.col("item").alias("item_a"), "w")
    b = ew.select("hub", F.col("item").alias("item_b"))
    pairs = a.join(b, "hub").filter(F.col("item_a") < F.col("item_b"))
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("w").alias("ra_score_e6"),
        )
        .filter(F.col("n_common") >= min_common)
    )


def _grid_dense_cells(
    points: DataFrame,
    x_col: str,
    y_col: str,
    scale: int,
    min_pts: int,
    cut: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Cell binning + density gate of :func:`grid_density_clusters`:
    returns ``(cells, dense)``.  ``cut=False`` exists ONLY so the plan
    pin can inspect the pre-cut pipeline (a cut subtree is invisible
    to explain — VERDICT r14 #6); production callers keep the cut.
    """
    if scale & (scale - 1):
        raise ValueError("scale must be a power of two (exact binning)")
    pts = points.select(
        F.floor(F.col(x_col).cast("double") * scale)
        .cast("long")
        .alias("cx"),
        F.floor(F.col(y_col).cast("double") * scale)
        .cast("long")
        .alias("cy"),
    )
    # The cell table is value-domain-bounded and fans out to ~12
    # downstream references (9 neighbor shifts, the edge join's build
    # side, the cluster join, the noise rollup), each of which would
    # re-run the full point scan + aggregation; one lazy lineage cut
    # makes the corpus pass run exactly once (round-14, guide §5).
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    if cut:
        cells = cut_lineage(cells, eager=False)
    # Collision-free cell key: (cx + 2^30)·2^31 + cy + 2^30 is
    # injective for cx, cy ∈ [−2^30, 2^30) and fits a signed 64-bit
    # long (max ≈ 2^62) — coordinates to ±6.7e7 at scale=16.  It is
    # also ORDER-compatible with (cx, cy), so min-cell_id cluster ids
    # keep their meaning.  Coordinates outside the encodable range
    # raise instead of silently merging distinct cells (the old
    # (cx+1024)·4096 pack collided beyond ±64 at scale=16).
    _lim = 1 << 30
    _guard = (
        (F.col("cx") < -_lim) | (F.col("cx") >= _lim)
        | (F.col("cy") < -_lim) | (F.col("cy") >= _lim)
    )
    dense = cells.filter(F.col("n") >= min_pts).withColumn(
        "cell_id",
        F.when(
            _guard,
            F.raise_error(
                F.format_string(
                    "grid_density_clusters: cell (%s, %s) outside the "
                    "encodable range [-2^30, 2^30); rescale the inputs",
                    F.col("cx"), F.col("cy"),
                )
            ).cast("long"),
        ).otherwise(
            (F.col("cx") + _lim) * F.lit(1 << 31) + F.col("cy") + _lim
        ),
    )
    return cells, dense


def _grid_cell_edges(dense: DataFrame) -> DataFrame:
    """8-neighborhood edges between dense cells: each cell's 9 shifted
    copies equi-join the cell table on the shifted coordinates — a
    hash join on bounded keys, NEVER a coordinate cross product.
    Split out of :func:`grid_density_clusters` so the plan pin can
    assert that shape directly (the subtree executes inside
    connected_components behind a lineage cut and is invisible in the
    final query's explain — VERDICT r14 #6)."""
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    shifted = None
    for dx, dy in offsets:
        s = dense.select(
            (F.col("cx") + dx).alias("ncx"),
            (F.col("cy") + dy).alias("ncy"),
            F.col("cell_id").alias("id_a"),
        )
        shifted = s if shifted is None else shifted.unionByName(s)
    return (
        shifted.join(
            dense.select(
                F.col("cx").alias("ncx"),
                F.col("cy").alias("ncy"),
                F.col("cell_id").alias("id_b"),
            ),
            ["ncx", "ncy"],
        )
        .select("id_a", "id_b")  # includes self-loops: keeps singleton
        .distinct()              # dense cells in the component output
    )


def grid_density_clusters(
    points: DataFrame,
    x_col: str,
    y_col: str,
    scale: int = 16,
    min_pts: int = 4,
    _cut: bool = True,
) -> DataFrame:
    """Density-based clustering in the GRID approximation of DBSCAN:
    bucket points into cells of side ``1/scale``, keep cells holding
    ≥ ``min_pts`` points (the core-density test), connect dense cells
    that touch (8-neighborhood), and resolve clusters as connected
    components.  Points in sparse cells are noise.

    This is the form of DBSCAN that actually distributes: the
    ε-neighbor search becomes an equi-join on cell keys (9 bounded
    offsets), never a distance self-join, and the component loop runs
    over the DENSE-CELL graph — whose size is bounded by the occupied
    value domain, not by row count.  ``scale`` MUST be a power of two:
    float×2^k is exact in IEEE doubles, so cell assignment has no
    rounding ambiguity across engines.

    Output: one row per cluster — (cluster_id = min cell id in the
    component, n_cells, n_points, min_cx, max_cx, min_cy, max_cy) —
    plus one ``cluster_id = -1`` noise row with the sparse-cell point
    count.  Single dense cells with no dense neighbor form their own
    singleton cluster.
    """
    cells, dense = _grid_dense_cells(
        points, x_col, y_col, scale, min_pts, cut=_cut
    )
    edges = _grid_cell_edges(dense)
    comp = connected_components(edges, "id_a", "id_b")
    clustered = dense.join(
        comp, dense["cell_id"] == comp["node"]
    ).select("cx", "cy", "n", F.col("component_id").alias("cluster_id"))
    per_cluster = clustered.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").alias("n_points"),
        F.min("cx").alias("min_cx"),
        F.max("cx").alias("max_cx"),
        F.min("cy").alias("min_cy"),
        F.max("cy").alias("max_cy"),
    )
    noise = (
        cells.filter(F.col("n") < min_pts)
        .agg(F.sum("n").alias("n_points"))
        .select(
            F.lit(-1).cast("long").alias("cluster_id"),
            F.lit(0).cast("long").alias("n_cells"),
            F.coalesce(F.col("n_points"), F.lit(0)).alias("n_points"),
            F.lit(None).cast("long").alias("min_cx"),
            F.lit(None).cast("long").alias("max_cx"),
            F.lit(None).cast("long").alias("min_cy"),
            F.lit(None).cast("long").alias("max_cy"),
        )
    )
    return per_cluster.unionByName(noise)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), made DETERMINISTIC the engine's way: every node starts
    as its own label; each round every node adopts the MOST FREQUENT
    label among its neighbors, ties broken by the SMALLEST label — no
    RNG, no asynchronous sweep order, so any engine replays the exact
    same rounds (the classic async formulation is run-order-dependent
    and cannot be oracle-checked).  Isolated update targets keep their
    current label.  Unlike min-label propagation (which converges to
    connected components), frequency voting finds dense communities
    INSIDE one component.

    Returns ``(node, label)`` after exactly ``rounds`` synchronous
    updates — the fixed-round contract that makes an iterative graph
    algorithm hash-checkable (the k_core_peel / ADPCM-recurrence
    trick).

    Scale shape per round: ONE labels ⋈ edges hash join (shuffle on
    the neighbor key), partial-agged (node, label) vote counts, and a
    WindowGroupLimit top-1 per node — never a collect of the graph.
    Labels are persisted per round, the previous round unpersisted,
    and lineage is cut with ``cut_lineage`` on the final round.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    from pyspark.sql import Window

    both = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    nodes = both.select(F.col("a").alias("node")).distinct().persist()
    labels = nodes.select(
        "node", F.col("node").cast("long").alias("label")
    ).transform(cut_lineage)
    w = Window.partitionBy("node").orderBy(
        F.desc("_c"), F.asc("label")
    )
    for i in range(rounds):
        votes = (
            both.join(labels, both["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", F.col("label").alias("_new"))
        )
        new_labels = (
            labels.join(top, on="node", how="left")
            .select(
                "node",
                F.coalesce(F.col("_new"), F.col("label")).alias("label"),
            )
        )
        old = labels
        labels = (
            new_labels.transform(cut_lineage)
            if i == rounds - 1
            else new_labels.persist()
        )
        labels.count()  # materialize before dropping the parent
        old.unpersist()
    both.unpersist()
    nodes.unpersist()
    return labels


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Multi-source breadth-first shortest-hop distances over an
    undirected graph, run for EXACTLY ``rounds`` frontier expansions —
    the traversal primitive behind "within N hops of a seed set"
    queries (blast-radius analysis, seed-expansion labeling, spam
    neighborhoods).

    ``sources`` is a one-column frame of seed nodes (distance 0).
    Output: ``(node, hops, converged)`` for every node REACHED within
    ``rounds`` hops; ``hops`` is exact (BFS level = shortest
    unweighted distance), and ``converged`` is TRUE iff one more
    expansion would reach no new node — i.e. the reachable set is
    complete, same fixed-round contract as ``k_core_peel`` (an
    unrolled-CTE oracle replays the identical rounds).

    Scale shape per round: ONE frontier ⋈ edges hash join (the
    frontier is the small side — broadcastable under AQE while it
    fits) + ONE anti-join against the visited set, both keyed on the
    node id; never an all-pairs product, never a collect.  The
    visited set grows monotonically and is ``cut_lineage``-cut per
    round to cut the 2-joins-per-round lineage (reliable
    ``checkpoint`` on a real cluster).  Frontier rows carry no
    payload, so the shuffle volume per round is bounded by the edge
    cut of the frontier, not the corpus.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    dist = (
        sources.select(F.col(sources.columns[0]).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .transform(cut_lineage)
    )
    frontier = dist.select("node")
    for r in range(1, rounds + 1):
        # Cut only the per-round frontier: the visited set is a lazy
        # union of already-checkpointed rounds, so re-materializing the
        # WHOLE monotone set every round (the old shape) is pure waste —
        # each anti-join probe reads checkpointed blocks either way
        # (round-14; one materialization job per round removed).
        nxt = cut_lineage(
            frontier.join(both, frontier["node"] == both["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(r).cast("int"))
        )
        dist = dist.unionAll(nxt)
        frontier = nxt.select("node")
    # converged iff expanding the final frontier reaches nothing new
    n_new = (
        frontier.join(both, frontier["node"] == both["a"])
        .select(F.col("b").alias("node"))
        .distinct()
        .join(dist.select("node"), "node", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_new"))
        # materialize the 1-row probe WHILE the doubled-edge cache is
        # live — unpersisting first would force the final action to
        # recompute `both` from scratch (ADVICE r11; mirrors
        # label_propagation's materialize-then-unpersist pattern)
        .transform(cut_lineage)
    )
    out = dist.crossJoin(F.broadcast(n_new)).select(
        "node",
        F.col("hops").cast("long").alias("hops"),
        (F.col("n_new") == 0).alias("converged"),
    )
    both.unpersist()
    return out


def hits_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a DIRECTED edge
    list, run for exactly ``rounds`` mutual-reinforcement updates with
    EXACT integer fixed-point arithmetic:

        auth'(v) = scale · Σ_{u→v} hub(u)   ÷  max_w auth_raw(w)
        hub'(u)  = scale · Σ_{u→v} auth'(v) ÷  max_w hub_raw(w)

    Renormalizing by the MAX component with one integer floor-division
    (the ``power_iteration`` discipline) instead of the L2 norm keeps
    every round bit-exact and partition-order-invariant — raw sums are
    DECIMAL(38,0) so a hub of any in-degree cannot overflow.  Nodes
    with no in-edges hold authority 0; no out-edges, hub 0.  An
    unrolled-CTE oracle replays the identical rounds.

    Iteration shape per round (the pagerank_fixed_point loop): two
    edges ⋈ scores hash joins (one shuffle each on the join key) +
    two partial-agged sums + two 1-row max rollups broadcast back —
    never anything quadratic in nodes.  Scores are lineage-cut EVERY
    phase (node-cardinality, so cheap) to keep the logical plan one
    phase deep — per-round persist alone leaves the nested-join plan
    to grow and OOMs Catalyst analysis on a small driver (use
    reliable ``checkpoint`` on a real cluster).

    Returns ``(node, hub_e9, auth_e9)``.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    d38 = "decimal(38,0)"
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    hub = nodes.select(
        "node", F.lit(scale).cast("bigint").alias("hub_e9")
    ).transform(cut_lineage)
    auth = None

    def _renorm(raw: DataFrame, mx: DataFrame, out_col: str, last: bool):
        # Mid-round scores for no-in/out-edge nodes are EXACTLY 0 and a
        # 0 contributes nothing to the next sum and never wins the max
        # (raw sums are positive), so the nodes zero-fill join is a
        # semantic no-op until the FINAL round, which must report every
        # node (round-14, guide §2.4: two joins per round removed).
        scaled = F.expr(
            f"CAST((CAST({scale} AS DECIMAL(38,0)) * _r)"
            " div _m AS BIGINT)"
        )
        if not last:
            return raw.crossJoin(F.broadcast(mx)).select(
                "node", scaled.alias(out_col)
            )
        return (
            nodes.join(raw, on="node", how="left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.when(F.col("_r").isNull(), F.lit(0).cast("bigint"))
                .otherwise(scaled)
                .alias(out_col),
            )
        )

    for i in range(rounds):
        last = i == rounds - 1
        araw = (
            e.join(hub, e["u"] == hub["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("hub_e9").cast(d38)).alias("_r"))
        )
        amax = araw.agg(F.max("_r").alias("_m"))
        # cut_lineage EVERY phase (not persist): persist leaves the
        # full logical plan in place, so six phases of nested joins +
        # broadcast crossJoins blow up Catalyst analysis memory on a
        # default-1g bare driver (observed java OOM at rounds=3,
        # 2k nodes).  Scores are node-cardinality, so the checkpoint
        # is cheap; lineage stays one phase deep.
        auth = _renorm(araw, amax, "auth_e9", last).transform(cut_lineage)
        hraw = (
            e.join(auth, e["v"] == auth["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum(F.col("auth_e9").cast(d38)).alias("_r"))
        )
        hmax = hraw.agg(F.max("_r").alias("_m"))
        hub = _renorm(hraw, hmax, "hub_e9", last).transform(cut_lineage)
    out = hub.join(auth, on="node").transform(cut_lineage)
    e.unpersist()
    nodes.unpersist()
    return out


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over the symmetrized distinct edge set — positive
    when high-degree nodes attach to high-degree nodes (social cores),
    negative for hub-and-spoke topologies (the supplier↔part shape).

    All five moments (n, Σx, Σxy, Σx², Σy² over directed edge copies)
    are exact DECIMAL(38,0) sums of integer degrees, so the only
    doubles are the final Pearson ratio — computed as
    ``num / (√dx · √dy)`` (the centroid_novelty √·√ split keeps each
    radicand in double range) and e6-floored in the same expression
    shape the oracle replays.  Degenerate variance (dx·dy = 0, e.g. a
    perfect matching) reports 0.

    Scale shape: ONE distinct on edges, ONE degree aggregation, two
    degree joins (hash, on node id), ONE 1-row moment rollup — no
    quadratic term anywhere.  Returns a single row
    ``(n_edges, assortativity_e6)`` where n_edges counts directed
    copies (2× undirected edges).
    """
    d38 = "decimal(38,0)"
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (
        e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    j = (
        und.join(deg.select(F.col("u"), F.col("deg").alias("_x")), on="u")
        .join(
            deg.select(
                F.col("u").alias("v"), F.col("deg").alias("_y")
            ),
            on="v",
        )
        .select(
            F.col("_x").cast(d38).alias("x"), F.col("_y").cast(d38).alias("y")
        )
    )
    m = j.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    out = m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.expr(
            """CAST(CASE
                 WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                 THEN 0
                 ELSE FLOOR(1000000.0 *
                   (CAST(n * sxy - sx * sy AS DOUBLE) /
                    (SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) *
                     SQRT(CAST(n * syy - sy * sy AS DOUBLE)))))
               END AS BIGINT)"""
        ).alias("assortativity_e6"),
    )
    res = out.transform(cut_lineage)
    und.unpersist()
    return res


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node — the per-node refinement
    of :func:`triangle_count`: of the deg·(deg−1)/2 possible links
    among a node's neighbors, what fraction exist?

        coeff_e6(v) = (2 · 1e6 · triangles(v)) ÷ (deg(v)·(deg(v)−1))

    — one exact long floor-division; deg < 2 reports 0 (no possible
    wedge).  Triangles come from the same id-ordered edge-iterator
    join as triangle_count (each triangle a<b<c produced exactly
    once, then credited to all three corners with one bounded
    3-element posexplode).

    Scale shape: two equi-joins on edge endpoints (wedge build +
    close) — never all-pairs; wedge volume Σ deg², halved by the id
    ordering (degree-orienting cuts it to O(m^1.5) at the extreme).
    The canonical edge table feeds four branches and is cut with one
    lazy cut_lineage.  Returns (node, degree, n_triangles,
    coeff_e6).
    """
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), on=[F.col("e1.b") == F.col("e2.a")])
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    tri = (
        wedges.alias("w")
        .join(
            e.alias("e3"),
            on=[
                F.col("w.a") == F.col("e3.a"),
                F.col("w.c") == F.col("e3.b"),
            ],
        )
        .select(
            F.explode(F.array(F.col("w.a"), F.col("w.b"), F.col("w.c")))
            .alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(tri, on="node", how="left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long")
        .alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(0))
        .otherwise(
            F.expr(
                "(2000000 * coalesce(n_triangles, 0))"
                " div (degree * (degree - 1))"
            )
        )
        .cast("long")
        .alias("coeff_e6"),
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected graph: for every
    NON-adjacent pair (a, b) with at least one common neighbor,

        aa_e6(a,b) = Σ_{w ∈ N(a) ∩ N(b)}  1e12 ÷ ln_e6(deg(w))

    where ``ln_e6 = floor(1e6·ln(deg))`` — rare shared neighbors count
    more than hubs (Adamic & Adar 2003), the classic
    "people you may know" / co-purchase-suggestion score.  Flooring
    the log BEFORE the division keeps every contribution an exact
    long, so the pair sum is partial-agg-order-free; common neighbors
    have deg ≥ 2 by construction, so ln_e6 ≥ 693147 > 0.

    Scale shape: ONE self-join of the symmetrized edge list on the
    shared-neighbor key w (wedge volume Σ deg² — the triangle_count
    budget; degree-cap w upstream for hub-heavy graphs), a broadcast
    degree join, one (a,b) partial agg, and a left-anti join against
    the edge set to keep only non-adjacent candidates.  Returns
    (id_a, id_b, n_common, aa_e6) with id_a < id_b.
    """
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.select(lo.alias("a"), hi.alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .transform(cut_lineage, eager=False)
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy(F.col("a").alias("w")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    wedges = (
        und.alias("l")
        .join(
            und.alias("r"),
            on=[
                F.col("l.a") == F.col("r.a"),
                F.col("l.b") < F.col("r.b"),
            ],
        )
        .select(
            F.col("l.a").alias("w"),
            F.col("l.b").alias("id_a"),
            F.col("r.b").alias("id_b"),
        )
    )
    contrib = wedges.join(deg, on="w").select(
        "id_a",
        "id_b",
        F.expr(
            "CAST(1000000000000 div"
            " CAST(FLOOR(1000000.0 * LN(CAST(deg AS DOUBLE))) AS BIGINT)"
            " AS BIGINT)"
        ).alias("_c"),
    )
    scored = contrib.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("_c").cast("long").alias("aa_e6"),
    )
    return scored.join(
        e.select(F.col("a").alias("id_a"), F.col("b").alias("id_b")),
        on=["id_a", "id_b"],
        how="left_anti",
    )
