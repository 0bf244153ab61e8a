"""Graph algorithms over edge relations.

Beyond the reference surface (SURVEY.md §2 closes with the
LLM-data-pipeline extension families): corpus curation builds graphs —
the kNN graph (functions/vectors.py knn_graph_blocked), the duplicate
graph (functions/dedup.py dup_clusters' edge input) — and then needs
per-node importance over them (which document is the "center" of a
near-dup cluster, which vector is a hub in the semantic graph).
PageRank is the standard answer; ``dup_clusters`` already covers the
connected-components half of the graph toolkit, this module adds the
centrality half.

Design: a FIXED-POINT integer PageRank. Ranks are carried as BIGINT
micro-units (``scale`` units = total mass 1.0) and every step of the
recurrence is integer arithmetic (integer division, integer
multiplication), so the result is bit-identical across engines and
across partitionings — float PageRank sums neighbor contributions in
nondeterministic order, which breaks both the cross-engine oracle hash
and run-to-run reproducibility. The quantization error is bounded by
one unit per in-edge per iteration (≤ degree/scale ≈ 1e-11 at the
default scale), far below any ranking-relevant difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    vertices: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    iterations: int = 3,
    scale: int = 10**12,
    damping_num: int = 17,
    damping_den: int = 20,
    weight_col: str | None = None,
    weight_scale: int = 10**6,
) -> DataFrame:
    """PageRank over a directed edge relation, in exact integer
    fixed-point arithmetic — unweighted by default, EDGE-WEIGHTED when
    ``weight_col`` is given (a vertex then splits its rank ∝ its
    out-edge weights — over a kNN graph with cosine weights the hub
    score follows SIMILARITY mass, not just link count).

    Weighted semantics: weights quantize to
    ``max(0, round(w·weight_scale))`` BIGINTs (negative weights — e.g.
    anti-correlated cosines — contribute NOTHING, stated not hidden;
    zero-weight edges drop), and each edge carries
    ``(r_u · w_int) div Σw_int(u)`` — still pure integer arithmetic,
    with ``r·w ≤ scale·weight_scale = 1e18`` inside the signed-64
    range at the defaults. A vertex whose weights all clamp to zero
    becomes dangling.

    Semantics (the documented recurrence BOTH engines compute —
    integer division throughout, so it is reproducible bit-for-bit):

    - ``S = scale`` integer units represent total rank mass 1.0 and
      ``d = damping_num/damping_den`` (default 17/20 = 0.85).
    - ``r0(v) = S div N`` for every vertex (N = |vertices|).
    - each iteration: ``share(u) = r(u) div outdeg(u)`` for vertices
      with out-edges; ``r'(v) = ((damping_den - damping_num)·S div
      damping_den) div N + (damping_num · Σ_{u→v} share(u)) div
      damping_den``.
    - returned ``pagerank = round(r / S, 9)``.

    Dangling vertices (no out-edges) keep receiving the base term but
    their mass is not redistributed — the classic "dangling mass
    dropped" simplification, stated here because it is part of the
    oracle contract. Vertices never appearing as a destination still
    appear in the output with the base rank. ``vertices`` must carry
    DISTINCT ids: a duplicated id inflates N and emits duplicate rank
    rows (``.distinct()`` upstream when the source is an edge
    projection, as the registered queries do).

    Scale shape: each iteration is one equi-join of ranks onto the
    edge list (on the source id) followed by one partial-aggregating
    groupBy on the destination id, then a LEFT equi-join back onto the
    vertex set — all key-partitioned shuffles, nothing quadratic, and
    the rank/degree relations are one row per vertex. N rides a
    broadcast 1-row frame (house bounded-collect rule: no driver
    round-trip). ``iterations`` is a small constant so the lineage
    stays shallow; on a real cluster a caller iterating to
    convergence should checkpoint/persist every few rounds — with the
    fixed default (3) the plan is fine as a single lazy composition.

    All arithmetic stays in whole-stage codegen (BIGINT ``div``/``*``/
    ``+``); there is no Python in the loop — the Python ``for`` only
    unrolls the logical plan.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"need 0 < damping_num < damping_den, got {damping_num}/{damping_den}"
        )
    s_lit = int(scale)
    base_num = (damping_den - damping_num) * s_lit  # (1-d)·S in units·den

    n_df = vertices.agg(F.count(F.lit(1)).alias("_n"))
    verts = (
        vertices.select(F.col(id_col).alias("_id"))
        .crossJoin(F.broadcast(n_df))
    )
    if weight_col is not None:
        w_int = F.greatest(
            F.lit(0).cast("bigint"),
            F.round(F.col(weight_col) * F.lit(int(weight_scale)), 0).cast(
                "bigint"
            ),
        )
        ew = edges.select(
            F.col(src_col).alias("_u"),
            F.col(dst_col).alias("_v"),
            w_int.alias("_w"),
        ).filter(F.col("_w") > 0)
        wsum = ew.groupBy("_u").agg(F.sum("_w").alias("_ws"))
    else:
        ew = None
        wsum = None
    deg = edges.groupBy(F.col(src_col).alias("_u")).agg(
        F.count(F.lit(1)).alias("_deg")
    )

    r = verts.select(
        "_id", "_n", F.expr(f"CAST({s_lit} AS BIGINT) div _n").alias("_r")
    )
    for _ in range(int(iterations)):
        if weight_col is not None:
            contrib = (
                ew.join(
                    r.select(F.col("_id").alias("_u"), "_r"), "_u"
                )
                .join(wsum, "_u")
                .select("_v", F.expr("(_r * _w) div _ws").alias("_c"))
                .groupBy("_v")
                .agg(F.sum("_c").alias("_in"))
            )
        else:
            shares = r.join(deg, F.col("_id") == F.col("_u")).select(
                F.col("_u"), F.expr("_r div _deg").alias("_share")
            )
            contrib = (
                edges.select(
                    F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
                )
                .join(shares, "_u")
                .groupBy("_v")
                .agg(F.sum("_share").alias("_in"))
            )
        r = verts.join(contrib, F.col("_id") == F.col("_v"), "left").select(
            "_id",
            "_n",
            (
                F.expr(
                    f"(CAST({base_num} AS BIGINT) div {damping_den}) div _n"
                )
                + F.expr(
                    f"(CAST({damping_num} AS BIGINT)"
                    f" * coalesce(_in, CAST(0 AS BIGINT))) div {damping_den}"
                )
            ).alias("_r"),
        )
    return r.select(
        F.col("_id").alias(id_col),
        F.round(F.col("_r") / F.lit(float(s_lit)), 9).alias("pagerank"),
    )


def triangle_enumerate(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Enumerate every triangle of the UNDIRECTED graph underlying an
    edge relation — the clustering-structure primitive (local clustering
    coefficients, community seeds, dense-duplicate-neighborhood
    detection over the kNN/dup graphs) — as one canonical relation:
    ``(id_a < id_b < id_c)``, each triangle exactly once.

    Scale design — DEGREE-ordered orientation (the standard trick):
    after canonicalizing to distinct undirected (lo, hi) edges and
    dropping self-loops, each edge is oriented from its lower-(degree,
    id) endpoint to the higher one. Wedges are then generated by
    self-joining the oriented list on the CENTER vertex, so every
    vertex generates out-degree² wedges with out-degree bounded by
    O(√m) — a power-law hub's million neighbors do NOT become a
    million² wedge blow-up, which is exactly what happens under naive
    id-ordering when a hub has a small id. The closing check is one
    more equi-join against the oriented list. Everything is
    equi-join + partial-agg; nothing is ∝ deg² for unbounded deg.

    The OUTPUT is orientation-independent (a triangle is found exactly
    once whichever admissible orientation is used), so correctness
    cross-checks can replay the simple id-ordered formulation.

    ``materialize=True`` (the default) eagerly localCheckpoints the two
    bounded working sets (the canonical edge list and the oriented
    list) — see :func:`_canonical_und`; ``materialize=False`` keeps the
    plan lazy/composable for plan inspection (the family's standard
    flag, same contract as ``semdedup_kmeans``).
    """
    und = _canonical_und(edges, src_col, dst_col, materialize)
    return _triangles_of(und, materialize).orderBy("id_a", "id_b", "id_c")


def _canonical_und(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    materialize: bool = True,
) -> DataFrame:
    """Canonical distinct undirected edge list (_a < _b), MATERIALIZED
    (eager localCheckpoint) unless ``materialize=False`` (plan
    inspection). Every triangle/coefficient consumer
    references the edge relation many times (degrees, orientation,
    wedge legs, closing check): left lazy, each reference re-expands
    the caller's full edge-derivation lineage — over a kNN graph that
    re-ran the embeddings self-join + rank window up to 47 times in one
    plan (188 parquet scans in clustering_knn's r14 before-plan). The
    edge list is the algorithm's own working set (|E| rows, far smaller
    than the corpus that produced it), so one bounded materialization
    is the r14 fix; Exchange reuse cannot help because each consumer
    aggregates a DIFFERENT projection before its first shuffle."""
    lo = F.least(F.col(src_col), F.col(dst_col))
    hi = F.greatest(F.col(src_col), F.col(dst_col))
    und = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(lo.alias("_a"), hi.alias("_b"))
        .distinct()
    )
    return und.localCheckpoint(eager=True) if materialize else und


def _triangles_of(und: DataFrame, materialize: bool = True) -> DataFrame:
    """Canonical (id_a < id_b < id_c) triangles of a MATERIALIZED
    canonical undirected edge list — the shared degree-oriented core of
    :func:`triangle_enumerate` and
    :func:`local_clustering_coefficient`. The oriented list is
    localCheckpointed too (when ``materialize``): its three consumers
    (both wedge legs and the closing check) would otherwise each re-run
    the degree join."""
    deg = (
        und.select(F.explode(F.array("_a", "_b")).alias("_v"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    da = deg.select(F.col("_v").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_v").alias("_b"), F.col("_d").alias("_db"))
    with_deg = und.join(da, "_a").join(db, "_b")
    # orient: lower (degree, id) -> higher (degree, id)
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(a_first, F.col("_da")).otherwise(F.col("_db")).alias("_du"),
        F.when(a_first, F.col("_b")).otherwise(F.col("_a")).alias("_w"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dw"),
    )
    if materialize:
        oriented = oriented.localCheckpoint(eager=True)
    o1 = oriented.select(
        F.col("_u"), F.col("_w").alias("_v1"), F.col("_dw").alias("_dv1")
    )
    o2 = oriented.select(
        F.col("_u"), F.col("_w").alias("_v2"), F.col("_dw").alias("_dv2")
    )
    # each unordered wedge once: rank(v1) < rank(v2) in the same
    # (degree, id) order the orientation uses, so the closing edge
    # v1 -> v2 is oriented if it exists
    wedge_ok = (F.col("_dv1") < F.col("_dv2")) | (
        (F.col("_dv1") == F.col("_dv2")) & (F.col("_v1") < F.col("_v2"))
    )
    wedges = o1.join(o2, "_u").filter(wedge_ok)
    closing = oriented.select(
        F.col("_u").alias("_v1"), F.col("_w").alias("_v2")
    )
    tri = wedges.join(closing, ["_v1", "_v2"]).select("_u", "_v1", "_v2")
    # canonical ascending triple; the median of three is the greatest
    # of the pairwise leasts (no arithmetic — overflow-free on any ids)
    return tri.select(
        F.least("_u", "_v1", "_v2").alias("id_a"),
        F.greatest(
            F.least("_u", "_v1"),
            F.least("_u", "_v2"),
            F.least("_v1", "_v2"),
        ).alias("id_b"),
        F.greatest("_u", "_v1", "_v2").alias("id_c"),
    )


def local_clustering_coefficient(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Per-vertex local clustering coefficient of the undirected graph:
    ``c(v) = 2·t(v) / (d(v)·(d(v)−1))`` where ``t(v)`` counts triangles
    through ``v`` — how close each vertex's neighborhood is to a clique.
    Over the kNN graph this separates vectors inside dense semantic
    blobs (c → 1: near-dup nests, template families) from bridge
    vectors (c → 0), the per-node refinement of
    :func:`triangle_enumerate`'s global structure probe.

    Composition: the canonical triangle relation (degree-oriented
    generation, see :func:`triangle_enumerate`) explodes to its three
    member vertices for per-vertex counts; degrees come from the same
    canonicalized edge set — literally the SAME materialized
    :func:`_canonical_und` the triangle pass consumes (r14: the
    coefficient previously re-derived its own lazy copy, and its three
    per-vertex union branches re-ran the whole wedge join; one explode
    over :func:`_triangles_of` consumes the triangle relation once).
    Vertices in no triangle report 0; vertices with degree < 2 report
    coefficient 0 by convention (the ratio is undefined). The ratio
    divides two exact BIGINTs, so 6 dp rounding is engine-stable.

    Scale: everything the triangle pass pays, plus one explode (3 rows
    per triangle) and two vertex-sized aggregations. ``materialize``:
    same contract as :func:`triangle_enumerate`.
    """
    und = _canonical_und(edges, src_col, dst_col, materialize)
    deg = (
        und.select(F.explode(F.array("_a", "_b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = _triangles_of(und, materialize)
    per_vertex = (
        tri.select(
            F.explode(F.array("id_a", "id_b", "id_c")).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint")
    return (
        deg.join(per_vertex, "id", "left")
        .select(
            "id",
            F.col("degree").cast("bigint").alias("degree"),
            t.alias("n_triangles"),
            F.when(F.col("degree") < 2, F.lit(0.0))
            .otherwise(
                F.round(
                    2 * t / (F.col("degree") * (F.col("degree") - 1)), 6
                )
            )
            .alias("clustering"),
        )
        .orderBy("id")
    )


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    rounds: int = 3,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007): every vertex starts labeled with its own id; each
    round, every vertex adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label. Returns ``(id,
    community)``.

    Determinism: asynchronous LPA (the textbook variant) depends on
    visit order — unusable under an oracle or across partitionings.
    Synchronous rounds + the min-label tie-break make every round a
    pure function of the previous labeling, so the result is
    bit-identical across engines; a FIXED round count (not
    "until converged") keeps the oracle an unrolled CTE chain and
    bounds the lineage. Input edges are treated as UNDIRECTED
    (symmetrized + deduped here — callers pass directed kNN edges
    as-is); isolated vertices keep their own label.

    Scale shape: per round, one equi-join of the edge relation against
    the n-row label relation (shuffle on dst), one partially-aggregated
    (vertex, label) count (map-side combine absorbs multi-edges), one
    per-vertex rank window bounded by the vertex's distinct neighbor
    labels, then a left join back to the vertex set — everything linear
    in |E|, nothing quadratic, no driver-side collection. 3 rounds is
    the curation sweet spot (SemDeDup-style cluster splitting): labels
    travel at most 3 hops, so community diameter stays bounded and the
    lineage stays a constant factor."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    sym = (
        edges.select("src", "dst")
        .union(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if vertices is None:
        vertices = sym.select(F.col("src").alias("id")).distinct()
    verts = vertices.select("id")
    labels = verts.select("id", F.col("id").alias("community"))
    from pyspark.sql import Window

    w = Window.partitionBy("_v").orderBy(
        F.desc("_cnt"), F.asc("community")
    )
    for _ in range(int(rounds)):
        nbr = sym.join(
            labels.withColumnRenamed("id", "_nid"),
            sym["dst"] == F.col("_nid"),
        ).select(F.col("src").alias("_v"), "community")
        winners = (
            nbr.groupBy("_v", "community")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("_v", F.col("community").alias("_new"))
        )
        labels = verts.join(
            winners, verts["id"] == F.col("_v"), "left"
        ).select(
            "id", F.coalesce(F.col("_new"), F.col("id")).alias("community")
        )
    return labels
