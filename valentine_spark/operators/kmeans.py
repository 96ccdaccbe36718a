"""Distributed Lloyd's k-means over an embedding column — the learned-
centroid upgrade of IVF partitioning (``similarity.ivf_topk`` uses sign
buckets; real IVF trains coarse centroids).

Spark-first shape (no MLlib, no RDDs, no per-row Python):

  * **assign** is a pure JVM expression: the k current centroids are inlined
    as literal nested arrays, each row computes k squared distances with
    ``zip_with``/``aggregate`` folds and takes ``array_min`` over
    (distance, idx) structs — whole-stage-codegen'd, no shuffle;
  * **update** is one narrow aggregation: ``posexplode`` the (small, fixed)
    vector dimension, ``groupBy(cluster, pos).avg`` — a single shuffle of
    k x dim x partitions partial sums (map-side combine), then a k x dim
    collect to the driver for the next iteration's literals;
  * the centroid state lives on the driver between iterations (k x dim
    doubles — tiny), exactly like the matcher-results split in SURVEY.md §1.2:
    big data stays distributed, small state stays local.

Scale: per iteration cost = one scan + one k*dim-wide shuffle, independent of
k*n pairings; at 100 TB the scan dominates and parallelizes linearly.  The
iteration count is bounded (``max_iter``) and convergence is measured by
centroid drift on the driver.

Determinism: init seeds on the vector with the smallest ``md5("id:seed")``
(engine-portable — the DuckDB oracle replays the same ordering verbatim,
unlike Spark-only xxhash64) then grows by farthest-point selection (id-tie-broken — order-independent);
averages are rounded to 9 dp each round so partition summation order cannot
drift the fixpoint.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

_CLUSTER = "cluster"


def _centroid_lits(centroids: List[List[float]]):
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def _dist_structs(vec_col, centroids: List[List[float]]):
    """``vec_col`` may be a column name or an arbitrary Column expression
    (pq.py reuses this for subvector slices — ONE definition of the
    distance fold and its oracle-load-bearing (dist, idx) tie-break)."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cents = _centroid_lits(centroids)
    return F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            i.alias("idx"),
        ),
    )


def _nearest_expr(vec_col: str, centroids: List[List[float]]):
    """Index of the nearest centroid (squared L2), as a JVM-only expression."""
    return F.array_min(_dist_structs(vec_col, centroids)).getField("idx")


def _min_dist_expr(vec_col: str, centroids: List[List[float]]):
    """Squared distance to the nearest current centroid (JVM expression)."""
    return F.array_min(_dist_structs(vec_col, centroids)).getField("dist")


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    tol: float = 1e-6,
    init: str = "farthest",
) -> Tuple[List[List[float]], int]:
    """Returns (centroids as k x dim floats, iterations run).

    ``init``: ``"farthest"`` (default) is the deterministic k-means++
    flavor the DuckDB oracle replays verbatim — k-1 sequential scans, fine
    for coarse IVF cell counts (k <= ~32) but quadratic-feeling at
    production codebook sizes; ``"hash"`` seeds all k centroids in ONE job
    (the k distinct vectors first in md5(id:seed) order — a deterministic
    uniform draw), the scale path for k_sub=256-class PQ training."""
    from pyspark import StorageLevel

    if init not in ("farthest", "hash"):
        raise ValueError(f"init must be 'farthest' or 'hash', got {init!r}")
    vecs = (
        df.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .persist(StorageLevel.MEMORY_AND_DISK)  # scanned per init pass + one per iteration
    )
    # engine-portable seed hash: md5 of "id:seed" orders identically in any
    # SQL engine (the DuckDB oracle replays this init verbatim), unlike
    # Spark-only xxhash64
    hash_order = (
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
        F.col(id_col),
    )
    if init == "hash":
        # one job: over-fetch 4k rows by hash order, dedupe identical
        # vectors driver-side, keep the first k distinct
        rows = vecs.orderBy(*hash_order).limit(4 * k).collect()
        centroids, seen = [], set()
        for r in rows:
            key = tuple(float(x) for x in r[vec_col])
            if key not in seen:
                seen.add(key)
                centroids.append(list(key))
                if len(centroids) == k:
                    break
        if len(centroids) < k:
            raise ValueError(
                f"need >= {k} distinct vectors to fit k={k} "
                f"(found {len(centroids)} among the first {4 * k} by hash)"
            )
    else:
        # farthest-point init (deterministic k-means++ flavor): seed point
        # by hash, then k-1 scans each adding the point farthest from the
        # current centroid set — avoids the merged-cluster local optimum a
        # pure random pick of k points is prone to.
        first = vecs.orderBy(*hash_order).limit(1).collect()
        if not first:
            raise ValueError(f"need >= {k} vectors to fit k={k}, got 0")
        centroids = [[float(x) for x in first[0][vec_col]]]
        while len(centroids) < k:
            far = (
                vecs.select(id_col, vec_col, _min_dist_expr(vec_col, centroids).alias("_d"))
                .orderBy(F.col("_d").desc(), F.col(id_col))
                .limit(1)
                .collect()
            )
            nxt = [float(x) for x in far[0][vec_col]]
            if far[0]["_d"] == 0.0 and any(nxt == c for c in centroids):
                raise ValueError(f"need >= {k} distinct vectors to fit k={k}")
            centroids.append(nxt)

    iters = 0
    for _ in range(max_iter):
        iters += 1
        assigned = vecs.withColumn(_CLUSTER, _nearest_expr(vec_col, centroids))
        means = (
            assigned.select(_CLUSTER, F.posexplode(vec_col).alias("pos", "x"))
            .groupBy(_CLUSTER, "pos")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty clusters keep position
        by_cluster: dict = {}
        for r in means:
            by_cluster.setdefault(r[_CLUSTER], {})[r["pos"]] = r["m"]
        for c, posmap in by_cluster.items():
            new_centroids[c] = [posmap[p] for p in sorted(posmap)]
        drift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if drift <= tol:
            break
    vecs.unpersist()
    return centroids, iters


def kmeans_assign(
    df: DataFrame,
    centroids: List[List[float]],
    vec_col: str = "embedding",
    out_col: str = _CLUSTER,
) -> DataFrame:
    """One JVM-expression pass adding the nearest-centroid index."""
    return df.withColumn(out_col, _nearest_expr(vec_col, centroids))


def kmeans_assign_multi(
    df: DataFrame,
    centroids: List[List[float]],
    vec_col: str = "embedding",
    out_col: str = _CLUSTER,
    nprobe: int = 1,
) -> DataFrame:
    """Explode each row into its ``nprobe`` NEAREST centroid indices — the
    multi-probe side of IVF search (probing neighbor cells recovers the
    recall a hard single-cell assignment loses at cell boundaries).  Still
    one JVM expression: sort the (dist, idx) structs, slice the first
    nprobe, explode."""
    sorted_structs = F.array_sort(_dist_structs(vec_col, centroids))
    probes = F.transform(F.slice(sorted_structs, 1, nprobe), lambda s: s.getField("idx"))
    return df.withColumn(out_col, F.explode(probes))


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 3,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: int = 42,
    # 0.0 = fixed round count (early-stop only at exactly-zero drift, where
    # further rounds are no-ops): keeps the engine round-for-round equal to
    # the DuckDB oracle's unconditional Lloyd replay even on inputs whose
    # drift dips below a nonzero tolerance mid-run
    tol: float = 0.0,
    nprobe: int = 1,
) -> DataFrame:
    """IVF with trained coarse centroids: join queries only against corpus
    vectors in the query's ``nprobe`` nearest Voronoi cells, then cosine
    top-k over the probed candidates.  Same output shape as
    ``similarity.ivf_topk`` (query_id, vec_id, score, rank); nprobe=1 is
    classic single-probe, nprobe=n_cells degenerates to exact search —
    the standard IVF recall/cost dial."""
    from pyspark.sql.window import Window

    from .similarity import _dot, _norm

    centroids, _ = kmeans_fit(
        corpus, k=n_cells, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
        seed=seed, tol=tol,
    )
    default_queries = queries is None
    if default_queries:
        queries = corpus.where(F.col(id_col) < 5)
        if queries.isEmpty():
            raise ValueError(
                f"default query set ({id_col} < 5) matched no rows (ids are "
                "not dense 0-based) - pass queries explicitly"
            )
    q = kmeans_assign_multi(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        centroids, vec_col="q_vec", out_col="_cell", nprobe=nprobe,
    )
    c = kmeans_assign(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec")),
        centroids, vec_col="c_vec", out_col="_cell",
    )
    # broadcast only the known-small default query set; a caller-supplied
    # query frame may be arbitrarily large, so let the planner pick the join
    # strategy from statistics instead of force-broadcasting past the
    # autoBroadcastJoinThreshold
    q_side = F.broadcast(q) if default_queries else q
    scored = (
        q_side
        .join(c, "_cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "score",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )
