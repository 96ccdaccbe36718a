"""Product quantization (PQ) over an embedding column — the memory-bound
half of the classic IVF-PQ ANN stack (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — public method, original
implementation): vectors are split into ``m`` subvectors, each subspace gets
its own small k-means codebook, and every vector compresses to ``m`` small
codes (bytes at k<=256).  Distances are then computed against the CODES with
per-query lookup tables (asymmetric distance computation, ADC) — the scan
touches m bytes per vector instead of dim floats, which is what makes
100-TB-scale ANN memory-feasible (a 64-dim float32 corpus compresses 64x at
m=4/k=256... here k is tiny for oracle-replayability, the shapes are what
matter).

Spark-first shape, reusing the deterministic ``kmeans.py`` machinery:

* **train** (``pq_train``): one ``kmeans_fit`` per subspace over a sliced
  view (``slice(embedding, lo, len)``) — m independent small fits, each a
  bounded number of scans; codebooks live on the driver (m*k*dim/m = k*dim
  doubles — tiny, exactly the matcher-results split of SURVEY.md §1.2);
* **encode** (``pq_encode``): ONE JVM expression — per subspace an
  argmin-of-squared-distance fold against literal centroids, assembled with
  ``F.array`` — zero shuffle, whole-stage codegen, never per-row Python;
* **search** (``pq_topk``): queries are a driver-scale set (same contract as
  ``similarity.cosine_topk``); each query's m x k ADC table is computed on
  the driver (m*k doubles) and inlined as ONE literal array-of-structs over
  all queries, exploded against the encoded corpus — the scan reads ONLY
  the codes column (column pruning drops the raw embedding), scores with a
  2-level ``element_at`` lookup fold, and takes per-query top-k with the
  standard window.  No crossJoin of raw vectors anywhere.

Determinism / oracle: every stage is engine-portable — ``kmeans_fit`` is
already md5-seeded + 9-dp-rounded per round; code assignment tie-breaks on
the centroid index; ADC distances are exact double arithmetic rounded to
6 dp at the end.  The DuckDB oracle replays the ENTIRE pipeline (per-
subspace k-means as unrolled CTEs over list slices, encoding, table
lookups) and the driver hash-compare passes — see
``__spark_entry__._pq_oracle_sql``.

ADC returns APPROXIMATE squared L2: ||q - x||^2 ~= sum_j ||q_j - c_j(x)||^2
(exact iff x equals its reconstruction).  Ranking quality degrades
gracefully with k/m — the standard PQ tradeoff; the tests pin recall
against exact search on separable fixtures rather than pretending equality.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .kmeans import kmeans_fit

Codebooks = List[List[List[float]]]  # [subspace][centroid][dim/m]


def _subslice(vec_col: str, j: int, sub_dim: int):
    return F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim)


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 3,
    seed: int = 42,
    init: str = "farthest",
) -> Codebooks:
    """Fit one k-centroid codebook per subspace.  ``dim`` must be divisible
    by ``m`` (classic PQ; padding variants exist but hide the semantics).

    ``init="farthest"`` (default) is the oracle-replayable k-means++ flavor
    — right for oracle-sized k; production codebooks (k=256) should pass
    ``init="hash"`` (one seeding job instead of k-1 sequential scans) and
    train on a deterministic sample of the corpus, the standard PQ practice
    (codebooks generalize).  Measured at 1 M×64d (BENCH/BASELINE.md §3c-r4):
    the k=256 arm indexes 2.4× faster than farthest-init k=16 and retrieves
    neighbors whose TRUE cosine is within 0.9 % of the exact top-k
    (sim_ratio 0.991, cluster-recall 1.0) at a 42× smaller scan footprint;
    exact-rank overlap is corpus-bound there (near-tie clusters), not an
    index property — see the honest discussion in that section."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books: Codebooks = []
    for j in range(m):
        sliced = corpus.select(
            F.col(id_col), _subslice(vec_col, j, sub).alias(vec_col)
        )
        centroids, _ = kmeans_fit(
            sliced, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
            seed=seed, tol=0.0,  # fixed round count: oracle replays exactly
            init=init,
        )
        books.append(centroids)
    return books


def pq_encode(
    df: DataFrame,
    codebooks: Codebooks,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """codes = array<int> of length m; one JVM expression, no shuffle."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = F.array(
        *[
            _nearest_expr_on(_subslice(vec_col, j, sub), codebooks[j])
            for j in range(m)
        ]
    )
    return df.withColumn(out_col, codes)


def pq_encode_arrow(
    df: DataFrame,
    codebooks: Codebooks,
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Arrow-vectorized encode — the production-codebook path.  The
    expression encode above builds O(m * k * sub) codegen terms per row:
    ideal at oracle sizes (k=16), but at k_sub=256 the generated method
    blows past JIT limits and falls back to interpreted evaluation.  This
    variant ships the codebooks to executors once (broadcast via closure,
    k*dim floats) and lets numpy do the (batch, k) argmin per subspace —
    one Arrow-batched pandas UDF, no per-row Python, same tie-break
    (first minimal index) as the expression form."""
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]  # k x sub

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch: tolist() gives shape (0,)
            return pd.Series([], dtype=object)
        X = np.array(v.tolist(), dtype=np.float64)  # batch x dim
        codes = np.empty((len(X), m), dtype=np.int32)
        for j, B in enumerate(books):
            S = X[:, j * sub : (j + 1) * sub]
            # per-centroid (S - b)^2 sums, NOT the expanded
            # ||s||^2 - 2 s.b + ||b||^2 form: expansion suffers catastrophic
            # cancellation near a centroid, and a near-tie could then argmin
            # to a DIFFERENT code than the expression path's exact
            # difference fold — the two encode paths (and the DuckDB oracle
            # replay) must agree.  k_sub differences of small matrices cost
            # about the same as the expanded GEMM at these sizes.
            d = np.empty((len(S), len(B)), dtype=np.float64)
            for ci in range(len(B)):
                diff = S - B[ci]
                d[:, ci] = (diff * diff).sum(axis=1)
            codes[:, j] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, _enc(F.col(vec_col)))


def _nearest_expr_on(vec_expr, centroids: List[List[float]]):
    """``kmeans._nearest_expr`` over an arbitrary column expr — delegates
    to the single shared distance-fold definition (a local copy diverged
    once; the (dist, idx) tie-break is oracle-load-bearing)."""
    from .kmeans import _dist_structs

    return F.array_min(_dist_structs(vec_expr, centroids)).getField("idx")


def _adc_table(q_vec: List[float], codebooks: Codebooks) -> List[List[float]]:
    """m x k per-query lookup table: exact double arithmetic, sequential
    over the subvector (the same element order the SQL oracle sums in)."""
    m, sub = len(codebooks), len(codebooks[0][0])
    table = []
    for j in range(m):
        qj = q_vec[j * sub:(j + 1) * sub]
        row = []
        for c in codebooks[j]:
            acc = 0.0
            for a, b in zip(qj, c):
                acc += (float(a) - b) * (float(a) - b)
            row.append(acc)
        table.append(row)
    return table


def _adc_scan(encoded: DataFrame, qstructs, k: int, match_cell: bool) -> DataFrame:
    """The shared ADC search tail of ``pq_topk`` / ``ivfpq_topk``: explode
    the per-query (table[, cell]) literals against the encoded corpus,
    score by the code-indexed lookup fold rounded to 6 dp, take per-query
    top-k ascending (ties broken by vec_id).  Kept in ONE place so a
    rounding/tie-break change can never drift between the two search
    paths."""
    from pyspark.sql.window import Window

    pred = F.col("q.query_id") != F.col("vec_id")
    if match_cell:
        pred = pred & (F.col("q._cell") == F.col("_cell"))
    scored = (
        encoded.withColumn("q", F.explode(qstructs))
        .where(pred)
        .select(
            F.col("q.query_id").alias("query_id"),
            "vec_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("pq_codes"),
                        F.col("q.tbl"),
                        lambda code, trow: F.element_at(trow, code + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 3,
    m: int = 4,
    k_sub: int = 4,
    dim: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, adc_dist, rank), rank by ascending
    approximate squared L2.  ``queries`` is a driver-scale set by contract
    (default: corpus rows with id < 5, mirroring ``cosine_topk``)."""
    if dim is None:
        first = corpus.select(F.size(vec_col)).where(F.col(vec_col).isNotNull()).first()
        if first is None:
            raise ValueError(
                f"corpus has no non-null {vec_col!r} vectors to infer dim from "
                "- pass dim explicitly or supply a non-empty corpus"
            )
        dim = int(first[0])
    books = pq_train(
        corpus, dim, m=m, k=k_sub, id_col=id_col, vec_col=vec_col,
        max_iter=max_iter, seed=seed,
    )
    encoded = pq_encode(
        corpus.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("vec_id"), vec_col),
        books,
    ).select("vec_id", "pq_codes")

    default_queries = queries is None
    if default_queries:
        queries = corpus.where(F.col(id_col) < 5)
    queries = queries.where(F.col(vec_col).isNotNull())
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).collect()  # driver-scale by contract (an ADC table per query is inlined)
    if default_queries and not q_rows:
        raise ValueError(
            f"default query set ({id_col} < 5) matched no rows (ids are not "
            "dense 0-based) - pass queries explicitly"
        )
    qtables = F.array(
        *[
            F.struct(
                F.lit(r["query_id"]).alias("query_id"),  # raw: ids may be strings
                F.array(
                    *[
                        F.array(*[F.lit(d) for d in row])
                        for row in _adc_table([float(x) for x in r["q_vec"]], books)
                    ]
                ).alias("tbl"),
            )
            for r in q_rows
        ]
    )
    # scan reads ONLY (vec_id, pq_codes); the per-query score is a pure
    # lookup fold over m codes — the PQ promise made literal in the plan
    return _adc_scan(encoded, qtables, k, match_cell=False)


def ivfpq_topk(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 3,
    n_cells: int = 8,
    m: int = 4,
    k_sub: int = 4,
    nprobe: int = 1,
    dim: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 3,
    cells_max_iter: int = 5,
    seed: int = 42,
) -> DataFrame:
    """The composed IVF-PQ stack (the canonical billion-scale ANN layout):
    coarse k-means cells prune the candidate set (only the query's
    ``nprobe`` nearest Voronoi cells are scanned — ``kmeans.py``), and
    within the probed cells distance is computed against PQ CODES via the
    per-query ADC table (``pq_topk``'s scan, restricted by a cell
    equi-join).  At 100 TB this is: read m bytes/vector for 1/n_cells of
    the corpus per probe, zero raw-embedding IO on the search path.

    Codebooks here quantize the RAW vectors (not residuals): residual
    encoding (Jégou et al. §IV) improves recall but couples the codebooks
    to the coarse cells; the deterministic, independently-oracled layers
    are kept orthogonal so the DuckDB oracle replays cells and codebooks
    as the same two certified chains joined on cell — see
    ``__spark_entry__._ivfpq_oracle_sql``."""
    from .kmeans import kmeans_assign, kmeans_assign_multi, kmeans_fit

    if dim is None:
        first = corpus.select(F.size(vec_col)).where(F.col(vec_col).isNotNull()).first()
        if first is None:
            raise ValueError(
                f"corpus has no non-null {vec_col!r} vectors to infer dim from "
                "- pass dim explicitly or supply a non-empty corpus"
            )
        dim = int(first[0])
    corpus = corpus.where(F.col(vec_col).isNotNull())
    cells, _ = kmeans_fit(
        corpus, k=n_cells, max_iter=cells_max_iter, id_col=id_col,
        vec_col=vec_col, seed=seed,
        tol=0.0,  # fixed round count: the oracle replays exactly this many
    )
    books = pq_train(
        corpus, dim, m=m, k=k_sub, id_col=id_col, vec_col=vec_col,
        max_iter=max_iter, seed=seed,
    )
    encoded = kmeans_assign(
        pq_encode(corpus.select(F.col(id_col).alias("vec_id"), vec_col), books),
        cells, vec_col=vec_col, out_col="_cell",
    ).select("vec_id", "_cell", "pq_codes")

    default_queries = queries is None
    if default_queries:
        queries = corpus.where(F.col(id_col) < 5)
    queries = queries.where(F.col(vec_col).isNotNull())
    q_assigned = kmeans_assign_multi(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        cells, vec_col="q_vec", out_col="_cell", nprobe=nprobe,
    )
    q_rows = q_assigned.collect()  # driver-scale by contract (ADC literals)
    if default_queries and not q_rows:
        raise ValueError(
            f"default query set ({id_col} < 5) matched no rows (ids are not "
            "dense 0-based) - pass queries explicitly"
        )
    tables = {}
    probes = []
    for r in q_rows:
        qid = r["query_id"]  # raw: ids may be strings
        if qid not in tables:
            tables[qid] = _adc_table([float(x) for x in r["q_vec"]], books)
        probes.append((qid, int(r["_cell"])))
    qstructs = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.lit(cell).alias("_cell"),
                F.array(
                    *[F.array(*[F.lit(d) for d in row]) for row in tables[qid]]
                ).alias("tbl"),
            )
            for qid, cell in probes
        ]
    )
    return _adc_scan(encoded, qstructs, k, match_cell=True)
