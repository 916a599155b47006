"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB training-data pipeline needs:

- **Brute-force cosine top-k** — exact; the corpus×queries product is
  computed distributed with the small side broadcast. Vector math is
  pure column expressions (``zip_with`` + ``aggregate``), i.e.
  JVM-side codegen — no Python in the loop.
- **LSH-bucketed ANN** — random-hyperplane signatures block the
  corpus into buckets; queries probe only their own bucket(s).
  Sub-linear candidate sets at the cost of recall, the standard
  scale path when the corpus no longer fits a broadcast join.

An IVF variant (k-means coarse quantizer) is a natural later
extension; the bucketing interface is the same.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision, array order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_d(a: Column, b: Column) -> Column:
    """Dot product of two already-double arrays — hoist the per-element
    cast out of per-pair loops via :func:`_as_double`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries(query_id_col, vec_col)`` is broadcast (queries are the
    small side by construction); the per-partition top-k then global
    top-k is exactly what ``row_number`` over a partition-by-query
    window compiles to with AQE. Norms are precomputed per side so
    each pair costs one dot product.

    Returns ``query_id, vec_id, cosine, rank`` with rank 1..k.
    """
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cnorm"),
    )
    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        (_dot_d(F.col("__cvec"), F.col("__qvec")) / (F.col("__cnorm") * F.col("__qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def euclidean_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by squared Euclidean distance per query — the
    metric-matched baseline for :func:`pq_topk` recall gates (PQ's
    ADC approximates ``||q - x||²``, not cosine). Same shape as
    :func:`cosine_topk`: queries broadcast, squared norms precomputed
    per side so each pair costs one dot product
    (``||q-x||² = ||q||² + ||x||² - 2 q·x``).

    Returns ``query_id, vec_id, sq_dist, rank`` with rank 1..k
    (ties broken by ascending id, matching pq_topk's window)."""
    c = corpus.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__cvec"),
    ).withColumn("__cn", _dot_d(F.col("__cvec"), F.col("__cvec")))
    q = queries.select(
        F.col(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
    ).withColumn("__qn", _dot_d(F.col("__qvec"), F.col("__qvec")))
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        (
            F.col("__cn") + F.col("__qn")
            - 2.0 * _dot_d(F.col("__cvec"), F.col("__qvec"))
        ).alias("sq_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sq_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_signature(
    vec: Column, dim: int, planes: int, seed: int = 42
) -> Column:
    """Random-hyperplane LSH signature as an int: bit p = sign of the
    dot product with pseudo-random plane p. Plane components are
    derived from ``xxhash64(p, i, seed)`` mapped to [-1, 1] — fully
    deterministic, no plane table to ship.

    Built as ONE nested higher-order-function tree (r12): the
    original per-plane Python loop created ``planes`` separate
    aggregate Columns ≈ 30+ py4j lambda round-trips ≈ 0.7 s of plan
    construction per call at planes=16 (the r10 bounded-construction
    rule, measured with cProfile); this form is ~0.09 s to build and
    evaluates the same arithmetic (A/B: identical signatures on the
    sf0.1 corpus, exec equal-or-faster). The bit fold ORs
    ``shiftleft(1, p)`` over set bits — BITWISE, not an arithmetic
    ``acc + 2^p`` sum: the first r12 form doubled a running weight
    column inside the fold, and the final (unused) doubling computed
    ``2^planes``, which overflows bigint under ANSI mode for
    planes >= 63 — a crash the original per-plane ``shiftleft`` loop
    never had (caught by the r12 close-out review; pinned by the
    planes=64 round-trip test). Values are identical for every
    ``planes`` since the set-bit positions are distinct."""
    def plane_component(p: Column, i: Column) -> Column:
        h = F.xxhash64(p, i, F.lit(seed))
        return F.pmod(h, F.lit(2000001)).cast("double") / F.lit(1000000.0) - F.lit(1.0)

    def proj(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double") * plane_component(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, p: F.when(
            proj(p) > 0,
            acc.bitwiseOR(
                F.call_function("shiftleft", F.lit(1).cast("long"), p)
            ),
        ).otherwise(acc),
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    planes: int = 8,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: corpus and queries are bucketed by a
    ``planes``-bit hyperplane signature; candidates are same-bucket
    pairs only. With p planes the corpus splits into ≤2^p buckets, so
    the scored pairs shrink ~2^p× vs brute force.

    ``multiprobe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's signature (p extra probes — near-miss
    vectors usually differ by one hyperplane sign); ``multiprobe=2``
    extends to Hamming distance 2. Trades candidate volume for recall
    without touching the corpus layout; the probe expansion happens
    on the (small, broadcast) query side only.

    Recall reality check: hyperplane LSH exploits *angular
    concentration*. On isotropic (random) vectors the top-k
    neighbors' cosines barely exceed the bulk, so expected recall
    approaches the scanned corpus fraction — no sublinear method
    does better on structureless data. Choose planes/multiprobe for
    the clustering actually present in the corpus; the quality gate
    in the driver entry (`ann_recall_at_k`) makes the achieved
    recall an asserted, regression-checked number either way."""
    # ONE signature Column reused by both sides: Column objects are
    # immutable expression trees resolvable against any DataFrame
    # carrying ``vec_col``, and building the planes×dim HOF
    # expression costs ~0.3 s of py4j round-trips per build (r11
    # construct profile) — the r10 bounded-plan-construction
    # invariant applied to expression REUSE.
    sig = _hyperplane_signature(F.col(vec_col), dim, planes)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cnorm"),
        sig.alias("__bucket"),
    )
    probe_cols = [sig]
    if multiprobe >= 1:
        probe_cols += [sig.bitwiseXOR(F.lit(1 << b)) for b in range(planes)]
    if multiprobe >= 2:
        probe_cols += [
            sig.bitwiseXOR(F.lit((1 << a) | (1 << b)))
            for a in range(planes)
            for b in range(a + 1, planes)
        ]
    probes = F.array(*probe_cols)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
        F.explode(probes).alias("__bucket"),
    )
    # No dedup needed: a corpus row has exactly one bucket and a
    # query's probe buckets are distinct, so each (query, corpus)
    # pair matches at most once.
    scored = c.join(F.broadcast(q), on="__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("__cvec"), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_recall_at_k(
    ann: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    broadcast: bool = True,
) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact top-k:
    |ann ∩ exact| / k. Computed in-Spark (a semi-join + a count per
    query) so an ANN entry can ship a *quality gate* instead of raw
    approximate rows — the gate output is deterministic, hence
    oracle-checkable, while the raw ANN rows are not SQL-expressible.

    Size contract: with ``broadcast=True`` (the default) the
    ``exact`` frame and the per-query hit counts are broadcast-join
    build sides, bypassing ``autoBroadcastJoinThreshold``. Both are
    bounded at ``queries × k`` rows of ``(id, id)`` — fine for the
    typical thousands-of-queries evaluation, but a caller grading
    millions of queries at once must pass ``broadcast=False`` (the
    planner then picks the strategy from its own size estimates) or
    grade in query slices; a forced multi-GB broadcast can OOM the
    driver.

    Returns ``(query_id, recall_at_k)`` with one row per query in
    ``exact``."""
    # Explicit broadcasts (r15, guide §3.1): both build sides are
    # bounded at queries × k rows BY CONSTRUCTION (exact top-k, and
    # one count row per query), but neither carries usable size
    # statistics — ``exact`` is typically a collected local relation
    # or a windowed top-k, so the planner fell back to SortMergeJoin
    # with a full exchange pair per join over ≤50-row inputs
    # (ann_topk_gates carried 44 exchanges before this). The
    # ``broadcast`` flag (r16, r15 ADVICE) is the escape hatch for
    # callers outside the bounded-size contract above.
    _hint = F.broadcast if broadcast else (lambda df: df)
    hits = ann.join(
        _hint(exact.select(query_id_col, id_col)),
        on=[query_id_col, id_col],
        how="left_semi",
    )
    per_query = hits.groupBy(query_id_col).agg(
        F.count("*").alias("__n_hit")
    )
    # Denominator = the number of exact rows the query actually has
    # (min(k, corpus size)): dividing by a fixed k would understate
    # recall and fail a perfect ANN result whenever the corpus is
    # smaller than k.
    return (
        exact.groupBy(query_id_col)
        .agg(F.count("*").alias("__n_exact"))
        .join(_hint(per_query), on=query_id_col, how="left")
        .select(
            F.col(query_id_col),
            (
                F.coalesce(F.col("__n_hit"), F.lit(0)).cast("double")
                / F.least(F.col("__n_exact"), F.lit(k)).cast("double")
            ).alias("recall_at_k"),
        )
    )


def _local_pairs_df(spark, rows, ddl: str):
    """Small driver-built rows → a TRUE LocalRelation (r15):
    ``createDataFrame(rows, ddl)`` builds a defaultParallelism-
    partition pickled-Python RDD, so even under an explicit
    ``F.broadcast`` the broadcast BUILD ran ~32 Python-worker tasks
    for a 100-row probe table. Routing through a ``pyarrow.Table``
    plans a ``LocalTableScan`` — the broadcast builds driver-local
    with zero tasks. Values are bit-identical (arrow carries the
    same int64/float64 the Row path ships)."""
    from ..localrel import local_df

    return local_df(spark, ddl, rows)


def _train_spherical_kmeans(
    corpus: DataFrame,
    vec_col: str,
    nlist: int | None,
    sample_size: int,
    seed: int,
):
    """Driver-side spherical k-means on a bounded sample (constant
    driver memory regardless of corpus size): unit-normalize, 10
    Lloyd iterations with cosine assignment, re-normalized means.
    ``nlist=None`` → ``round(sqrt(n_sample))`` (FAISS rule of
    thumb). Returns the centroid matrix (list of unit vectors) to be
    shipped as literal arrays — shared by :func:`ivf_topk` and
    :func:`semantic_dedup`."""
    import numpy as np

    sample = np.array(
        [
            r[0]
            for r in corpus.select(vec_col).limit(sample_size).collect()
        ],
        dtype=np.float64,
    )
    # Lexicographic row sort makes training ORDER-insensitive: the
    # seeded init indexes into the sample, so without it a
    # repartitioned input (nondeterministic limit order) would yield
    # different centroids run-to-run. With it, any input whose
    # limit() captures the same row SET (always true when the corpus
    # fits sample_size) trains identical centroids. Past sample_size
    # the sampled set itself depends on scan order — documented
    # approximation, same as any bounded-sample trainer.
    if len(sample):
        sample = sample[np.lexsort(sample.T[::-1])]
    if nlist is None:
        nlist = max(4, int(round(math.sqrt(len(sample)))))
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sample / norms

    rng = np.random.RandomState(seed)
    centroids = unit[
        rng.choice(len(unit), size=min(nlist, len(unit)), replace=False)
    ]
    for _ in range(10):  # Lloyd iterations on the sample
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    centroids[c] = m / nrm
    return centroids


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int | None = None,
    sample_size: int = 10_000,
    seed: int = 42,
):
    """Public trainer for :func:`ivf_topk`'s coarse quantizer —
    identical to the in-call training (same bounded sample, same
    lexicographic order-insensitivity, same seed discipline), split
    out so pipelines that probe one corpus repeatedly can train once
    and pass ``centroids=`` (the result is a pure function of the
    sampled rows and the parameters)."""
    return _train_spherical_kmeans(
        corpus, vec_col, nlist, sample_size, seed
    )


def _assign_cells_arrow(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids,
    id_out: str,
    vec_out: str,
    cell_out: str,
    norm_out: str | None = None,
) -> DataFrame:
    """Coarse-quantizer cell assignment as an Arrow kernel: argmax of
    one numpy matmul against the centroid matrix per batch,
    optionally emitting the vector L2 norm in the same pass. The JVM
    HOF formulation evaluates nlist × dim lambda terms per row (the
    dominant cost of IVF/SemDeDup at sf5 — 40× slower, measured);
    ties break to the first maximal cell in both formulations."""
    cent_rows = [[float(x) for x in c] for c in centroids]

    def assign(batches):
        import numpy as np
        import pandas as pd

        cent = np.array(cent_rows, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            out = {
                id_out: pdf[id_col],
                vec_out: pdf[vec_col],
                cell_out: np.argmax(mat @ cent.T, axis=1).astype(
                    np.int32
                ),
            }
            if norm_out is not None:
                out[norm_out] = np.linalg.norm(mat, axis=1)
            yield pd.DataFrame(out)

    vec_type = df.schema[vec_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    fields = [f"{id_out} {id_type}", f"{vec_out} {vec_type}"]
    if norm_out is not None:
        fields.append(f"{norm_out} double")
    fields.append(f"{cell_out} int")
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        assign, schema=", ".join(fields)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    nlist: int | None = 16,
    nprobe: int | None = 2,
    sample_size: int = 10_000,
    seed: int = 42,
    centroids=None,
    query_rows=None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse
    quantizer partitions the corpus into ``nlist`` cells; each query
    scans only its ``nprobe`` nearest cells.

    The quantizer is trained driver-side on a bounded sample
    (``sample_size`` rows — constant driver memory regardless of
    corpus size) and shipped as literal centroid arrays; assignment
    is a JVM-side argmax over ``nlist`` dot products. The scan itself
    is a (cell-id) equi-join — at scale the corpus can additionally
    be *stored* partitioned by cell id so a probe prunes files.
    Recall/latency trades via ``nlist``/``nprobe``, exactly like
    FAISS IVF-Flat.

    ``nlist=None`` sizes the cell count from the training sample as
    ``round(sqrt(n_sample))`` (the FAISS rule of thumb), and
    ``nprobe=None`` probes HALF the cells — fixed constants tuned at
    one corpus size silently lose recall at another (the r6 sf1
    sweep caught nlist=8/nprobe=4, tuned on 2 k vectors, failing its
    recall gate at 20 k; a quarter-probe auto rule then failed at
    500 — half-probe holds recall ≥0.6 at every measured scale on
    heavily-overlapping clusters while still halving the scan).

    ``centroids`` accepts a pretrained quantizer (the matrix
    :func:`train_ivf_centroids` returns) and skips the in-call
    training — training is deterministic per (corpus, params), so
    callers probing the same corpus repeatedly memoize it (r10:
    the bench re-trained identical k-means every rep).

    ``query_rows`` accepts the query side pre-collected as
    ``[(query_id, vector), ...]`` rows and skips the in-call
    collect (r11: probe selection needs the query vectors on the
    driver either way, and a serving layer that already holds its
    query batch driver-side — or memoizes a fixed gate query set —
    shouldn't pay a Spark job to round-trip 5 rows; ~0.6 s of
    fixed per-call cost on this host). The cap applies identically."""
    import numpy as np

    if centroids is None:
        centroids = _train_spherical_kmeans(
            corpus, vec_col, nlist, sample_size, seed
        )
    if nprobe is None:
        nprobe = max(2, len(centroids) // 2)

    c = _assign_cells_arrow(
        corpus, id_col, vec_col, centroids,
        id_out=id_col, vec_out="__cvec", cell_out="__cell",
        norm_out="__cnorm",
    )
    # Each query probes its nprobe best cells. Probe SELECTION runs
    # driver-side in numpy over the collected (bounded, capped like
    # PQ's query side) query set: until r10 the probe scores were a
    # JVM expression over nlist literal centroid arrays — nlist × dim
    # `F.lit` Columns (6,400 py4j round-trips at nlist=100/dim=64,
    # ~3 s of pure PLAN CONSTRUCTION per call) evaluating nlist
    # zip_with/aggregate folds per query row. The selected (query,
    # cell) pairs become a small broadcast frame joined back to
    # `queries`, so every piece of float math on the SCORING path
    # (_dot/_norm/cosine) is untouched; only which cells get probed
    # is computed in numpy (dot products may differ from the JVM
    # fold in the last ulp on near-tied cells — the same class of
    # tie the JVM expression resolved arbitrarily-but-
    # deterministically, and the recall gates have margin by
    # design). Tie-break mirrors the old struct sort: descending
    # score, then descending cell index.
    # Bound the collect itself (limit before materializing) so an
    # oversized query side is rejected without ever shipping more
    # than CAP+1 rows to the driver — same pattern as pq_topk.
    qrows = query_rows
    if qrows is None:
        qrows = (
            queries.select(query_id_col, vec_col)
            .limit(PQ_QUERY_CAP + 1)
            .collect()
        )
    if len(qrows) > PQ_QUERY_CAP:
        raise ValueError(
            f"more than PQ_QUERY_CAP={PQ_QUERY_CAP} query vectors; "
            "ivf_topk collects the query side for probe selection — "
            "batch oversized query sets into several calls"
        )
    cent = np.asarray(
        [[float(x) for x in row] for row in centroids],
        dtype=np.float64,
    )
    cell_ids = np.arange(len(cent))
    probe_rows = []
    for r in qrows:
        scores = cent @ np.asarray(r[1], dtype=np.float64)
        order = np.lexsort((cell_ids, scores))[::-1][:nprobe]
        probe_rows.extend((r[0], int(ci)) for ci in order)
    spark = queries.sparkSession
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    probes = _local_pairs_df(
        spark, probe_rows, f"{query_id_col} {qid_type}, __cell int"
    )
    q = queries.join(F.broadcast(probes), query_id_col).select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qnorm"),
        F.col("__cell"),
    )
    scored = c.join(F.broadcast(q), on="__cell").select(
        F.col(query_id_col),
        F.col(id_col),
        (
            _dot(F.col("__cvec"), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_all_pairs_numpy(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via an Arrow-batched numpy
    kernel.

    The right side (full corpus) is broadcast as a dense float64
    matrix; the left side streams through ``mapInPandas``. The dot
    products are vectorized **across pairs** but accumulated
    **sequentially across dimensions** (``acc += A[:,i]·B[:,i]``), so
    every cosine is bit-identical to the JVM fold and to DuckDB's
    ``list_sum(list_transform(...))`` — the numpy path is a faster
    engine for the same arithmetic, not an approximation.

    Exact all-pairs is inherently O(n²); the broadcast bound
    (``max_broadcast_rows``) makes the applicability explicit —
    beyond it, use the LSH/IVF blocked variants.
    """
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    corpus = df.select(id_col, vec_col).collect()
    if len(corpus) > max_broadcast_rows:
        raise ValueError(
            f"corpus too large for exact all-pairs broadcast "
            f"({len(corpus)} > {max_broadcast_rows}); use "
            f"embedding_near_duplicates(planes>0) or ivf_topk"
        )
    ids = np.array([r[0] for r in corpus], dtype=np.int64)
    mat = np.array([r[1] for r in corpus], dtype=np.float64)
    dim = mat.shape[1]
    # Sequential-fold norms (bit-identical to the SQL _norm).
    nrm_acc = np.zeros(len(ids))
    for i in range(dim):
        nrm_acc += mat[:, i] * mat[:, i]
    norms = np.sqrt(nrm_acc)

    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    # Captured as a VALUE at call time (not a module-global lookup
    # inside the worker) so tests can patch it and the patched budget
    # provably ships in the serialized closure.
    block_entries = KERNEL_BLOCK_ENTRIES

    def kernel(batches):
        import pandas as pd

        r_ids, r_mat, r_norms = b_ids.value, b_mat.value, b_norms.value
        # Two large-corpus bounds, both measured in the r9 sf5 sweep
        # (100 k × 64 corpus), both invisible at bench scale:
        #
        # 1. MEMORY: the score matrix is (left rows × corpus)
        #    doubles, so an unchunked 10 k-row Arrow batch is ~8 GB
        #    per worker × 32 workers — a JVM OOM-kill, not a slow
        #    query. Left rows run in blocks sized so block × corpus
        #    stays ≤ ~256 MB regardless of corpus size; the block
        #    split only partitions the output rows.
        # 2. LAYOUT: the per-dimension accumulation reads COLUMN i
        #    of both matrices; on a row-major (n × dim) corpus that
        #    is a stride-dim gather per element, and at 100 k rows
        #    the strided reads fall out of cache — 32 workers
        #    measured ~17 Mops/s each (a ~20-minute stage for work
        #    that takes seconds contiguous). One transpose to
        #    (dim × n) C-order per worker makes every accumulation
        #    step a contiguous row read. Same accumulation order →
        #    bit-identical cosines.
        r_cols = np.ascontiguousarray(r_mat.T)
        # Two (block × corpus) doubles are live at peak — the
        # accumulating dots matrix plus one temporary (the per-dim
        # product while accumulating, then the norm-product
        # denominator; the division runs IN PLACE so no third
        # matrix ever exists) — so the block budget is split in two
        # to keep the documented bound a real per-worker peak, not
        # a per-allocation one (r9 review).
        block = max(1, block_entries // (2 * max(1, len(r_ids))))
        for pdf in batches:
            all_ids = pdf[id_col].to_numpy(dtype=np.int64)
            all_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if not len(all_ids):
                continue
            all_cols = np.ascontiguousarray(all_mat.T)
            for s in range(0, len(all_ids), block):
                l_ids = all_ids[s : s + block]
                l_cols = all_cols[:, s : s + block]
                l_acc = np.zeros(len(l_ids))
                for i in range(dim):
                    l_acc += l_cols[i] * l_cols[i]
                l_norms = np.sqrt(l_acc)
                dots = np.zeros((len(l_ids), len(r_ids)))
                for i in range(dim):
                    dots += l_cols[i][:, None] * r_cols[i][None, :]
                denom = l_norms[:, None] * r_norms[None, :]
                # In-place: same single division per element as
                # `dots / denom`, bit-identical values, no third
                # block × corpus allocation.
                np.divide(dots, denom, out=dots)
                del denom
                mask = (l_ids[:, None] < r_ids[None, :]) & (
                    dots >= threshold
                )
                li, ri = np.nonzero(mask)
                yield pd.DataFrame(
                    {
                        "id_a": l_ids[li],
                        "id_b": r_ids[ri],
                        "cosine": dots[li, ri],
                    }
                )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema=out_schema)


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 0,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup).

    ``planes=0`` does the exact self-join (quadratic — correctness
    oracle / small corpora; see :func:`embedding_all_pairs_numpy` for
    the Arrow-vectorized exact kernel). ``planes>0`` blocks by
    hyperplane signature first, the sub-quadratic scale path
    (high-cosine pairs agree on most hyperplane signs, so same-bucket
    blocking has high recall at tight thresholds). Returns
    ``id_a, id_b, cosine``."""
    base = df.select(
        F.col(id_col).alias("__id"),
        _as_double(F.col(vec_col)).alias("__vec"),
        _norm(F.col(vec_col)).alias("__norm"),
        *(
            [_hyperplane_signature(F.col(vec_col), dim, planes).alias("__bucket")]
            if planes
            else []
        ),
    )
    left = base.alias("l")
    right = base.alias("r")
    on = (
        [F.col("l.__bucket") == F.col("r.__bucket")]
        if planes
        else [F.lit(True)]
    )
    cond = on[0] & (F.col("l.__id") < F.col("r.__id"))
    return (
        left.join(right, cond)
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            (
                _dot_d(F.col("l.__vec"), F.col("r.__vec"))
                / (F.col("l.__norm") * F.col("r.__norm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


#: Target in-task bytes for one semantic_dedup cell's unit-vector
#: matrix (float64). Auto-nlist divides the corpus so the EXPECTED
#: cell sits under this; the hard cap below catches skewed cells.
SEMANTIC_CELL_TARGET_BYTES = 256 << 20


def semantic_dedup(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    nlist: int | None = None,
    sample_size: int = 10_000,
    seed: int = 42,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space with a spherical
    k-means coarse quantizer, then drop every row that has a
    semantically-near row (cosine ≥ ``threshold``) with a smaller id
    in the SAME cluster. Returns the surviving rows of ``df``.

    Shape at scale — the all-pairs comparison never happens:

    - the quantizer trains driver-side on a bounded sample
      (:func:`_train_spherical_kmeans`, same trainer as
      :func:`ivf_topk`) and ships as literal centroid arrays;
    - cell assignment is an in-row JVM argmax (zero shuffle);
    - the pairwise cosine check is a **cell-id equi-join** — cost is
      Σ|cell|², bounded by the quantizer granularity, never N²;
    - survivors come from ONE left-anti join of the corpus against
      the dropped-id set.

    Cell-size safety: one task holds one WHOLE cell (the kernel
    stacks the cell's vectors before the blocked matmul), so
    per-task memory is ``|cell| × dim`` float64s — it must be
    bounded deliberately, not hoped. ``nlist=None`` auto-sizes as
    ``max(√min(n, sample_size), ceil(n / target_cell_rows))`` where
    ``target_cell_rows`` keeps the expected cell matrix under
    :data:`SEMANTIC_CELL_TARGET_BYTES` (one corpus count job;
    capped at ``sample_size`` — more centroids than sample points
    is degenerate, raise ``sample_size`` for corpora needing finer
    quantization). Skew can still concentrate rows in one cell, so
    the kernel REFUSES cells above ``max_cell_rows`` (default 4×
    the target) with a loud error instead of OOMing an executor —
    the same disclosed-cap pattern as ``REBALANCE_GROUP_CAP`` and
    the exact-cosine kernel bound.

    Keep rule: deterministic min-id-wins (a row is dropped iff a
    similar same-cell row with a smaller id exists) — the same
    greedy convention as :func:`operators.dedup.dedup_exact`. This
    is NOT transitive grouping: in a chain a~b, b~c, a≁c, row c is
    dropped because of b even though b itself is dropped. For
    transitive survivor sets, feed the pair list from
    :func:`embedding_near_duplicates` (or this operator's inner
    join) into ``operators.components.dedup_connected`` instead.
    Approximation, inherited from the paper: near-duplicates that
    land in different cells are not compared — recall follows the
    quantizer, exactly like IVF probing.
    """
    target_rows = max(1024, SEMANTIC_CELL_TARGET_BYTES // (dim * 8))
    if nlist is None:
        n_corpus = df.count()
        by_sqrt = max(4, int(round(math.sqrt(min(n_corpus, sample_size)))))
        by_mem = -(-n_corpus // target_rows)  # ceil
        nlist = int(min(max(by_sqrt, by_mem), sample_size))
    if max_cell_rows is None:
        max_cell_rows = 4 * target_rows
    centroids = _train_spherical_kmeans(
        df, vec_col, nlist, sample_size, seed
    )
    # Cell assignment is ALSO an Arrow kernel (shared with
    # :func:`ivf_topk` — see :func:`_assign_cells_arrow` for the
    # 40×-at-sf5 measurement against the JVM HOF argmax).
    base = _assign_cells_arrow(
        df, id_col, vec_col, centroids,
        id_out="__id", vec_out="__vec", cell_out="__cell",
    )

    # Per-cell pairwise via an Arrow kernel, not an expression-level
    # self-join: the HOF dot product costs ~1 µs/pair-element while
    # the numpy matmul does the identical arithmetic vectorized
    # (measured ~5× faster end-to-end at sf0.1). One shuffle on the
    # 4-byte cell id; each task holds ONE WHOLE cell (|cell| × dim
    # float64s — the row-blocking below bounds the SIMS matrix, not
    # the cell itself), which is why auto-nlist targets a cell byte
    # budget and the kernel hard-refuses cells past max_cell_rows.
    BLOCK = 1024

    cell_cap = int(max_cell_rows)

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) > cell_cap:
            raise ValueError(
                f"semantic_dedup cell holds {len(pdf)} rows, above the "
                f"per-task cap {cell_cap} (~4x the "
                f"{SEMANTIC_CELL_TARGET_BYTES >> 20} MiB target at this "
                "dim). The quantizer is too coarse or the cell is "
                "skew-concentrated: raise nlist (and sample_size if "
                "nlist is at its cap), or raise max_cell_rows knowingly."
            )
        if len(pdf) < 2:
            return pd.DataFrame({"__dropped": np.array([], dtype=np.int64)})
        order = np.argsort(pdf["__id"].to_numpy())
        ids = pdf["__id"].to_numpy()[order]
        mat = np.stack(pdf["__vec"].to_numpy()[order]).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        dropped = []
        for lo in range(1, len(ids), BLOCK):
            hi = min(lo + BLOCK, len(ids))
            # rows lo..hi vs all STRICTLY EARLIER ids (min-id wins):
            # row lo+k may only match columns j < lo+k, expressed as
            # a vectorized per-row column cutoff — no Python loop.
            sims = unit[lo:hi] @ unit[:hi].T
            cutoff = (
                np.arange(hi)[None, :]
                < (lo + np.arange(hi - lo))[:, None]
            )
            hit = ((sims >= threshold) & cutoff).any(axis=1)
            dropped.append(ids[lo:hi][hit])
        return pd.DataFrame(
            {"__dropped": np.concatenate(dropped).astype(np.int64)}
            if dropped
            else {"__dropped": np.array([], dtype=np.int64)}
        )

    dropped = base.groupBy("__cell").applyInPandas(
        kernel, schema="__dropped long"
    )
    return df.join(
        dropped, df[id_col] == dropped["__dropped"], "left_anti"
    )


# ---------------------------------------------------------------------------
# Embedding storage / transform utilities
# ---------------------------------------------------------------------------
def normalize_embeddings(vec: Column) -> Column:
    """L2-normalize an ``array<float|double>`` in-row (zero-vector →
    unchanged zeros, not NaN). Normalized storage turns every cosine
    downstream into a plain dot product — at 100 TB you normalize
    ONCE at ingest, not per query."""
    n = _norm(vec)
    return F.when(n == 0.0, _as_double(vec)).otherwise(
        F.transform(vec, lambda x: x.cast("double") / n)
    )


def random_projection(
    vec: Column, out_dim: int, seed: int = 0
) -> Column:
    """Signed random projection to ``out_dim`` dims
    (Achlioptas/JL): ``y_j = Σ_i x_i · s_ij / √out_dim`` with
    ``s_ij = ±1`` derived from ``xxhash64(seed, j, i)`` — the
    projection matrix is never materialized ANYWHERE; every executor
    recomputes signs from the hash, so the operator is a pure in-row
    Column expression (deterministic on any cluster layout, zero
    shuffle, zero broadcast). O(d_in · d_out) per row, the JL price.

    Use it to shrink embeddings before LSH/IVF indexing or int8
    storage: Johnson–Lindenstrauss keeps pairwise geometry within
    ~1/√out_dim distortion."""
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    scale = 1.0 / (out_dim ** 0.5)
    sign = lambda j, i: (
        F.pmod(F.xxhash64(F.lit(seed), j, i), F.lit(2)) * 2 - 1
    ).cast("double")
    return F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * sign(j, i),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ) * F.lit(scale),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, out_col: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: each embedding stores
    as ``array<tinyint>`` codes plus one float scale
    (``x ≈ code · scale``, scale = max|x|/127) — 4× smaller at rest,
    which at 100 TB of embeddings is the difference between one
    copy and four. Adds ``<out_col>_codes`` and ``<out_col>_scale``;
    round-trip error ≤ scale/2 per component
    (:func:`dequantize_embeddings` restores doubles)."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    codes = F.transform(
        v, lambda x: F.round(x.cast("double") / scale).cast("tinyint")
    )
    return df.withColumn(f"{out_col}_codes", codes).withColumn(
        f"{out_col}_scale", scale.cast("float")
    )


def dequantize_embeddings(codes: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_embeddings`:
    ``array<double> = codes · scale``."""
    return F.transform(
        codes, lambda c: c.cast("double") * scale.cast("double")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search")
# ---------------------------------------------------------------------------
# pq_topk collects + broadcasts the query side (serving asymmetry).
# 100k queries × dim 384 float64 ≈ 300 MB of LUTs per executor — past
# this, batch the queries into several calls instead.
PQ_QUERY_CAP = 100_000

#: Per-worker score/distance matrix budget for the Arrow kernels
#: (all-pairs cosine, PQ ADC): blocks are sized so a single
#: (rows × corpus) or (queries × rows) double matrix stays at or
#: under this many ENTRIES × 8 bytes (~256 MB). Patchable small in
#: tests to exercise the blocking paths at toy sizes.
KERNEL_BLOCK_ENTRIES = 32 << 20


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 256,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
):
    """Train product-quantization codebooks: the vector splits into
    ``m`` contiguous subspaces of ``dim/m`` components, each
    quantized by its own ``k``-centroid Lloyd k-means trained on a
    driver-side bounded sample (constant driver memory, the same
    sample discipline as :func:`_train_spherical_kmeans`, including
    the lexicographic sample sort that makes training input-order
    insensitive). Returns a ``(m, k, dim//m)`` float64 numpy array —
    ~``m·k·dim/m·8`` bytes, shipped by closure/broadcast.

    Storage math: a vector stores as ``m`` uint8 codes instead of
    ``dim`` float32s — 384 float32s (1536 B) → 8 B at m=8, a 192×
    at-rest compression, the difference between keeping one copy of
    a 100 TB embedding store and keeping none."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if not 1 < k <= 256:
        raise ValueError("k must be in (1, 256] (codes are one byte)")
    sub = dim // m
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_size).collect()],
        dtype=np.float64,
    )
    if len(sample) == 0:
        raise ValueError("empty training sample")
    sample = sample[np.lexsort(sample.T[::-1])]
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
        if len(cents) < k:  # tiny sample: pad by repeating
            cents = np.concatenate(
                [cents, cents[rng.choice(len(cents), k - len(cents))]]
            )
        for _ in range(iters):
            # ||x-c||² argmin needs only -2x·c + ||c||² (matmul form —
            # the naive (n,k,sub) broadcast temp was ~30× slower at a
            # 10k sample without changing a single assignment).
            d = (cents**2).sum(-1)[None, :] - 2.0 * (x @ cents.T)
            assign = d.argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(0)
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks,
) -> DataFrame:
    """Encode every vector to its ``m`` nearest-centroid codes —
    ``(id, codes array<smallint>)``. An Arrow ``mapInPandas`` kernel
    (argmin over the codebook is a numpy matmul; per-task memory is
    one batch plus the small codebook, which ships by closure)."""
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = books.shape
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, codes array<smallint>"

    def gen(batches):
        import pandas as pd

        # ||x - c||² = ||x||² - 2x·c + ||c||²; per-subspace argmin
        # needs only the cross and centroid terms.
        cnorm = (books**2).sum(-1)  # (m, k)
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(vecs), m), dtype=np.int16)
            for j in range(m):
                x = vecs[:, j * sub : (j + 1) * sub]
                d = cnorm[j][None, :] - 2.0 * (x @ books[j].T)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    query_rows=None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query builds one
    ``(m, k_codes)`` lookup table of exact subspace distances to the
    centroids, then every stored vector scores as ``m`` table
    lookups summed — no decode, no float vectors read. Queries
    broadcast (the standard serving asymmetry: the corpus codes are
    huge and stay put). Returns
    ``(query_id, id, approx_sq_dist, rank)``.

    Scale bounds: the query side is driver-collected, so it is gated
    at ``PQ_QUERY_CAP`` rows with a loud error past it (the
    ``REBALANCE_GROUP_CAP`` pattern from :mod:`operators.mixing`) —
    an oversized query batch should run as several calls or flip the
    asymmetry. Each scored Arrow batch emits only its LOCAL top-k
    per query — ``np.argpartition`` on distance (O(n)), then a
    lexsort over just the k survivors plus boundary-distance ties
    for the (dist, id) tie-break — so the shuffle into the final
    window is ``nq × k`` rows per Arrow batch, never ``nq × n``."""
    import numpy as np

    books = np.asarray(codebooks, dtype=np.float64)
    m, kc, sub = books.shape
    # ``query_rows``: pre-collected [(query_id, vector), ...] skips
    # the in-call collect — same serving-cache rationale as
    # ivf_topk's parameter; the cap check applies identically.
    qrows = query_rows
    if qrows is None:
        qrows = queries.select(query_id_col, vec_col).limit(
            PQ_QUERY_CAP + 1
        ).collect()
    if not qrows:
        raise ValueError("no query vectors")
    if len(qrows) > PQ_QUERY_CAP:
        raise ValueError(
            f"more than PQ_QUERY_CAP={PQ_QUERY_CAP} query vectors; "
            "pq_topk collects + broadcasts the query side — batch "
            "oversized query sets into several calls"
        )
    qids = [r[0] for r in qrows]
    qv = np.stack([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # (nq, m, kc) exact subspace distance tables.
    luts = np.stack(
        [
            ((qv[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None])
             ** 2).sum(-1)
            for j in range(m)
        ],
        axis=1,
    )
    id_type = codes_df.schema[id_col].dataType.simpleString()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    out_schema = (
        f"{query_id_col} {qid_type}, {id_col} {id_type}, "
        "approx_sq_dist double"
    )

    block_entries = KERNEL_BLOCK_ENTRIES  # value-captured (testable)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            n = len(codes)
            kk = min(k, n)
            ids = pdf[id_col].to_numpy()
            # Query-block memory bound (r9, the all-pairs-kernel
            # lesson applied here before it bites): dist is
            # (queries × batch rows) doubles, and the query side is
            # allowed up to PQ_QUERY_CAP=100 k — unblocked, a 10 k-row
            # Arrow batch would allocate ~8 GB per worker. The budget
            # is HALVED because the accumulation loop's per-
            # subquantizer LUT gather materializes a second
            # (qblock × n) temporary alongside d — the true peak is
            # two blocks, exactly the reason embedding_all_pairs_numpy
            # halves its own budget (r10 advisory). Each block emits
            # its own local top-k rows, identical to the unblocked
            # output.
            qblock = max(1, block_entries // (2 * max(1, n)))
            for q0 in range(0, len(qids), qblock):
                luts_b = luts[q0 : q0 + qblock]
                nqb = len(luts_b)
                # dist[q, i] = Σ_j lut[q, j, codes[i, j]]
                d = np.zeros((nqb, n))
                for j in range(m):
                    d += luts_b[:, j, :][:, codes[:, j]]
                # Local top-k per query: only k candidate rows per
                # query leave this batch (final ranking is the
                # window). argpartition finds the k smallest
                # distances in O(n); the lexsort tie-break then runs
                # over only those k plus any rows TIED with the
                # boundary distance — ties can straddle the
                # argpartition cut with arbitrary ids, and the
                # global window breaks them by id, so the candidate
                # set must include every boundary-tied row.
                sel = []
                for q in range(nqb):
                    dq = d[q]
                    if n > kk:
                        part = np.argpartition(dq, kk - 1)[:kk]
                        cand = np.flatnonzero(dq <= dq[part].max())
                    else:
                        cand = np.arange(n)
                    sel.append(
                        cand[np.lexsort((ids[cand], dq[cand]))][:kk]
                    )
                idx = np.stack(sel)
                rows = {
                    query_id_col: np.repeat(
                        np.asarray(qids[q0 : q0 + qblock]), kk
                    ),
                    id_col: ids[idx].reshape(-1),
                    "approx_sq_dist": np.take_along_axis(
                        d, idx, axis=1
                    ).reshape(-1),
                }
                yield pd.DataFrame(rows)

    scored = codes_df.select(id_col, "codes").mapInPandas(gen, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_sq_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
