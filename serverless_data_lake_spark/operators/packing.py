"""Sequence packing — mapping a curated corpus onto fixed-capacity
training sequences (context windows).

The last step of a pre-training data pipeline: documents are
concatenated in a deterministic order and the token stream is cut
every ``capacity`` tokens (GPT-2/3-style concat-and-chunk packing;
Brown et al. 2020 §2.3 train on such packed sequences, documents
separated by an EOT token and windows filled to capacity). The
engine-side job is the offset arithmetic: each document's START
position in the global token stream, from which its chunk
assignment, intra-chunk offset and boundary spans all follow in-row.

Scale shape — the global running sum is THE trap here. The naive
spelling, ``SUM(n_tokens) OVER (ORDER BY id)`` with no PARTITION BY,
serializes the whole corpus through ONE window task; at 10⁹
documents that is the job. This implementation is a distributed
prefix sum instead:

1. ``approxQuantile`` picks ``buckets`` id-range split points (one
   cheap sketch pass — any split set gives IDENTICAL offsets, the
   quantiles only balance the buckets);
2. per-bucket token totals — a tiny ``groupBy`` (≤ ``buckets``
   rows) collected once and prefix-summed on the driver;
3. the within-bucket running sum is a window PARTITIONED BY bucket —
   ``buckets``-way parallel, bounded rows per task — plus the
   broadcast per-bucket base.

Total cost: one sketch pass, one map-side-combined micro-aggregate,
one keyed window. No global ordering ever materializes on a single
task. Offsets depend only on (id order, token counts), so the result
is deterministic under any partitioning or cluster size.

Below :data:`SINGLE_WINDOW_MAX_ROWS` none of that machinery pays for
itself: the projected rows are tiny, so a single global-order window
(one job, no barrier, no sketch, no driver collect) wins outright —
and yields bit-identical offsets by the split-set invariance above.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from serverless_data_lake_spark.operators.text import token_count

#: Below this row count the whole prefix sum runs as ONE global-order
#: window: the projected rows are ~24 bytes each, so a single task
#: sorts ≤ ~50 MB — cheaper than the distributed path's extra jobs
#: (quantile sketch + per-bucket totals + materialization barrier).
#: Offsets are identical either way (the docstring's split-set
#: invariance), so this is purely a job-count fast path.
SINGLE_WINDOW_MAX_ROWS = 2_000_000


def pack_sequences(
    df: DataFrame,
    id_col: str,
    capacity: int,
    text_col: str | None = "text",
    n_tokens_col: str | None = None,
    buckets: int = 256,
    order_col: str | None = None,
    shuffle_salt: str | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Assign every document its position in the packed token
    stream: documents are laid out in ascending ``id_col`` order
    (ids must be unique — they define the canonical corpus order)
    and cut into ``capacity``-token training sequences.

    ``token_mode`` selects the budget the ``capacity`` is measured
    in: ``whitespace`` (JVM-side words, the default), ``regex``
    (SQL-expressible piece proxy), or ``bpe`` — REAL subword tokens
    against the shipped frozen vocabulary (:mod:`operators.bpe`,
    Arrow-batched UDF), making context-window capacities mean what
    a trainer means by them. Ignored when ``n_tokens_col`` supplies
    precomputed counts.

    Trainers usually want documents SHUFFLED, not in corpus order:
    pass ``shuffle_salt`` to lay them out by ``xxhash64(salt, id)``
    instead — a deterministic pseudo-random permutation (change the
    salt, get an independent epoch order), same distributed prefix
    sum underneath. ``order_col`` orders by an arbitrary existing
    column (ties broken by id, so non-unique order values stay
    deterministic). The two are mutually exclusive.

    Token counts come from ``n_tokens_col`` if given, else
    whitespace :func:`~operators.text.token_count` over ``text_col``.
    Zero-token documents occupy no stream positions and are dropped.

    Returns one row per surviving document::

        (id, n_tokens, start_offset, chunk_id, chunk_offset,
         chunk_last, n_chunks)

    ``chunk_id`` is the training sequence containing the document's
    first token, ``chunk_offset`` its position inside it,
    ``chunk_last`` the sequence containing its final token, and
    ``n_chunks`` how many sequences it spans (>1 = the document
    crosses a context-window boundary and will be split).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if order_col is not None and shuffle_salt is not None:
        raise ValueError("pass at most one of order_col / shuffle_salt")
    if shuffle_salt is not None:
        order = F.xxhash64(F.lit(shuffle_salt), F.col(id_col))
    elif order_col is not None:
        order = F.col(order_col)
    else:
        order = F.col(id_col)
    if n_tokens_col is not None:
        n = F.col(n_tokens_col).cast("bigint")
    else:
        n = token_count(F.col(text_col), token_mode).cast("bigint")
    proj = df.select(F.col(id_col), order.alias("__o"), n.alias("__n"))

    # Small-corpus fast path: ONE global-order window, zero extra
    # jobs. The count is over the INPUT df (column-pruned — parquet
    # scans answer it from footer stats); callers whose df hides an
    # expensive lineage should persist upstream, as with any
    # multi-action operator. Zero-token documents ride through the
    # running sum (they add 0 — offsets are unchanged) and drop at
    # the end, so tokenization stays single-evaluation: a filter on
    # __n BEFORE the window would be pushed below the projection and
    # re-evaluate token_count inside the predicate (measured 2×, see
    # text.py:203 for the general trap); a filter on the window
    # output cannot cross the window boundary.
    if buckets == 1 or df.count() <= SINGLE_WINDOW_MAX_ROWS:
        w1 = (
            Window.orderBy(F.col("__o").asc(), F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            proj.withColumn("__cum", F.sum("__n").over(w1))
            .filter(F.col("__n") > 0)
            .select(
                F.col(id_col),
                F.col("__n").alias("n_tokens"),
                (F.col("__cum") - F.col("__n")).alias("start_offset"),
            )
        )
        return _chunk_columns(out, id_col, capacity)

    # Tokenize ONCE: the distributed path runs two jobs over this
    # projection (per-bucket totals, final window); without a
    # materialization barrier each would re-parse every document's
    # text. persist() keeps the codegen'd columnar path — measured
    # ~6× cheaper than an eager localCheckpoint's RDD round-trip
    # (pipeline/curation.py:26). The persisted rows are ~24 bytes
    # each — at 10⁹ docs ~24 GB across the cluster, the deliberate
    # trade against 2× the corpus tokenization; blocks release when
    # the DataFrame is garbage-collected (ContextCleaner), same
    # lineage pattern as the components.py closure.
    # Zero-token drop AFTER the barrier: a filter on the __n alias
    # would be pushed below the projection and re-evaluate the
    # tokenization inside the predicate (2× the pass); filtering the
    # persisted rows costs nothing.
    base = proj.persist(StorageLevel.MEMORY_AND_DISK).filter(
        F.col("__n") > 0
    )

    # 1. Split points: any set yields the same offsets; quantiles
    # only balance bucket sizes. Duplicates (skewed ids) collapse.
    # __o is id-derived (never text), so this sketch pass prunes the
    # text column entirely; it doubles as the persist materializer.
    probs = [i / buckets for i in range(1, buckets)]
    qs = base.approxQuantile("__o", probs, 0.001)
    splits = sorted(set(qs))
    if splits:
        split_arr = F.array(*[F.lit(float(s)) for s in splits])
        bucket = F.size(
            F.filter(
                split_arr, lambda s: s < F.col("__o").cast("double")
            )
        )
    else:
        bucket = F.lit(0)
    bucketed = base.withColumn("__b", bucket)

    # 2. Per-bucket totals -> driver-side exclusive prefix ->
    # broadcast base table (<= buckets rows).
    totals = (
        bucketed.groupBy("__b").agg(F.sum("__n").alias("__t")).collect()
    )
    acc = 0
    bases = []
    for row in sorted(totals, key=lambda r: r["__b"]):
        bases.append((row["__b"], acc))
        acc += row["__t"]
    # LocalRelation, not createDataFrame(rows) (r15): the bucket-base
    # table is ≤ `buckets` rows; the RDD form cost one Python-worker
    # task per default partition on every scan and carried no size
    # stats for the join back. See localrel.local_df.
    from ..localrel import local_df

    base_df = local_df(
        df.sparkSession, "__b int, __base bigint", bases
    )

    # 3. Within-bucket running sum, buckets-way parallel (id breaks
    # order ties deterministically).
    w = (
        Window.partitionBy("__b")
        .orderBy(F.col("__o").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("__n").over(w)
    start = (F.col("__base") + cum - F.col("__n")).alias("start_offset")
    out = (
        bucketed.join(F.broadcast(base_df), "__b")
        .select(F.col(id_col), F.col("__n").alias("n_tokens"), start)
    )
    return _chunk_columns(out, id_col, capacity)


def _chunk_columns(out: DataFrame, id_col: str, capacity: int) -> DataFrame:
    """Derive the chunk-assignment columns from ``start_offset`` /
    ``n_tokens`` — pure in-row arithmetic shared by both prefix-sum
    paths."""
    cap = F.lit(int(capacity))
    last_tok = F.col("start_offset") + F.col("n_tokens") - 1
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / cap).cast("bigint").alias("chunk_id"),
        F.pmod(F.col("start_offset"), cap).cast("bigint").alias("chunk_offset"),
        F.floor(last_tok / cap).cast("bigint").alias("chunk_last"),
        (
            F.floor(last_tok / cap) - F.floor(F.col("start_offset") / cap) + 1
        ).cast("bigint").alias("n_chunks"),
    )


def assemble_sequences(
    df: DataFrame,
    id_col: str,
    capacity: int,
    text_col: str = "text",
    sep: str = " ",
    buckets: int = 256,
    order_col: str | None = None,
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Materialize the packed training sequences themselves:
    ``(chunk_id, text, n_tokens)`` where every chunk except the last
    holds exactly ``capacity`` tokens of the concatenated corpus
    (documents in ascending id order, whitespace normalized to
    ``sep`` — the operator reassembles from tokens).

    Shape at scale: each document emits one row PER SPANNED CHUNK
    (almost always 1, sometimes 2 — never more than
    ``len/capacity + 1``) carrying only its token SLICE for that
    chunk; assembly is one ``groupBy(chunk_id)`` whose per-group
    state is bounded by ``capacity`` tokens. Tokens shuffle exactly
    once, each to exactly one sequence — there is no cheaper way to
    co-locate a training sequence's bytes. In-chunk order comes from
    ``array_sort`` over (position, slice) structs; positions are
    disjoint by construction."""
    meta = pack_sequences(
        df, id_col, capacity,
        text_col=text_col, buckets=buckets,
        order_col=order_col, shuffle_salt=shuffle_salt,
    )
    toks = F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    docs = df.select(F.col(id_col), toks.alias("__toks"))
    j = docs.join(meta, id_col)
    cap = F.lit(int(capacity))
    spans = j.select(
        F.col(id_col),
        "__toks",
        "start_offset",
        "n_tokens",
        F.explode(
            F.sequence(F.col("chunk_id"), F.col("chunk_last"))
        ).alias("__chunk"),
    )
    # Document-local token range landing in this chunk (0-based).
    lo = F.greatest(F.col("__chunk") * cap - F.col("start_offset"), F.lit(0))
    hi = F.least(
        F.col("n_tokens"), (F.col("__chunk") + 1) * cap - F.col("start_offset")
    )
    pos = F.greatest(F.col("start_offset") - F.col("__chunk") * cap, F.lit(0))
    sliced = spans.select(
        F.col("__chunk").alias("chunk_id"),
        pos.cast("bigint").alias("__pos"),
        F.slice(
            F.col("__toks"), (lo + 1).cast("int"), (hi - lo).cast("int")
        ).alias("__slice"),
    )
    return (
        sliced.groupBy("chunk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__slice"))
            ).alias("__parts")
        )
        .select(
            "chunk_id",
            F.array_join(
                F.flatten(
                    F.transform(F.col("__parts"), lambda p: p["__slice"])
                ),
                sep,
            ).alias("text"),
            F.aggregate(
                F.col("__parts"),
                F.lit(0).cast("bigint"),
                lambda acc, p: acc + F.size(p["__slice"]),
            ).alias("n_tokens"),
        )
    )


def export_packed(
    df: DataFrame,
    id_col: str,
    capacity: int,
    path: str,
    text_col: str = "text",
    chunks_per_file: int = 10_000,
    buckets: int = 256,
    file_partitions: int | None = None,
    order_col: str | None = None,
    shuffle_salt: str | None = None,
) -> None:
    """Write the assembled training sequences as parquet, globally
    ordered by ``chunk_id`` and size-bounded: range-partitioned on
    ``chunk_id`` (sorted within partitions) with
    ``maxRecordsPerFile = chunks_per_file`` — so a trainer streams
    files in name order and sees the corpus in packed order, every
    file a bounded number of fixed-size sequences."""
    seqs = assemble_sequences(
        df, id_col, capacity, text_col=text_col, buckets=buckets,
        order_col=order_col, shuffle_salt=shuffle_salt,
    )
    n_parts = file_partitions or max(
        1, df.sparkSession.sparkContext.defaultParallelism
    )
    (
        seqs.repartitionByRange(n_parts, "chunk_id")
        .sortWithinPartitions("chunk_id")
        .write.option("maxRecordsPerFile", chunks_per_file)
        .mode("overwrite")
        .parquet(path)
    )
