"""Streaming incremental near-dup dedup — the ingest-time twin of
``operators/dedup.py::incremental_dedup``.

The daily-crawl shape as a stream: each micro-batch is deduplicated
(1) within itself and (2) against the STANDING corpus index, and the
survivors' signatures are appended to the index so later batches
dedup against them too. The index is caller-owned parquet state
(``<index_dir>/bands`` + ``<index_dir>/grams`` — the
:class:`~operators.dedup.LshIndex` layout), re-read per batch:
explicit, inspectable, shared with the batch path (an index built by
``build_lsh_index`` seeds the stream; the stream's grown index feeds
later batch jobs).

Why ``foreachBatch`` and not stateful streaming: the index is
unbounded corpus-global state — exactly what
``applyInPandasWithState`` must not hold per key — and the LSH match
is a join + aggregate + anti-join shape append-mode cannot express.
foreachBatch gives batch-exact semantics per micro-batch; micro-
batches execute sequentially within a query, so read-then-append on
the index is consistent.

Semantics and caveats, stated honestly:

- The surviving corpus depends on ARRIVAL ORDER (any incremental
  dedup does): a batch's min-id wins within the batch, the standing
  corpus always wins across batches. Replaying batches 1..k through
  the batch operator in the same order yields the same survivors —
  ``tests/test_incremental_dedup_stream.py`` asserts stream ==
  sequential-batch.
- Failure replay: every write (corpus sink, band index, gram index)
  is keyed by ``__batch_id`` and uses DYNAMIC partition overwrite, so
  a replayed batch overwrites exactly its own partitions — the sink
  is idempotent end-to-end, not merely at-least-once. A replayed
  batch also sees its own signatures in the index (its previous
  attempt's partitions are still there until the overwrite lands);
  the operator's identity-match guard (``new_id != corpus_id``)
  keeps that self-match from dropping the whole batch.
- Per-batch cost is O(batch), not O(corpus): index rows derive from
  re-reading only this batch's just-written partition
  (``out_path/__batch_id=<k>``), never the accumulated corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serverless_data_lake_spark.operators.dedup import (
    LshIndex,
    gram_hash_sets,
    incremental_dedup,
    _banded_rows,
)


def _index_paths(index_dir: str) -> tuple[str, str]:
    return os.path.join(index_dir, "bands"), os.path.join(index_dir, "grams")


#: Pseudo batch id for rows seeded by a batch-built index (keeps the
#: on-disk layout uniformly ``__batch_id``-partitioned so streaming
#: replays can dynamic-overwrite their own partition only).
SEED_BATCH_ID = -1


def _write_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-batch write: hive-partitioned by ``__batch_id``
    with DYNAMIC overwrite, so a replay of batch k rewrites only
    ``path/__batch_id=k`` and never duplicates rows."""
    (
        df.withColumn("__batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def write_lsh_index(index: LshIndex, index_dir: str, mode: str = "overwrite") -> None:
    """Persist an index to its parquet layout (seed the stream from
    a batch-built corpus index). Seed rows land under the
    ``__batch_id=-1`` partition so the layout matches the stream's."""
    bands_path, grams_path = _index_paths(index_dir)
    if mode == "overwrite":
        # A fresh seed replaces the whole index, including any prior
        # stream-era partitions (dynamic overwrite would only touch
        # the seed partition).
        import shutil

        for p in (bands_path, grams_path):
            shutil.rmtree(p, ignore_errors=True)
    _write_partition(index.bands_df, bands_path, SEED_BATCH_ID)
    _write_partition(index.grams_df, grams_path, SEED_BATCH_ID)


def read_lsh_index(
    spark,
    index_dir: str,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_size: int = 3,
) -> LshIndex | None:
    """Load the parquet index, or None when it does not exist yet
    (first batch of a fresh stream)."""
    bands_path, grams_path = _index_paths(index_dir)
    if not os.path.exists(bands_path):
        return None
    return LshIndex(
        bands_df=spark.read.parquet(bands_path).drop("__batch_id"),
        grams_df=spark.read.parquet(grams_path).drop("__batch_id"),
        num_hashes=num_hashes,
        bands=bands,
        shingle_size=shingle_size,
    )


def start_incremental_dedup_stream(
    doc_stream: DataFrame,
    index_dir: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_size: int = 3,
    verify_threshold: float = 0.8,
):
    """Start the ingest-dedup query: per micro-batch, survivors
    append to parquet at ``out_path`` and their signatures grow the
    index at ``index_dir``. Returns the StreamingQuery."""
    spark = doc_stream.sparkSession
    rows = num_hashes // bands

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # Ids are the dedup identity — collapse exact id repeats
        # inside a batch before near-dup logic.
        batch_df = batch_df.dropDuplicates([id_col])
        idx = read_lsh_index(
            spark, index_dir,
            num_hashes=num_hashes, bands=bands,
            shingle_size=shingle_size,
        )
        if idx is None:
            # First batch: only within-batch dedup (empty corpus).
            from serverless_data_lake_spark.operators.dedup import (
                minhash_lsh_pairs,
            )

            pairs = minhash_lsh_pairs(
                batch_df, id_col, text_col,
                num_hashes=num_hashes, bands=bands,
                shingle_size=shingle_size,
                verify_threshold=verify_threshold,
            )
            losers = pairs.select(F.col("id_b").alias("__l")).distinct()
            survivors = batch_df.join(
                losers, batch_df[id_col] == losers["__l"], "left_anti"
            )
        else:
            survivors = incremental_dedup(
                batch_df, idx, id_col, text_col,
                verify_threshold=verify_threshold,
            )
        # Materialize ONCE: the parquet write is the single pass;
        # index rows derive from re-reading ONLY this batch's own
        # partition (O(batch) per batch, not O(corpus)), so the
        # dedup plan never executes twice per batch. All three
        # writes are __batch_id-keyed dynamic overwrites — a crash
        # between them replays the batch and each write lands
        # idempotently on its own partition.
        _write_partition(survivors, out_path, batch_id)
        part_path = os.path.join(out_path, f"__batch_id={int(batch_id)}")
        if not os.path.exists(part_path):
            # Every row of the batch was a duplicate: the dynamic
            # overwrite wrote no partition at all, and there is
            # nothing to add to the index. (Same local-FS existence
            # check as read_lsh_index.)
            return
        new_rows = spark.read.parquet(part_path)
        grams = gram_hash_sets(
            new_rows, id_col, text_col, shingle_size
        ).select(F.col(id_col).alias("__cid"), "__grams")
        banded = _banded_rows(grams, bands, rows, id_out="__cid")
        bands_path, grams_path = _index_paths(index_dir)
        _write_partition(banded, bands_path, batch_id)
        _write_partition(grams, grams_path, batch_id)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
