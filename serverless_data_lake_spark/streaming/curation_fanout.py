"""One ingest pass, several curation products — a shared
``foreachBatch`` fan-out over a single streaming source.

A production training-data pipeline rarely wants ONE thing from the
ingest stream: the same arriving documents feed benchmark
decontamination (drop contaminated docs —
:mod:`streaming.decontaminate_stream`), reference-span scrubbing
(cut duplicated passages, keep the doc —
:mod:`streaming.span_dedup_stream`), quality filtering, and so on.
Running one StreamingQuery per product re-reads and re-plans the
source once per product and multiplies the fixed per-query overhead
(trigger scheduling, checkpoint I/O, micro-batch planning — measured
~1.3-2 s per availableNow query at sf0.1 regardless of slice size,
r9/r10 stream-gate records). This module runs them as ONE query: a
single ``foreachBatch`` handler applies each product's batch
transform to the shared micro-batch DataFrame and appends to that
product's sink, so the source is read once and the per-query fixed
cost is paid once (r10-verdict #6 shape: "share the existing stream
gate's fixed-cost query").

Semantics: each stage's per-batch plan is EXACTLY its batch
operator (the stream==batch property every streaming twin in this
package pins), and stages are independent per-document transforms,
so fanning out cannot change any stage's output.

Exactly-once: the checkpoint commits a micro-batch only after the
handler returns, i.e. after ALL sinks ran — a mid-handler crash
replays the whole batch into every sink, so each product needs a
replay story:

- **Parquet sinks** write a ``__batch_id`` column (r11 advisory):
  a replayed batch appends rows identical up to and including their
  batch id. The SAFE recovery is partition-overwrite by
  ``__batch_id`` (the silver twin's dynamic-partition-overwrite
  contract) — idempotent for any row content. A
  ``SELECT DISTINCT``-with-batch-id recovery collapses cross-batch
  repeats correctly but ALSO merges legitimately identical rows
  WITHIN one micro-batch (two equal product rows in the same batch
  share a batch id); use it only when the product carries a unique
  row key or duplicate rows are semantically collapsible.
- **Driver-side aggregates** (``consume``) receive
  ``(product_df, batch_id)`` and should key any accumulated state by
  ``batch_id`` so a replay overwrites rather than double-counts (the
  stream gate's moments dict does exactly this).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_ID_COL = "__batch_id"


@dataclass
class CurationSink:
    """One product of the shared pass: ``transform`` is the batch
    operator (micro-batch DataFrame in, product DataFrame out);
    ``project`` an optional column narrowing applied before the
    sink (e.g. drop rewritten text when only the counts are
    consumed). Exactly one consumption mode:

    - ``out_path`` — parquet append target; each append carries a
      ``__batch_id`` column (set ``stamp_batch_id=False`` only for a
      sink whose downstream contract cannot tolerate the column).
    - ``consume`` — a driver-side callback ``(product_df, batch_id)``
      that runs the product's action itself (aggregate + collect,
      metrics push, ...) with NO intermediate files. This is the
      cheap path for fingerprint/audit products: one aggregate job
      per micro-batch instead of a parquet write per batch plus a
      read-back job (measured ~1 s saved per availableNow run at
      sf0.1, r12 stream-gate A/B in docs/bench.md).
    """

    transform: Callable[[DataFrame], DataFrame]
    out_path: str | None = None
    project: Sequence[str] | None = None
    consume: Callable[[DataFrame, int], None] | None = None
    stamp_batch_id: bool = True

    def __post_init__(self) -> None:
        if (self.out_path is None) == (self.consume is None):
            raise ValueError(
                "CurationSink needs exactly one of out_path (parquet "
                "append) or consume (driver-side callback)"
            )


def build_fanout_handler(
    sinks: Sequence[CurationSink],
    persist_batch: bool = False,
    fanout_partitions: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` handler, exposed for unit tests (replay
    behavior is tested by invoking it twice with the same batch id).

    ``persist_batch`` caches the micro-batch across the sinks'
    actions and unpersists before returning — the fan-out is
    multi-consumer by design (every product re-scans the batch
    otherwise; operators like the span scrub scan it 2-3× alone), so
    this is the r7 persist rule's "persist only multi-consumer
    results" case. Off by default: for byte-small micro-batches the
    columnar cache round-trip can cost as much as the re-scan
    (measured both ways at sf0.1 — see docs/bench.md r12).

    ``fanout_partitions`` repartitions the micro-batch before the
    sinks consume it (r15, guide §2): a FileStreamSource batch
    carries one scan partition per file split, so a single-file
    trigger serializes every product's per-document compute (gram
    hashing, tokenization) on 1-2 cores — measured ~1.2 s of the
    stream gate's micro-batch action at sf0.1 ran on ≤2 tasks.
    Pass the core count (or a sized value) when the sinks do heavy
    per-row work; the repartition is one cheap exchange of the batch
    the products were going to re-scan 3-4× anyway. ``None`` keeps
    the source partitioning."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if fanout_partitions:
            # No partition-count probe: `.rdd` on a micro-batch frame
            # re-plans the batch through the RDD conversion path
            # (measured ~8 s per call at sf0.1) — the unconditional
            # exchange is the cheap option here.
            batch_df = batch_df.repartition(fanout_partitions)
        if persist_batch:
            batch_df = batch_df.persist()
        try:
            for sink in sinks:
                out = sink.transform(batch_df)
                if sink.project is not None:
                    out = out.select(*sink.project)
                if sink.consume is not None:
                    sink.consume(out, batch_id)
                else:
                    if sink.stamp_batch_id:
                        out = out.withColumn(
                            BATCH_ID_COL, F.lit(batch_id).cast("long")
                        )
                    out.write.mode("append").parquet(sink.out_path)
        finally:
            if persist_batch:
                batch_df.unpersist()

    return handle


def start_curation_fanout_stream(
    doc_stream: DataFrame,
    sinks: Sequence[CurationSink],
    checkpoint: str,
    persist_batch: bool = False,
    fanout_partitions: int | None = None,
):
    """Start ONE availableNow query applying every sink's transform
    to each shared micro-batch. Returns the StreamingQuery.

    Persisted static sides (eval gram sets, reference gram sets,
    broadcast models) belong to the individual ``transform`` closures
    — build them with the product modules'
    ``decontaminate_stream(...)`` / ``span_scrub_stream(...)``
    helpers and unpersist them when the query stops, exactly as with
    single-product wiring."""

    return (
        doc_stream.writeStream.foreachBatch(
            build_fanout_handler(
                sinks,
                persist_batch=persist_batch,
                fanout_partitions=fanout_partitions,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


