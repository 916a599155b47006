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
so fanning out cannot change any stage's output. Exactly-once: the
checkpoint commits a micro-batch only after the handler returns,
i.e. after ALL sinks appended — a mid-handler crash replays the
whole batch into every sink, so each sink needs the same idempotence
story a single-product ``foreachBatch`` needs (parquet re-append is
deduplicated downstream by ``__batch_id`` partition overwrite in the
silver twin; the availableNow gates use fresh sink dirs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame


@dataclass
class CurationSink:
    """One product of the shared pass: ``transform`` is the batch
    operator (micro-batch DataFrame in, product DataFrame out),
    ``out_path`` the parquet append target, ``project`` an optional
    column narrowing applied before the write (e.g. drop rewritten
    text when only the counts are consumed)."""

    transform: Callable[[DataFrame], DataFrame]
    out_path: str
    project: Sequence[str] | None = None


def start_curation_fanout_stream(
    doc_stream: DataFrame,
    sinks: Sequence[CurationSink],
    checkpoint: str,
):
    """Start ONE availableNow query applying every sink's transform
    to each shared micro-batch. Returns the StreamingQuery.

    Persisted static sides (eval gram sets, reference gram sets,
    broadcast models) belong to the individual ``transform`` closures
    — build them with the product modules'
    ``decontaminate_stream(...)`` / ``span_scrub_stream(...)``
    helpers and unpersist them when the query stops, exactly as with
    single-product wiring."""

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        for sink in sinks:
            out = sink.transform(batch_df)
            if sink.project is not None:
                out = out.select(*sink.project)
            out.write.mode("append").parquet(sink.out_path)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
