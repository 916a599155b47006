"""Streaming curation — ingest-time filtering with the same
declarative pipeline the batch release uses.

A continuously-ingesting pipeline wants the PER-DOCUMENT stages
(quality/length/repetition/perplexity gates, decontamination,
reference-span scrubbing, deterministic sampling, split assignment)
applied at ingest; the CORPUS-GLOBAL stages (exact/near dedup,
corpus-wide span removal) are unbounded state by definition and stay
in the batch release pass. ``start_curation_stream`` refuses a
pipeline containing corpus-global stages loudly rather than silently
changing their semantics to per-micro-batch.

One declaration, two runtimes: each micro-batch runs EXACTLY the
batch pipeline's ``build()`` (fresh Observations per batch — they
are one-shot), so stream==batch equality holds per batch by
construction and the per-batch audit manifests accumulate into a
driver-side log the caller owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from serverless_data_lake_spark.pipeline.curation import (
    CurationPipeline,
    StageReport,
)


def start_curation_stream(
    doc_stream: DataFrame,
    pipe: CurationPipeline,
    out_path: str,
    checkpoint: str,
    reports: list[list[StageReport]] | None = None,
):
    """Run ``pipe`` over each micro-batch, appending survivors to
    parquet at ``out_path`` with exactly-once checkpointing. Each
    batch's stage manifest is appended to ``reports`` (pass a list
    to collect them). Returns the StreamingQuery.

    Raises ``ValueError`` if the pipeline contains corpus-global
    stages — their per-batch reinterpretation would silently weaken
    dedup guarantees."""
    bad = pipe.corpus_global_stages
    if bad:
        raise ValueError(
            "corpus-global stages cannot stream (unbounded state): "
            + ", ".join(bad)
            + " — run them in the batch release pass instead"
        )

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        try:
            out, taps = pipe.build(batch_df)
            out.write.mode("append").parquet(out_path)
            counts = [int(ob.get["n"]) for _name, ob in taps]
        finally:
            # build() may have cached dual-scan stage inputs
            # (decontaminate/scrub/perplexity); release per batch.
            pipe.unpersist_all()
        if reports is not None:
            reports.append(
                [
                    StageReport(name, counts[i], counts[i + 1])
                    for i, (name, _ob) in enumerate(taps[1:])
                ]
            )

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
