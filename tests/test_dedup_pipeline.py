"""The full LLM-training-data loop through the lakehouse write path:

push-ingest a dup-heavy document corpus (bronze JSONL) → silver PK
table → near-dup pairs (MinHash-LSH) → transitive closure →
one-representative-per-group corpus → MERGE the deduped corpus into
a gold table through TableStore — then assert the persisted end
state and idempotence on re-run.

This certifies that the scale operators (operators/dedup.py,
operators/components.py) compose with the medallion write path
(sources/bronze.py, pipeline/silver.py, catalog.py) — the loop a
real dedup pipeline runs — not just that each piece passes its own
unit tests. Reference anchor: the degenerate exact-key dedup at
``serverless_processing_iceberg/main.py:64-74``; this is its
transitive near-dup generalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_data_lake_spark.operators.components import dedup_corpus
from serverless_data_lake_spark.operators.dedup import minhash_lsh_pairs
from serverless_data_lake_spark.schema.types import (
    ColumnDef,
    DataType,
    EndpointSchema,
)

def _corpus() -> list[dict]:
    """30 docs: three 3-member near-dup families (disjoint
    vocabularies so families never cross-match; variants append a
    couple of words so intra-family Jaccard stays high) + 21
    unrelated docs."""
    docs = []
    did = 0
    for fam in range(3):
        seed = " ".join(f"f{fam}word{i}" for i in range(40))
        for variant in ("", f" tail{fam}a", f" tail{fam}b extra"):
            docs.append({"doc_id": did, "text": seed + variant})
            did += 1
    for k in range(21):
        # Distinct shuffled-vocabulary filler, long enough to shingle.
        words = [f"w{(k * 7 + i * 13) % 97}" for i in range(40)]
        docs.append({"doc_id": did, "text": " ".join(words)})
        did += 1
    return docs


@pytest.fixture(scope="module")
def pipeline_lake(spark, tmp_path_factory):
    from serverless_data_lake_spark.engine import Lake

    return Lake.local(
        str(tmp_path_factory.mktemp("dedup_loop") / "lake"), spark
    )


def test_full_dedup_loop_end_state(pipeline_lake, spark):
    lake = pipeline_lake
    lake.create_endpoint(
        EndpointSchema(
            domain="corpus",
            name="documents",
            columns=[
                ColumnDef("doc_id", DataType.BIGINT, required=True,
                          primary_key=True),
                ColumnDef("text", DataType.STRING),
            ],
        )
    )
    docs = _corpus()
    res = lake.ingest_batch("corpus", "documents", docs)
    assert (res.accepted, res.failed) == (30, 0)
    silver = lake.process_silver("corpus", "documents")
    assert silver.rows_written == 30

    silver_df = lake.sql(
        "SELECT doc_id, text FROM corpus.silver.documents"
    )
    pairs = minhash_lsh_pairs(
        silver_df, "doc_id", "text",
        num_hashes=64, bands=16, shingle_size=3, verify_threshold=0.5,
    )
    deduped = dedup_corpus(silver_df, pairs, "doc_id")

    # Persist the deduped corpus through the COW MERGE write path.
    lake.store.merge("corpus_gold", "documents_dedup", deduped, ["doc_id"])
    kept = {
        r["doc_id"]
        for r in lake.store.read("corpus_gold", "documents_dedup")
        .select("doc_id").collect()
    }
    # Each 3-member family collapses to its min id; filler survives.
    assert kept == {0, 3, 6} | set(range(9, 30))

    # Idempotence: re-running the whole dedup+merge changes nothing.
    deduped2 = dedup_corpus(silver_df, pairs, "doc_id")
    lake.store.merge("corpus_gold", "documents_dedup", deduped2, ["doc_id"])
    again = {
        r["doc_id"]
        for r in lake.store.read("corpus_gold", "documents_dedup")
        .select("doc_id").collect()
    }
    assert again == kept


def test_loop_keeps_representative_text_intact(pipeline_lake):
    lake = pipeline_lake
    row = (
        lake.store.read("corpus_gold", "documents_dedup")
        .filter(F.col("doc_id") == 0)
        .collect()
    )
    assert len(row) == 1 and row[0]["text"].startswith("f0word0 f0word1")
