"""Streaming incremental dedup (streaming/incremental_dedup_stream):
stream == sequential batch application, index growth across
micro-batches, and seeding from a batch-built corpus index."""

from __future__ import annotations

import json

import pytest

from serverless_data_lake_spark.operators.dedup import (
    build_lsh_index,
    incremental_dedup,
)
from serverless_data_lake_spark.streaming.incremental_dedup_stream import (
    read_lsh_index,
    start_incremental_dedup_stream,
    write_lsh_index,
)

SCHEMA = "doc_id long, text string"

CORPUS = [
    (1, "standing corpus entry about river navigation and lock systems today"),
]
BATCH1 = [
    # near-dup of corpus doc 1 -> dropped
    (10, "standing corpus entry about river navigation and lock systems tonight"),
    (11, "first batch novel piece describing alpine railway construction in detail"),
    # within-batch near-dup pair: 12 survives, 13 drops
    (12, "two nearly identical rows planted inside the very same micro batch alpha"),
    (13, "two nearly identical rows planted inside the very same micro batch beta"),
]
BATCH2 = [
    # near-dup of batch-1 SURVIVOR 11 -> dropped (index grew)
    (20, "first batch novel piece describing alpine railway construction in depth"),
    (21, "second batch genuinely fresh text on desert irrigation channel design"),
]
THRESH = 0.5


def _write_batches(tmp_path):
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    # Distinct mtimes pin the micro-batch ORDER: FileStreamSource
    # sorts by modification time, and with equal stamps the file
    # order — hence which document of a cross-batch near-dup pair
    # survives — is arbitrary (incremental dedup is order-dependent
    # by definition).
    now = time.time()
    for k, (name, rows) in enumerate(
        (("b1.json", BATCH1), ("b2.json", BATCH2))
    ):
        p = src / name
        with open(p, "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))
    return src


@pytest.fixture(scope="module")
def seeded_stream_run(spark, tmp_path_factory):
    """The corpus-seeded stream over BATCH1+BATCH2, run ONCE for the
    module (r14 test-wall-clock ask: the survivors test and the
    index-growth test previously each ran this identical ~20 s
    availableNow stream; both assertion sets read the same
    artifacts). Yields (out_dir, index_dir)."""
    tmp_path = tmp_path_factory.mktemp("incr_stream")
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    index_dir = str(tmp_path / "index")
    write_lsh_index(build_lsh_index(corpus, "doc_id", "text"), index_dir)
    src = _write_batches(tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_incremental_dedup_stream(
        stream, index_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        verify_threshold=THRESH,
    )
    q.awaitTermination(120)
    return str(tmp_path / "out"), index_dir


def test_stream_equals_sequential_batches(spark, seeded_stream_run):
    out_dir, _index_dir = seeded_stream_run
    got = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    )

    # Sequential batch replay: same index evolution, same survivors.
    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    expected = []
    idx = build_lsh_index(corpus, "doc_id", "text")
    standing = corpus
    for rows in (BATCH1, BATCH2):
        batch = spark.createDataFrame(rows, SCHEMA)
        surv = incremental_dedup(
            batch, idx, "doc_id", "text", verify_threshold=THRESH
        )
        expected.extend(r.doc_id for r in surv.collect())
        standing = standing.unionByName(surv)
        idx = build_lsh_index(standing, "doc_id", "text")

    assert got == sorted(expected)
    assert got == [11, 12, 21]  # the planted outcome, spelled out


def test_index_grew_with_survivors(spark, seeded_stream_run):
    _out_dir, index_dir = seeded_stream_run
    idx = read_lsh_index(spark, index_dir)
    indexed_ids = {
        r["__cid"]
        for r in idx.grams_df.select("__cid").distinct().collect()
    }
    assert indexed_ids == {1, 11, 12, 21}


def test_fresh_stream_without_seed_index(spark, tmp_path):
    """No standing corpus: first batch self-dedups and founds the
    index; the second batch dedups against it."""
    src = _write_batches(tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_incremental_dedup_stream(
        stream, str(tmp_path / "index"), str(tmp_path / "out"),
        str(tmp_path / "ck"), verify_threshold=THRESH,
    )
    q.awaitTermination(120)
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    # Without the corpus, doc 10 survives batch 1; 20 still dups 11.
    assert got == [10, 11, 12, 21]


def test_all_duplicate_batch_does_not_crash_stream(spark, tmp_path):
    """A micro-batch whose every row duplicates the standing corpus
    writes NO survivor partition — the handler must skip the
    read-back and index growth instead of crashing on the missing
    path, and later batches must still process."""
    import json
    import os
    import time

    from serverless_data_lake_spark.operators.dedup import build_lsh_index

    corpus = spark.createDataFrame(CORPUS, SCHEMA)
    index_dir = str(tmp_path / "index")
    write_lsh_index(build_lsh_index(corpus, "doc_id", "text"), index_dir)

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        # batch 1: pure duplicate of the corpus doc -> zero survivors
        [(30, "standing corpus entry about river navigation and lock "
              "systems today")],
        # batch 2: genuinely new -> must still land
        [(31, "entirely novel follow-up text about tidal barrage "
              "engineering methods")],
    ]
    now = time.time()
    for k, rows in enumerate(batches):
        p = src / f"b{k}.json"
        with open(p, "w") as f:
            for i, t in rows:
                f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
        os.utime(p, (now - 60 + 30 * k, now - 60 + 30 * k))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_incremental_dedup_stream(
        stream, index_dir, str(tmp_path / "out"), str(tmp_path / "ck"),
        verify_threshold=THRESH,
    )
    q.awaitTermination(120)
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [31]
    idx = read_lsh_index(spark, index_dir)
    ids = {r["__cid"] for r in idx.grams_df.select("__cid").collect()}
    assert ids == {1, 31}  # duplicate 30 never entered the index


def test_replayed_batch_write_is_idempotent(spark, tmp_path):
    """A crash-replayed micro-batch must not duplicate survivor rows:
    the __batch_id-keyed dynamic overwrite rewrites only its own
    partition, so writing the same batch twice equals writing once."""
    from serverless_data_lake_spark.streaming.incremental_dedup_stream import (
        _write_partition,
    )

    out = str(tmp_path / "out")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    b2 = spark.createDataFrame([(3, "c")], SCHEMA)
    _write_partition(b1, out, 0)
    _write_partition(b2, out, 1)
    # Replay batch 1 (same rows, e.g. after a crash mid-commit).
    _write_partition(b2, out, 1)
    rows = spark.read.parquet(out).select("doc_id").collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3]
    # Other batches' partitions were untouched by the replay.
    p0 = spark.read.parquet(out + "/__batch_id=0")
    assert sorted(r.doc_id for r in p0.collect()) == [1, 2]
