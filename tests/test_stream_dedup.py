"""Streaming LSH dedup: an unbounded document stream joined against a
static corpus band index must flag exactly the pairs the BATCH LSH
candidate generator finds (restricted to stream x corpus)."""

from __future__ import annotations

import random

from pyspark.sql.types import StringType, StructField, StructType

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

WORDS = [f"t{i:03d}" for i in range(300)]


def _make_docs(prefix, n, rng, dup_of=None):
    rows = []
    for i in range(n):
        if dup_of is not None and i < len(dup_of):
            words = dup_of[i][1].split()
            words[3] = "EDITED"
            rows.append((f"{prefix}{i:02d}", " ".join(words), "en"))
        else:
            rows.append(
                (f"{prefix}{i:02d}", " ".join(rng.choice(WORDS) for _ in range(30)), "en")
            )
    return rows


def test_stream_dedup_equals_batch_candidates(spark, tmp_path):
    from name_match_latest_spark.operators.dedup import (
        minhash_bands,
        minhash_lsh_candidates,
    )
    from name_match_latest_spark.streaming.stream_match import (
        stream_dedup_against_corpus,
    )

    rng = random.Random(7)
    corpus_rows = _make_docs("c", 20, rng)
    incoming_rows = _make_docs("s", 10, rng, dup_of=corpus_rows[:5])

    corpus = spark.createDataFrame(corpus_rows, DOC_SCHEMA)
    corpus_bands = minhash_bands(corpus)

    src = str(tmp_path / "incoming")
    spark.createDataFrame(incoming_rows, DOC_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)

    out = stream_dedup_against_corpus(stream, corpus_bands)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dups")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.corpus_doc_id)
        for r in spark.table("stream_dups").select("doc_id", "corpus_doc_id").collect()
    }

    # batch reference: LSH candidates over corpus ∪ incoming, restricted
    # to (incoming, corpus) pairs
    both = spark.createDataFrame(corpus_rows + incoming_rows, DOC_SCHEMA)
    batch = minhash_lsh_candidates(both)
    want = set()
    for r in batch.collect():
        a, b = r.d1, r.d2
        if a.startswith("s") and b.startswith("c"):
            want.add((a, b))
        elif b.startswith("s") and a.startswith("c"):
            want.add((b, a))
    assert {(d, c) for d, c, in got} == want
    # the 5 planted near-dups must be present
    planted = {(f"s{i:02d}", f"c{i:02d}") for i in range(5)}
    assert planted <= got
