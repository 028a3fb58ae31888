"""Structured Streaming operators.

The reference's "streaming" is keyset-paginated batch with resumability
(SURVEY §2.9) — that maps to the checkpointed batch driver in
``plans/checkpoint.py``.  THIS module is the event-time streaming
surface a Spark-native engine adds on top:

* ``stream_match_against_static`` — an unbounded stream of incoming
  person records matched against a static (prepared) reference table:
  a stream-static equi-join on blocking keys + the stateless scoring
  cascade.  Incremental, append-mode, exactly the reference's
  flush-every-N incremental sink semantics (csv_export.rs
  CsvStreamWriter) with Spark checkpointing for free.
* ``events_windowed_counts`` — watermarked tumbling-window aggregation
  over an event stream (late data handled by the watermark).

Both are plain transformations on streaming DataFrames: callers choose
source (``spark.readStream.format(...)``) and sink (``writeStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.blocking import prefix_cols
from ..operators.persons import prepare_persons
from ..operators.scoring import score_pairs

__all__ = [
    "checkpoint_lineage",
    "stream_match_against_static",
    "stream_dedup_against_corpus",
    "stream_to_snapshot_table",
    "events_windowed_counts",
    "stateful_entity_counts",
]


def checkpoint_lineage(checkpoint_dir: str, legacy_probe=None) -> str:
    """Stable exactly-once lineage id for a checkpoint directory.

    Canonicalized (realpath) before hashing: the SAME physical
    checkpoint addressed via a different spelling (relative vs
    absolute path, symlink, different cwd) must stay ONE lineage —
    otherwise a crashed micro-batch replayed from it lands in a
    "new" lineage, escapes batch-id dedup, and double-appends.

    ``legacy_probe(lineage_id) -> bool`` (optional): pre-r4 versions
    hashed the RAW spelling; a deployment that already committed
    batches under that legacy id must keep it, or the watermark
    resets and the next replay double-appends once.  The probe is
    asked whether the legacy id has committed state; if yes (and the
    canonical id has not), the legacy id stays sticky."""
    import hashlib
    import os

    canonical = hashlib.md5(
        os.path.realpath(os.path.abspath(checkpoint_dir)).encode("utf-8")
    ).hexdigest()[:16]
    if legacy_probe is not None:
        legacy = hashlib.md5(
            checkpoint_dir.rstrip("/").encode("utf-8")
        ).hexdigest()[:16]
        if legacy != canonical and not legacy_probe(canonical) and legacy_probe(legacy):
            return legacy
    return canonical


def stream_to_snapshot_table(stream_df: DataFrame, table, checkpoint_dir: str):
    """Exactly-once streaming sink into a SnapshotTable: every
    micro-batch is an ATOMIC append commit (Iceberg-append analogue),
    and batch-id idempotence makes failure replays no-ops — the
    standard transactional foreachBatch recipe (the reference's
    flush-every-N incremental CsvStreamWriter, csv_export.rs, with
    transactional semantics it cannot offer on a bare CSV file).

    Returns the StreamingQuery; caller picks the trigger via
    ``.trigger(...)`` conventions by stopping/awaiting it.

    Batch ids are only meaningful per checkpoint lineage, so the
    idempotence key is (checkpoint dir, batch_id): a rerun FROM THE
    SAME checkpoint replays the same ids and is deduped; a fresh
    checkpoint is a new lineage whose batch 0 must commit (see
    ``checkpoint_lineage`` for why the dir is canonicalized first;
    the probe keeps a pre-canonicalization deployment's lineage id
    sticky so its watermark survives the upgrade).
    """
    lineage = checkpoint_lineage(
        checkpoint_dir,
        legacy_probe=lambda lid: table.last_batch_id(lid) is not None,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, batch_id=batch_id, query_id=lineage)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_against_corpus(
    stream_docs: DataFrame,
    corpus_bands: DataFrame,
    k: int = 8,
    bands: int = 4,
    shingle: int = 3,
) -> DataFrame:
    """Near-dup candidates of an incoming DOCUMENT stream against a
    static corpus — the training-data ingest filter ("is this page a
    dup of something already in the corpus?") as a stream-static join.

    The stream side's MinHash band assignment is SHUFFLE-FREE per-row
    arithmetic (dedup.minhash_signatures_wide is array_min/transform
    higher-order functions), so it is legal on an unbounded stream with
    no state and no watermark; the join on (band_id, band_hash) is a
    supported stateless stream-static inner join.

    ``corpus_bands`` is ``dedup.minhash_bands(corpus, k, bands,
    shingle)`` — precompute it once (or keep it as a compacted table
    the batch pipeline maintains).  Output: (doc_id, band_id,
    corpus_doc_id) candidate hits; dedupe/score downstream.
    """
    from ..operators.dedup import minhash_bands

    stream_b = minhash_bands(stream_docs, k, bands, shingle, stream_safe=True)
    corpus_b = corpus_bands.select(
        F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_hash"
    )
    return (
        stream_b.join(corpus_b, on=["band_id", "band_hash"], how="inner")
        .filter(F.col("doc_id") != F.col("corpus_doc_id"))
        .select("doc_id", "corpus_doc_id", "band_id")
    )


def stream_match_against_static(
    stream_persons: DataFrame,
    static_prepared: DataFrame,
    no_middle: bool = True,
) -> DataFrame:
    """Match a STREAM of raw person records against a static prepared
    reference table.

    The stream side is prepared per micro-batch (the same projection
    pipeline — normalization is stateless), joined on the exact
    birthdate block key, then scored.  Stream-static inner joins are
    natively supported and stateless; the static side's derived
    columns are computed once and reused every micro-batch.
    """
    prepared_stream = prepare_persons(stream_persons)
    left = prefix_cols(prepared_stream, "t1_").withColumn(
        "_bk", F.col("t1_bd_str")
    )
    right = prefix_cols(static_prepared, "t2_").withColumn(
        "_bk", F.col("t2_bd_str")
    )
    pairs = left.join(right, "_bk", "inner").drop("_bk")
    return score_pairs(pairs, no_middle=no_middle)


def stateful_entity_counts(mentions) :
    """Custom stateful streaming operator (applyInPandasWithState):
    running mention counts per entity key (last_n, bd_str) across
    micro-batches — the kind of continuously-updated entity statistics
    a streaming linkage pipeline maintains (new-mention counts per
    entity, for drift/alerting).

    State per key: total count.  Emits one row per key per batch with
    the updated running total.  Input: a STREAMING DataFrame with
    columns last_n, bd_str (e.g. prepared mentions).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("last_n", StringType()),
            StructField("bd_str", StringType()),
            StructField("total_mentions", LongType()),
            StructField("batch_mentions", LongType()),
        ]
    )
    state_schema = StructType([StructField("total", LongType())])

    def update(key, pdf_iter, state):
        batch = 0
        for pdf in pdf_iter:
            batch += len(pdf)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            {
                "last_n": [key[0]],
                "bd_str": [key[1]],
                "total_mentions": [total],
                "batch_mentions": [batch],
            }
        )

    return (
        mentions.groupBy("last_n", "bd_str")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def events_windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type over an
    ``events(ts timestamp, event_type string, value double)`` stream."""
    # watermarks require TIMESTAMP (with tz); sources often carry NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
