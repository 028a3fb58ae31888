"""Continuously-updated entity clusters over an unbounded page stream.

The batch pipeline (plans/web_pipeline.py) re-clusters the world; a
crawl is never done, so the production shape is INCREMENTAL: each
micro-batch of pages folds its mentions and match edges into durable
state, and cluster assignments are maintained merge-on-read — per
batch we write O(new + changed) rows, never O(corpus).

State lives in three SnapshotTables (Iceberg-style atomic appends,
batch-id idempotent -> exactly-once under Structured Streaming
replays):

    mentions/  prepared mention rows (the accumulated corpus)
    edges/     undirected match edges (src < dst)
    labels/    (node, component, version) DELTA LOG — the assignment
               of a node is the row with the highest version
               (``resolve_labels``); ``compact_labels`` folds the log
               into a new base when the delta fraction grows

Per micro-batch (foreachBatch):

    1. prepare mentions from the batch's pages (html pruned first)
    2. match within the batch AND batch-vs-corpus (corpus side pinned
       to the snapshot BEFORE this batch's append, so replays after a
       partial failure see the same candidate space modulo idempotent
       skips)
    3. append mentions + edges (atomic, replay-safe)
    4. merge_components(current labels, new edges, changes_only=True)
       -> append ONLY changed/new assignments at version=batch_id

The scale contract: batch-vs-corpus matching is an equi-join on the
same composite blocking key as the batch pipeline (soundex4(last),
lang, domain) — the stream side is small, the corpus side is huge but
never reshuffled beyond the blocking join; label maintenance touches
merged components only (condensed-graph CC + broadcast remap,
operators/clustering.py:merge_components).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.blocking import pair_join
from ..operators.clustering import merge_components
from ..operators.scoring import score_pairs
from ..plans.web_pipeline import _block_key, prepare_mentions
from ..sources.tables import SnapshotTable

__all__ = ["IncrementalClusterer", "resolve_labels"]


def resolve_labels(raw: DataFrame) -> DataFrame:
    """(node, component): last-writer-wins over the delta log."""
    return raw.groupBy("node").agg(
        F.max_by("component", "version").alias("component")
    )


class IncrementalClusterer:
    def __init__(self, spark: SparkSession, state_dir: str) -> None:
        self.spark = spark
        self.mentions = SnapshotTable(os.path.join(state_dir, "mentions"))
        self.edges = SnapshotTable(os.path.join(state_dir, "edges"))
        self.labels = SnapshotTable(os.path.join(state_dir, "labels"))

    # --- read side -----------------------------------------------------------

    def current_labels(self) -> DataFrame:
        """Resolved (node, component) assignment at the current snapshot."""
        try:
            return resolve_labels(self.labels.read(self.spark))
        except FileNotFoundError:
            return self.spark.createDataFrame(
                [], "node long, component long"
            )

    def cluster_members(self) -> DataFrame:
        """(node, url, mention_idx, cluster_id) — assignments joined
        back to mention identity, same shape as cluster_pages."""
        m = self.mentions.read(self.spark).select("id", "url", "mention_idx")
        lab = self.current_labels()
        return m.join(lab, m.id == lab.node, "left").select(
            F.col("id"),
            "url",
            "mention_idx",
            F.coalesce("component", F.col("id")).alias("cluster_id"),
        )

    # --- write side ----------------------------------------------------------

    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        """foreachBatch body — idempotent per (lineage, batch_id)."""
        spark = self.spark
        corpus_snap = self.mentions.current_snapshot()

        prepared = prepare_mentions(pages).localCheckpoint(eager=True)

        # within-batch self-match
        within = self._match(prepared, prepared).filter(
            F.col("t1_id") < F.col("t2_id")
        )
        # batch vs accumulated corpus (pinned snapshot: replays after a
        # partial failure must not match the batch against itself)
        if corpus_snap is not None:
            corpus = self.mentions.read(spark, corpus_snap)
            cross = self._match(prepared, corpus).filter(
                F.col("t1_id") != F.col("t2_id")
            )
            new_edges = within.unionByName(cross)
        else:
            new_edges = within
        new_edges = (
            new_edges.select(
                F.least("t1_id", "t2_id").alias("src"),
                F.greatest("t1_id", "t2_id").alias("dst"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        self.mentions.append(prepared, batch_id=batch_id, query_id="mentions")
        self.edges.append(new_edges, batch_id=batch_id, query_id="edges")

        delta = merge_components(
            self.current_labels(),
            new_edges,
            new_nodes=prepared.select("id"),
            changes_only=True,
        ).withColumn("version", F.lit(batch_id).cast("long"))
        self.labels.append(delta, batch_id=batch_id, query_id="labels")

    def _match(self, left_prepared: DataFrame, right_prepared: DataFrame) -> DataFrame:
        pairs = pair_join(
            left_prepared, right_prepared, lambda p: [_block_key(p)]
        ).filter(F.col("t1_birthdate") == F.col("t2_birthdate"))
        return score_pairs(pairs, no_middle=True).select("t1_id", "t2_id")

    def attach(self, pages_stream: DataFrame, checkpoint_dir: str):
        """Wire the clusterer to a STREAMING pages DataFrame; returns
        the StreamingQuery (availableNow trigger: drain, then stop —
        rerun on a schedule for a rolling crawl)."""
        return (
            pages_stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def compact_labels(self) -> str | None:
        """Fold the delta log into a single base snapshot (read cost is
        O(base + deltas); compaction restores it to O(nodes)).  Returns
        the new snapshot id."""
        try:
            raw = self.labels.read(self.spark)
        except FileNotFoundError:
            return None
        w = Window.partitionBy("node").orderBy(F.col("version").desc())
        base = (
            raw.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "component", "version")
        )
        return self.labels.commit(base)
