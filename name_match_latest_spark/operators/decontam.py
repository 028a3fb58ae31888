"""Train/test decontamination: n-gram overlap between corpus splits.

The benchmark-hygiene pass every LLM training pipeline runs (the
GPT-2/GPT-3-style "13-gram decontamination"): for every TEST document,
count how many of its distinct n-token shingles appear anywhere in the
TRAIN split.  High contamination means the test doc (or a near-dup of
it) leaked into training data and its eval numbers are meaningless.

Shares the exact shingle contract with the dedup family
(``dedup._shingle_set``: lowercase, ASCII-``\\s+`` tokens, distinct
n-gram strings), so contamination findings are consistent with what
the near-dup dedup would have caught.

Scale shape: the train side collapses to DISTINCT shingles first (one
row per unique n-gram, however often it repeats), so the test-vs-train
join has fan-out <= 1 per test shingle — strictly linear in the two
shingle streams, no quadratic regime.  n-gram keys are inherently
df-spread (the same property the n-gram Jaccard join relies on); for
very long shingles, joining on a 64-bit hash of the shingle halves
shuffle width at the cost of an astronomically unlikely collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_df

__all__ = ["cross_split_contamination"]


def cross_split_contamination(
    docs: DataFrame,
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per test-doc contamination report:
    ``(doc_id, n_ngrams, n_shared, contamination)`` where
    ``contamination = n_shared / n_ngrams`` over the doc's DISTINCT
    n-gram shingles.  Test docs with fewer than ``n`` tokens have no
    shingles and produce no row (nothing to measure).

    The ratio is one correctly-rounded double division of two exact
    integers — bit-identical in any engine.
    """
    train_set = (
        shingles_df(
            docs.where(F.col(split_col) == train), n=n,
            id_col=id_col, text_col=text_col,
        )
        .select("tok")
        .distinct()
    )
    test_sh = shingles_df(
        docs.where(F.col(split_col) == test), n=n,
        id_col=id_col, text_col=text_col,
        # shingles_df emits DISTINCT shingles per doc already
    ).localCheckpoint(eager=False)  # consumed twice: sizes + hits
    sizes = test_sh.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (
        test_sh.join(train_set, "tok")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared"),
            (
                F.coalesce(F.col("n_shared"), F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("contamination"),
        )
    )
