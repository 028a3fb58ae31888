"""Distributed BPE merge-table learning — the tokenizer-training
stage of an LLM data pipeline (Sennrich et al. 2016), learned over a
document corpus at WORD level: start from whitespace tokens, then
repeatedly (1) count all adjacent token pairs corpus-wide, (2) pick
the most frequent pair (ties: lexicographically smallest), (3) merge
every occurrence in a single left-to-right greedy pass.  The learned
merge table (step, w1, w2, pair_count) is the artifact a tokenizer
ships.

Exact-greedy-by-replace: corpus state is one string per document with
every token wrapped as ``\\x02token\\x03``.  Because the wrapper makes
pattern occurrences DISJOINT (adjacent occurrences of a pair never
share delimiter characters, unlike a space-joined form), a literal
non-overlapping left-to-right ``replace`` of
``\\x02w1\\x03\\x02w2\\x03`` with ``\\x02w1\\x01w2\\x03`` is EXACTLY
canonical single-pass greedy merge application — e.g. ``a a a a``
merges to ``(a a) (a a)`` and ``a a a`` to ``(a a) a``, byte-identical
in Java ``String.replace`` (Spark codegen), Python ``str.replace``,
and DuckDB ``replace`` (asserted by tests and the SQL oracle twin).
``\\x01`` joins merged symbols; input text must not contain
``\\x01\\x02\\x03`` (web text never does; garbage bytes would already
have been dropped by extraction).

Scale shape: canonical BPE is inherently sequential in merges, so the
cost is ``n_merges`` rounds of [one Arrow pair-count pass with
per-doc map-side combine -> one hash aggregate on df-spread pair keys
-> a driver-side 1-row argmax collect -> one codegen'd string
replace].  Corpus state is localCheckpoint'd per round (O(1) lineage,
the PageRank discipline).  At 100 TB you do what every tokenizer
pipeline does: learn on a deterministic sample
(``sampling.hash_sample`` — decisions are md5-stable), then the merge
table is corpus-size-independent; applying it to the full corpus is
``n_merges`` codegen'd replaces, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_apply", "bpe_corpus_state", "bpe_merge_greedy"]

SOT, EOT, JOIN = "\x02", "\x03", "\x01"


def bpe_merge_greedy(tokens: list[str], w1: str, w2: str) -> list[str]:
    """Pure-Python canonical single-pass greedy merge — the reference
    semantics the replace-based engine must equal (used by tests)."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == w1 and tokens[i + 1] == w2:
            out.append(w1 + JOIN + w2)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def bpe_corpus_state(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, s)``: the wrapped-token corpus state S0 — lowercase
    ASCII-``\\s+`` tokens (the dedup family's contract), each wrapped
    ``\\x02tok\\x03``, concatenated.  Pure codegen'd expression.
    Null text coalesces to the EMPTY state (zero tokens), the family
    contract — a propagated NULL would crash ``bpe_train``'s Arrow
    pass and make ``bpe_apply`` emit ``tokens=NULL`` rows that a
    downstream explode silently drops."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    wrapped = F.transform(
        toks, lambda t: F.concat(F.lit(SOT), t, F.lit(EOT))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.array_join(wrapped, ""), F.lit("")).alias("s"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs``; returns the merge
    table ``(step, w1, w2, pair_count)`` (step is 1-based).  Stops
    early if no adjacent pair remains.  Merged symbols embed the
    ``\\x01`` joiner, so later rows may merge already-merged symbols —
    the standard BPE vocabulary growth."""
    import pandas as pd
    from collections import Counter

    spark = docs.sparkSession

    def pair_counts(batches):
        for pdf in batches:
            w1s: list[str] = []
            w2s: list[str] = []
            cnts: list[int] = []
            for s in pdf["s"]:
                toks = [t[1:] for t in s.split(EOT) if t]
                if len(toks) < 2:
                    continue
                for (a, b), n in Counter(zip(toks, toks[1:])).items():
                    w1s.append(a)
                    w2s.append(b)
                    cnts.append(n)
            yield pd.DataFrame({"w1": w1s, "w2": w2s, "cnt": cnts})

    # Fan the RAW docs across the cores before the wrapped-state
    # projection: single-row-group/single-file inputs scan as ONE
    # task, which would serialize the (interpreted-HOF) state
    # construction AND all n_merges Arrow pair-count passes on one
    # core.  The repartition must sit BELOW the projection — above
    # it, the exchange moves already-computed state and the
    # construction still runs single-task.  Scale-adaptive: a corpus
    # that already scans wide is left untouched, so no extra exchange
    # appears at cluster scale.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    corpus = bpe_corpus_state(docs, id_col, text_col).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            corpus.select("s")
            .mapInPandas(pair_counts, "w1 string, w2 string, cnt long")
            .groupBy("w1", "w2")
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(
                F.col("pair_count").desc(),
                F.col("w1").asc(),
                F.col("w2").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        w1, w2, c = top[0].w1, top[0].w2, int(top[0].pair_count)
        merges.append((step, w1, w2, c))
        pat = F.lit(SOT + w1 + EOT + SOT + w2 + EOT)
        rep = F.lit(SOT + w1 + JOIN + w2 + EOT)
        # O(1) lineage per round; LAZY: the replace materializes as
        # part of the NEXT round's pair-count job instead of its own —
        # one job per round instead of two, and the final round's
        # replace (whose output nothing reads) never runs at all
        corpus = corpus.withColumn(
            "s", F.replace(F.col("s"), pat, rep)
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, w1 string, w2 string, pair_count long"
    )


def bpe_apply(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a learned merge table: ``(id, tokens)`` where
    ``tokens`` is the array after applying every merge in step order
    (each one canonical greedy, same replace-on-wrapped-state trick as
    training).  ``merges`` is the DataFrame ``bpe_train`` returned (or
    any iterable of ``(step, w1, w2)``-prefixed rows).  The merge
    table is tiny (vocab-sized) — it collects to the driver and the
    whole application compiles to ``n_merges`` chained codegen'd
    ``replace`` calls: one projection, zero shuffles, zero Python —
    embarrassingly parallel over any corpus size."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        table = [(r.w1, r.w2) for r in rows]
    else:
        table = [(r[1], r[2]) for r in sorted(merges, key=lambda r: r[0])]
    s = bpe_corpus_state(docs, id_col, text_col)
    col = F.col("s")
    for w1, w2 in table:
        col = F.replace(
            col,
            F.lit(SOT + w1 + EOT + SOT + w2 + EOT),
            F.lit(SOT + w1 + JOIN + w2 + EOT),
        )
    toks = F.transform(
        F.filter(F.split(col, EOT), lambda t: t != ""),
        lambda t: F.substring(t, 2, 2_000_000_000),
    )
    return s.select("id", toks.alias("tokens"))
