"""Repetition-based quality signals and corpus-wide boilerplate
detection — the Gopher/MassiveText-style repetition filters an LLM
training pipeline runs between raw crawl and tokenizer.

Three operators:

``token_repetition_stats``
    Per-document repetition features over the dedup family's token
    contract (lowercase, ASCII-``\\s+`` split): total/distinct token
    counts, duplicate-token fraction, and the character mass covered
    by the single most repeated token and adjacent bigram ("top
    n-gram character fraction" — the signal that catches keyword
    stuffing and templated spam that plain length/stopword features
    miss).  Physical plan: ONE Arrow-batched ``mapInPandas`` scan,
    zero shuffles, zero joins — per-doc Counters are the same batched
    Python loop as ``dedup.shingles_df`` (the Column/HOF formulation
    runs interpreted in CodegenFallback and measured 6.5x slower on
    the same shape in round 3).  Every count is an exact integer;
    every ratio is ONE correctly-rounded double division of two exact
    integers, so results are bit-identical across engines,
    partitionings, and retries.

``boilerplate_ngrams``
    Corpus-wide n-grams shared by >= ``min_docs`` DISTINCT documents
    (navigation chrome, license headers, templated word soup — the
    spans C4/MassiveText strip before training).  Physical plan: the
    per-doc n-gram Counter runs INSIDE the Arrow batch (map-side
    combine where it is cheapest — each doc emits each distinct
    n-gram once, with its local count), then ONE hash aggregate on
    the n-gram key.  N-gram keys are df-spread (near-unique, no hot
    key), the same property the n-gram-Jaccard dedup join relies on;
    shuffle volume equals the distinct-shingle stream the
    decontamination pass already shuffles at the same ``n``.

``repetition_quality_gate``
    The composite keep/drop filter over those stats (min token count,
    max duplicate-token fraction, max top-bigram character fraction)
    — a pure post-filter on the single-scan stats, so the gate adds
    NOTHING to the physical plan beyond the predicate.

Reference anchor: the reference engine has no corpus-curation layer
(its quality gates are per-field validity checks,
src/matching/mod.rs); these operators extend the engine toward the
training-data pipeline the 100 TB deployment feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_repetition_stats",
    "boilerplate_ngrams",
    "repetition_quality_gate",
]

_REP_SCHEMA = (
    "{id_col} {id_type}, n_tokens long, n_distinct_tokens long,"
    " n_token_chars long, dup_token_frac double, top_token_chars long,"
    " top_token_frac double, top_bigram_chars long, top_bigram_frac double"
)


def _tokens(text) -> list[str]:
    """The dedup family's token contract (``dedup._shingle_set`` with
    order and multiplicity kept): lowercase, ASCII-``\\s+`` split,
    empties dropped.  None/NaN/"" -> no tokens."""
    import re

    if not isinstance(text, str) or not text:
        return []
    return [t for t in re.split(r"\s+", text.lower(), flags=re.ASCII) if t]


def token_repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    compute_bigrams: bool = True,
) -> DataFrame:
    """Per-doc repetition features; EVERY input doc gets a row (an
    empty/null text is all-zero counts with 0.0 ratios — the gate can
    then reject it on ``n_tokens`` rather than it vanishing).

    ``top_token_chars`` / ``top_bigram_chars`` are the character mass
    covered by the most covering unigram / adjacent bigram:
    max over grams of ``count * len(gram)`` (bigram length includes
    its joining space).  The ``*_frac`` columns divide by
    ``n_token_chars`` (total characters across all token occurrences
    — a whitespace-normalization-free denominator).

    ``compute_bigrams=False`` skips the bigram Counter — the most
    expensive per-doc work in this scan — and emits PLACEHOLDER zeros
    in the two bigram columns (schema unchanged); the gate sets this
    when its bigram rule is disabled so a dup-frac-only pass stays
    scan-bandwidth-bound."""
    import pandas as pd
    from collections import Counter

    def stats(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = _tokens(text)
                n = len(toks)
                if n == 0:
                    rows.append((did, 0, 0, 0, 0.0, 0, 0.0, 0, 0.0))
                    continue
                uni = Counter(toks)
                n_chars = sum(c * len(t) for t, c in uni.items())
                top_tok = max(c * len(t) for t, c in uni.items())
                if compute_bigrams and n >= 2:
                    big = Counter(
                        f"{a} {b}" for a, b in zip(toks, toks[1:])
                    )
                    top_big = max(c * len(g) for g, c in big.items())
                else:
                    top_big = 0
                rows.append(
                    (
                        did,
                        n,
                        len(uni),
                        n_chars,
                        (n - len(uni)) / n,
                        top_tok,
                        top_tok / n_chars if n_chars else 0.0,
                        top_big,
                        top_big / n_chars if n_chars else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "n_tokens",
                    "n_distinct_tokens",
                    "n_token_chars",
                    "dup_token_frac",
                    "top_token_chars",
                    "top_token_frac",
                    "top_bigram_chars",
                    "top_bigram_frac",
                ],
            )

    id_type = dict(docs.dtypes)[id_col]
    return docs.select(id_col, text_col).mapInPandas(
        stats, schema=_REP_SCHEMA.format(id_col=id_col, id_type=id_type)
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(ngram, doc_freq, occurrences)`` for every word ``n``-gram
    appearing in at least ``min_docs`` DISTINCT documents.
    ``doc_freq`` counts documents, ``occurrences`` counts total
    (with-multiplicity) occurrences across the corpus."""
    import pandas as pd
    from collections import Counter

    def gen(batches):
        for pdf in batches:
            grams: list[str] = []
            cnts: list[int] = []
            for text in pdf[text_col]:
                toks = _tokens(text)
                if len(toks) < n:
                    continue
                c = Counter(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
                grams.extend(c.keys())
                cnts.extend(c.values())
            yield pd.DataFrame({"ngram": grams, "cnt": cnts})

    per_doc = docs.select(text_col).mapInPandas(
        gen, schema="ngram string, cnt long"
    )
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("cnt").alias("occurrences"),
        )
        .where(F.col("doc_freq") >= min_docs)
    )


def repetition_quality_gate(
    docs: DataFrame,
    min_tokens: int = 20,
    max_dup_token_frac: float = 0.55,
    max_top_bigram_frac: float = 0.12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents passing ALL repetition rules, with the stats that
    admitted them — a pure predicate over the single-scan stats.
    When the bigram rule is disabled (threshold >= 1.0, which every
    doc passes), the stats scan skips the bigram Counter entirely and
    the bigram columns are placeholder zeros."""
    stats = token_repetition_stats(
        docs,
        id_col=id_col,
        text_col=text_col,
        compute_bigrams=max_top_bigram_frac < 1.0,
    )
    return stats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
