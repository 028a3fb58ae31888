"""Text analysis over document tables: quality scoring, token counting,
language-ID heuristic, fingerprinting.

Everything is pure Column expressions (JVM, codegen) — these run per
document, no joins, so at 100TB they are a single scan + project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "text_quality",
    "token_counts",
    "lang_id_heuristic",
    "doc_fingerprints",
    "tfidf_top_terms",
    "bigram_collocations",
]

# tiny per-language stopword lists for the n-gram-free heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
}

# BPE-ish token pattern: letter runs, digit runs, single non-space symbol
TOKEN_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_counts(docs: DataFrame) -> DataFrame:
    """doc_id + whitespace token count + BPE-ish regex token count."""
    ws_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    )
    bpe_tokens = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), F.lit(0))
    )
    return docs.select(
        "doc_id",
        ws_tokens.alias("n_ws_tokens"),
        bpe_tokens.alias("n_bpe_tokens"),
    )


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, token stats, punctuation and
    stopword ratios, mean token length."""
    text = F.col("text")
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(sw)))
    mean_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_tok, F.lit(1))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_stop / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
    )


def lang_id_heuristic(docs: DataFrame) -> DataFrame:
    """Stopword-hit argmax over LANG_STOPWORDS; tie-break by language
    code ascending; 'und' when no list hits at all."""
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    scored = docs.select("doc_id", toks.alias("_toks"))
    for lang, words in LANG_STOPWORDS.items():
        scored = scored.withColumn(
            f"score_{lang}", F.size(F.filter(F.col("_toks"), lambda t: t.isin(words)))
        )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        guess = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best == 0, F.lit("und")).otherwise(guess)
    return scored.select(
        "doc_id",
        *[F.col(f"score_{lang}") for lang in langs],
        guess.alias("lang_guess"),
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 of the
    whitespace-collapsed lowercase text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def tfidf_top_terms(
    docs: DataFrame, k: int = 5, exact_log: bool = True
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the term-weighting pass a
    training-data pipeline runs for corpus search / topical filtering.

    Tokenization is ASCII-alnum runs (split on ``[^a-zA-Z0-9]+``) so
    token identity is engine-independent (no unicode lowercasing
    ambiguity: the kept tokens are pure ASCII, then lowercased).
    ``score = tf * ln(N/df)``; ties rank by term ascending.

    Plan shape (the 100 TB story): explode + two hash aggregates
    (term frequency per doc, document frequency per term) + one
    broadcast join of the idf dim + one window top-k — no Python in
    the per-token path.  The idf table is computed over the DISTINCT
    document-frequency values (an integer in [1, N], so the dim is at
    most min(|vocab|, N) rows and in practice tiny) rather than per
    vocab row.

    ``exact_log=True`` computes ln on that dim via an Arrow batch
    calling libm (``math.log``) — bit-identical to DuckDB/Postgres/
    numpy-free C engines, which makes the whole operator
    hash-verifiable cross-engine.  ``exact_log=False`` keeps ln
    JVM-side (``F.log``, whole-stage codegen); Java's Math.log may
    differ from libm by 1 ulp, irrelevant for ranking in practice.
    """
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), "[^a-zA-Z0-9]+")).alias("raw"),
        )
        .where(F.col("raw") != "")
        .select("doc_id", F.lower(F.col("raw")).alias("term"))
    )
    # tf is derived from the corpus-wide explode; dfreq and the idf
    # dim both re-read it.  Checkpoint both or the tokenizer pipeline
    # executes three times per query (once per consumer) — one full
    # corpus scan instead of three, and AQE sizes the downstream joins
    # from the materialized stats.
    tf = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=False)
    )
    n_docs_df = docs.agg(F.count("*").alias("n_docs"))

    if exact_log:
        import math

        import pandas as pd

        dfs = dfreq.select("df").distinct().crossJoin(F.broadcast(n_docs_df))

        def _idf(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "df": pdf["df"],
                        "idf": [
                            math.log(n / d)
                            for d, n in zip(pdf["df"], pdf["n_docs"])
                        ],
                    }
                )

        idf_dim = dfs.mapInPandas(_idf, "df long, idf double")
        vocab = dfreq.join(F.broadcast(idf_dim), "df")
    else:
        vocab = dfreq.crossJoin(F.broadcast(n_docs_df)).select(
            "term",
            "df",
            F.log(F.col("n_docs").cast("double") / F.col("df")).alias("idf"),
        )

    from pyspark.sql import Window

    scored = tf.join(vocab.select("term", "df", "idf"), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.col("tf") * F.col("idf")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def bigram_collocations(
    docs: DataFrame, top_n: int = 50, min_count: int = 5
) -> DataFrame:
    """Corpus-level collocation mining: the top-``top_n`` adjacent
    word pairs ranked by LIFT — ``n_ab * T / (n_a * n_b)`` where T is
    the total bigram count and n_a / n_b are the first- / second-slot
    marginals.  Lift is exp(PMI); it ranks identically to PMI without
    a transcendental in the score, so the whole statistic is a ratio
    of exact integers and the cross-engine comparison needs no log
    parity tricks (the one double division is correctly rounded and
    bit-identical everywhere).

    Tokenization matches tfidf_top_terms (ASCII-alnum runs,
    lowercased).  Adjacency is within-document, after dropping
    separator-only fragments.

    Plan shape: explode with position -> lead() window keyed by
    doc_id (one exchange; the same partitioning any per-doc pass
    uses) -> bigram hash aggregate -> two marginal aggregates joined
    back (vocab-sized, AQE-broadcast when small) -> global top-n via
    TakeOrderedAndProject (no single-partition window).  min_count
    prunes the long tail BEFORE the marginal joins — at web scale the
    hapax mass is most of the bigram table.
    """
    from pyspark.sql import Window

    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), "[^a-zA-Z0-9]+")).alias(
                "pos", "raw"
            ),
        )
        .where(F.col("raw") != "")
        .select("doc_id", "pos", F.lower(F.col("raw")).alias("term"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("term_b", F.lead("term").over(w))
        .where(F.col("term_b").isNotNull())
        .select(F.col("term").alias("term_a"), "term_b")
        # every downstream agg re-reads the bigram stream: materialize
        # once (total + marginals + pair counts = 4 consumers)
        .localCheckpoint(eager=False)
    )
    n_ab = (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    n_a = pairs.groupBy("term_a").agg(F.count("*").alias("n_a"))
    n_b = pairs.groupBy("term_b").agg(F.count("*").alias("n_b"))
    total = pairs.agg(F.count("*").alias("t_total"))
    scored = (
        n_ab.join(n_a, "term_a")
        .join(n_b, "term_b")
        .crossJoin(F.broadcast(total))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("t_total")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(top_n)
