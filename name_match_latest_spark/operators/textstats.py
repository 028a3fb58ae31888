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
    "lm_bigram_nll",
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
    pairs = toks.withColumn("term_b", F.lead("term").over(w)).where(
        F.col("term_b").isNotNull()
    ).select(F.col("term").alias("term_a"), "term_b")
    # aggregate the raw bigram stream ONCE, then derive the marginals
    # and the total from the (much smaller, vocab²-bounded) count
    # table — integer sums, so the values are identical to counting
    # the raw stream four times, but the token explode + lead window
    # execute once instead of four times (the checkpointed-raw-pairs
    # form still re-read the materialized stream per aggregate)
    bi = (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count("*").alias("_n"))
        .localCheckpoint(eager=False)
    )
    n_ab = bi.where(F.col("_n") >= min_count).withColumnRenamed("_n", "n_ab")
    n_a = bi.groupBy("term_a").agg(F.sum("_n").alias("n_a"))
    n_b = bi.groupBy("term_b").agg(F.sum("_n").alias("n_b"))
    total = bi.agg(F.sum("_n").alias("t_total"))
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


#: fixed-point scale for quantized ln values (lm_bigram_nll): ln of a
#: 2^31 count is ~21.5, so quantized values stay under 2^45 and a
#: million-bigram document's integer sum stays far inside int64
LN_FX_SCALE = 1 << 32


def lm_bigram_nll(
    docs: DataFrame,
    train: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model score — the CCNet-style
    "LM perplexity" quality signal: how typical is this document of
    the (training) corpus?  Returns ``(doc_id, n_bigrams, n_oov,
    nll_fx, nll)`` where ``nll`` is the average negative
    log-likelihood over the doc's scored bigrams under the MLE bigram
    model ``p(w2|w1) = c(w1 w2) / c(w1 ·)`` trained on ``train``
    (default: ``docs`` itself — self-scoring, where both filter tails
    matter: LOW nll is boilerplate/templated spam, HIGH nll is
    garbage).  With a separate ``train``, bigrams unseen in training
    are counted in ``n_oov`` and excluded from the average (an MLE
    model assigns them no finite likelihood).  Every doc gets a row;
    docs with <2 tokens score 0.0 over 0 bigrams.

    Bit-reproducibility (the PageRank/centroid fixed-point trick
    composed with the TF-IDF libm trick): each distinct count ``c``
    gets ``lq(c) = floor(ln(c) * 2^32)`` computed ONCE on a tiny
    distinct-count dim via an Arrow batch calling libm ``math.log``
    (bit-identical to DuckDB/Postgres ``ln``); a doc's
    ``nll_fx = sum(cnt * (lq(c_ctx) - lq(c_bigram)))`` is then an
    INTEGER sum — associative, partition-order-free — and ``nll`` is
    one correctly-rounded division of exact integers.  The float
    summation-order problem never arises because no float is ever
    summed.

    Plan shape: one Arrow scan emits per-doc distinct bigrams with
    local counts (map-side combine, the boilerplate_ngrams pattern);
    two hash aggregates train the model (bigram + context counts, the
    same df-spread keys the collocation/decontam passes shuffle); the
    count joins are plain equi-joins; the ln dim is distinct-count
    sized (<= a few thousand rows) and broadcast.  Tokenization is
    the dedup family's contract (lowercase, ASCII-``\\s+``).
    """
    import pandas as pd

    from .repetition import _tokens

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            ids: list = []
            w1s: list[str] = []
            w2s: list[str] = []
            cnts: list[int] = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = _tokens(text)
                if len(toks) < 2:
                    continue
                c = Counter(zip(toks, toks[1:]))
                for (a, b), n in c.items():
                    ids.append(did)
                    w1s.append(a)
                    w2s.append(b)
                    cnts.append(n)
            yield pd.DataFrame(
                {id_col: ids, "w1": w1s, "w2": w2s, "cnt": cnts}
            )

    id_type = dict(docs.dtypes)[id_col]
    bg_schema = f"{id_col} {id_type}, w1 string, w2 string, cnt long"
    bg = docs.select(id_col, text_col).mapInPandas(gen, schema=bg_schema)
    if train is None:
        # self-scoring: the scored bigram stream IS the training
        # stream — checkpoint it once for its three consumers
        bg = bg.localCheckpoint(eager=False)
        train_bg = bg
    else:
        # two consumers (bigram + context counts): checkpoint or the
        # train tokenizer pass runs twice
        train_bg = (
            train.select(id_col, text_col)
            .mapInPandas(gen, schema=bg_schema)
            .localCheckpoint(eager=False)
        )

    # each count table feeds the scoring join AND the ln dim below
    cab = (
        train_bg.groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    ca = (
        train_bg.groupBy("w1")
        .agg(F.sum("cnt").alias("c_a"))
        .localCheckpoint(eager=False)
    )

    scored = bg.join(cab, ["w1", "w2"], "left").join(ca, "w1", "left")

    # ln over the DISTINCT count values only (the tfidf df-dim trick)
    # — derived from the count tables, NOT from `scored` (whose
    # lineage would re-execute both scoring joins just to list counts)
    counts_dim = (
        cab.select(F.col("c_ab").alias("c"))
        .unionByName(ca.select(F.col("c_a").alias("c")))
        .distinct()
    )

    def _lq(batches):
        import math

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "c": pdf["c"],
                    "lq": [
                        int(math.floor(math.log(c) * LN_FX_SCALE))
                        for c in pdf["c"]
                    ],
                }
            )

    lq_dim = counts_dim.mapInPandas(_lq, "c long, lq long").localCheckpoint(
        eager=False
    )  # consumed twice; rebuilding it re-runs the count-dim distinct
    lq_ab = lq_dim.select(
        F.col("c").alias("_c_ab"), F.col("lq").alias("_lq_ab")
    )
    lq_a = lq_dim.select(F.col("c").alias("_c_a"), F.col("lq").alias("_lq_a"))
    scored = (
        scored.join(
            F.broadcast(lq_ab), F.col("c_ab") == F.col("_c_ab"), "left"
        )
        .drop("_c_ab")
        .join(F.broadcast(lq_a), F.col("c_a") == F.col("_c_a"), "left")
        .drop("_c_a")
    )
    oov = F.col("c_ab").isNull()
    agg = scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.when(oov, F.col("cnt")).otherwise(F.lit(0))).alias("n_oov"),
        F.sum(
            F.when(oov, F.lit(0)).otherwise(
                F.col("cnt") * (F.col("_lq_a") - F.col("_lq_ab"))
            )
        ).alias("nll_fx"),
    )
    n_scored = F.col("n_bigrams") - F.col("n_oov")
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("nll_fx", F.lit(0)).alias("nll_fx"),
            F.when(
                F.coalesce(n_scored, F.lit(0)) > 0,
                F.col("nll_fx").cast("double")
                / (n_scored * F.lit(LN_FX_SCALE)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("nll"),
        )
    )
