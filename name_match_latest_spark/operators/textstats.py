"""Text analysis over document tables: quality scoring, token counting,
language-ID heuristic, fingerprinting.

Everything is pure Column expressions (JVM, codegen) — these run per
document, no joins, so at 100TB they are a single scan + project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["text_quality", "token_counts", "lang_id_heuristic", "doc_fingerprints"]

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
