"""Text-analysis operators for corpus curation: language-ID heuristic,
quality scoring, token counting, document fingerprinting — all native
Column expressions (JVM-side, codegen'd; no Python in the scan path),
each with a DuckDB-expressible twin for the oracle gate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.dedup import shingle_hash, word_shingles

__all__ = [
    "STOPWORDS",
    "stopword_ratio",
    "lang_id",
    "token_count_ws",
    "token_count_bpe_ish",
    "quality_score",
    "doc_fingerprint",
]

#: small per-language stopword lists (n-gram-free heuristic: the
#: highest stopword hit-ratio wins; 'und' = undetermined when no list
#: matches). Deliberately tiny so the oracle SQL stays identical.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "de", "et", "un", "une", "que", "pour", "dans", "est"],
}

_WORD_RE = "[^a-z0-9]+"
#: BPE-ish unit: a word, a number run, or one punctuation char — the
#: standard cheap proxy for subword token counts
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), _WORD_RE), lambda t: t != "")


def stopword_ratio(col: Column | str, lang: str) -> Column:
    """Fraction of words that are stopwords of ``lang``; 0 for empty."""
    words = _words(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(words)
    )


def lang_id(col: Column | str) -> Column:
    """Language-ID heuristic: argmax stopword ratio across the known
    lists, 'und' when every ratio is 0. Ties break in alphabetical
    language order (deterministic, matched by the oracle)."""
    ratios = {lang: stopword_ratio(col, lang) for lang in sorted(STOPWORDS)}
    best = reduce(F.greatest, ratios.values())
    out = F.lit("und")
    # reversed so that earlier (alphabetical) languages win exact ties
    for lang in sorted(STOPWORDS, reverse=True):
        out = F.when(
            (ratios[lang] > 0) & (ratios[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


def token_count_bpe_ish(col: Column | str) -> Column:
    """Subword-proxy token count: words + number runs + punctuation
    marks (``BPE_TOKEN_RE``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def quality_score(col: Column | str, target_len: int = 500) -> Column:
    """Document-quality composite in [0,1] — the standard cheap signals
    (length, stopword density, punctuation excess, word-length sanity):

      0.35·min(1, chars/target) + 0.30·min(1, 3·stopword_ratio_en)
      + 0.20·(1 − punct_ratio) + 0.15·mean_word_len_in_[3,12]
    """
    c = F.col(col) if isinstance(col, str) else col
    words = _words(c)
    n_chars = F.length(c)
    len_score = F.least(F.lit(1.0), n_chars.cast("double") / target_len)
    stop = F.least(F.lit(1.0), F.lit(3.0) * stopword_ratio(c, "en"))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / n_chars
    )
    mean_wl = F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)).cast("double")
        / F.size(words)
    )
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        F.lit(0.35) * len_score
        + F.lit(0.30) * stop
        + F.lit(0.20) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.15) * wl_ok
    )


def doc_fingerprint(col: Column | str, n: int = 3, k: int = 8) -> Column:
    """Bottom-k sketch fingerprint: the k smallest shingle hashes,
    sorted and md5'd into one hex id. Two documents share a fingerprint
    iff their k minimal shingle hashes coincide — a compact near-dup
    blocking key (rolling-hash family)."""
    hashes = F.transform(
        word_shingles(col, n), lambda g: shingle_hash(g, 0)
    )
    bottom = F.slice(F.array_sort(hashes), 1, k)
    return F.md5(F.concat_ws(",", F.transform(bottom, lambda v: v.cast("string"))))
