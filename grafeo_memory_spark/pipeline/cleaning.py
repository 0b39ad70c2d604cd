"""Corpus cleaning + heuristic quality filters (builder brief): the
C4/Gopher-style preprocessing stages a training-data pipeline runs
before dedup — boilerplate stripping, PII masking, and repetition /
composition signals.

Everything is a pure Column expression (regexp + array higher-order
functions) — whole-stage codegen, no UDFs, scan-speed at any corpus
size. Filters compose: ``docs.where(quality_flags(...).getField(...))``
pushes straight into the parquet scan.

Heuristics follow the published C4 (Raffel et al. 2020 §2.2) and
Gopher (Rae et al. 2021 A.1.1) rule families; thresholds are the
commonly cited ones and are parameters, not constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "strip_html",
    "remove_urls",
    "normalize_whitespace",
    "mask_pii",
    "duplicate_line_fraction",
    "top_word_ratio",
    "symbol_to_word_ratio",
    "mean_word_length",
    "gopher_quality_flags",
]

_URL_RE = r"(https?://|www\.)[^\s<>\"]+"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"
_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_html(col: Column | str) -> Column:
    """Drop tags, decode the common entities, collapse the residue."""
    out = F.regexp_replace(_c(col), r"<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def remove_urls(col: Column | str, replacement: str = "") -> Column:
    return F.regexp_replace(_c(col), _URL_RE, replacement)


def normalize_whitespace(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def mask_pii(col: Column | str) -> Column:
    """Mask emails, phone-shaped digit runs, and IPv4 literals with
    typed placeholders (the irreversible scrub used before a corpus
    leaves the trust boundary)."""
    out = F.regexp_replace(_c(col), _EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, _IP_RE, "<IP>")
    out = F.regexp_replace(out, _PHONE_RE, "<PHONE>")
    return out


def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of lines that are exact repeats of an earlier line
    (Gopher: drop if > 0.3). 0.0 for single-line docs."""
    lines = F.filter(
        F.transform(F.split(_c(col), r"\n"), F.trim),
        lambda x: x != "",
    )
    n = F.size(lines)
    uniq = F.size(F.array_distinct(lines))
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - uniq).cast("double") / n
    )


def _words(col: Column | str) -> Column:
    return F.filter(
        F.split(F.lower(_c(col)), r"[^a-z0-9']+"), lambda w: w != ""
    )


def top_word_ratio(col: Column | str) -> Column:
    """Occurrences of the most frequent word / total words (C4-family
    repetition signal; boilerplate and keyword-stuffed docs score
    high).

    O(n log n) per row: sort the word array, then ONE fold tracking the
    longest run of equal adjacent words (max run length in the sorted
    array == max word frequency). Still shuffle-free pure-Column; the
    earlier distinct×filter formulation was O(words × distinct-words)
    per row — a per-core CPU bomb on long documents (~10⁹ comparisons
    at Gopher's own max_words=100k)."""
    ws = _words(col)
    n = F.size(ws)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, w: Column) -> Column:
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(F.array_sort(ws), init, step, lambda acc: acc["best"])
    return F.when(n <= 0, F.lit(0.0)).otherwise(top.cast("double") / n)


def symbol_to_word_ratio(col: Column | str) -> Column:
    """(# of #, …, ellipsis-like symbols) / words (Gopher: drop if
    > 0.1)."""
    c = _c(col)
    sym = (
        F.length(c)
        - F.length(F.regexp_replace(c, r"[#…]", ""))
        + 3 * F.size(F.split(c, r"\.\.\.")) - 3
    )
    n = F.size(_words(col))
    return F.when(n <= 0, F.lit(0.0)).otherwise(sym.cast("double") / n)


def mean_word_length(col: Column | str) -> Column:
    ws = _words(col)
    n = F.size(ws)
    total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n <= 0, F.lit(0.0)).otherwise(total.cast("double") / n)


def gopher_quality_flags(
    col: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_dup_line_frac: float = 0.3,
    max_top_word_ratio: float = 0.2,
    max_symbol_ratio: float = 0.1,
) -> Column:
    """The Gopher rule family as one struct of booleans + the overall
    ``keep`` verdict — select it once, filter on ``.getField('keep')``,
    keep the per-rule flags for the rejection-reasons dashboard."""
    n = F.size(_words(col))
    mwl = mean_word_length(col)
    checks = {
        "word_count_ok": (n >= min_words) & (n <= max_words),
        "mean_word_len_ok": (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len),
        "dup_lines_ok": duplicate_line_fraction(col) <= max_dup_line_frac,
        "repetition_ok": top_word_ratio(col) <= max_top_word_ratio,
        "symbols_ok": symbol_to_word_ratio(col) <= max_symbol_ratio,
    }
    keep = F.lit(True)
    for c in checks.values():
        keep = keep & c
    return F.struct(
        *[v.alias(k) for k, v in checks.items()], keep.alias("keep")
    )
