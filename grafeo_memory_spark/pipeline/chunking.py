"""Document chunking for pre-training: split each document into
token-budget windows with optional overlap (stride), the step that sits
between corpus curation and sequence packing (``sampling.pack_greedy``)
in a training-data pipeline.

Pure Column codegen — split, ``sequence`` of window starts, one
``posexplode`` (the only row-multiplying op; map-side, no shuffle),
``slice`` + ``concat_ws`` — so the whole op stays in whole-stage
codegen and scales as a map over the corpus. Each output row carries
``(id, chunk_idx, chunk_text, chunk_tokens)``; the oracle twin in
``tests/test_chunking.py`` replays it with ``generate_series`` +
``list_slice`` in DuckDB.

Semantics (the common fixed-window contract, e.g. GPT-2 data prep and
retrieval chunkers):

- windows start at ``0, step, 2·step, …`` over the whitespace tokens
  (``step = max_tokens - overlap``), while the start is strictly inside
  the document;
- every window takes up to ``max_tokens`` tokens, so the final window
  is the (possibly short) tail;
- an empty/whitespace-only document emits zero rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "chunk_token_ids"]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into whitespace-token windows of at most
    ``max_tokens`` tokens, consecutive windows overlapping by
    ``overlap`` tokens. Output: ``id_col, chunk_idx, chunk_text,
    chunk_tokens`` (all other input columns preserved — chunks inherit
    their document's metadata).

    Map-only (one ``posexplode``, no shuffle); downstream writers
    usually follow with ``pack_greedy`` or a repartition on their own
    keys.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap

    toks: Column = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    # window starts strictly inside the doc: 0, step, ... <= n-1
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step)))
    passthrough = [c for c in df.columns if c != text_col]
    out = (
        df.select(
            *passthrough,
            toks.alias("__toks"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            *passthrough,
            "chunk_idx",
            F.concat_ws(
                " ", F.slice("__toks", F.col("__start") + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.size("__toks") - F.col("__start")
            ).alias("chunk_tokens"),
        )
    )
    return out


def chunk_token_ids(
    df: DataFrame,
    ids_col: str = "token_ids",
    *,
    max_tokens: int = 2048,
    overlap: int = 0,
) -> DataFrame:
    """Window an already-encoded id array (``tokenizer.bpe_encode``
    output) into *true* token-budget chunks — the form a training
    writer consumes directly. Same window semantics and map-only shape
    as :func:`chunk_documents`, but over ``array<int>`` so the budget
    is exact rather than a whitespace proxy. Output: input columns
    minus ``ids_col``, plus ``chunk_idx, chunk_ids, chunk_tokens``."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    n = F.size(F.col(ids_col))
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(step)))
    passthrough = [c for c in df.columns if c != ids_col]
    return (
        df.select(
            *passthrough,
            F.col(ids_col).alias("__ids"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            *passthrough,
            "chunk_idx",
            F.slice("__ids", F.col("__start") + 1, max_tokens).alias(
                "chunk_ids"
            ),
            F.least(
                F.lit(max_tokens), F.size("__ids") - F.col("__start")
            ).alias("chunk_tokens"),
        )
    )
