"""Corpus-scale BPE tokenizer training and encoding.

Byte-pair-encoding subword learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") structured the
way production tokenizer trainers (SentencePiece, HF tokenizers) run
against large corpora:

- **The only corpus-sized work is ONE word-count aggregation** —
  ``word_counts`` is a single explode + groupBy shuffle whose result is
  *type*-sized (distinct words), not *token*-sized. At 100 TB the
  output is a few million rows regardless of corpus size, and
  ``max_types`` caps it deterministically (count desc, word asc).
- **Merge learning runs driver-side over that bounded table.** The
  classic pair-count/merge loop only ever sees ``(word, count)`` types;
  a 100k-type table trains tens of thousands of merges in seconds.
  This is NOT a driver-side loop over corpus rows — it is the same
  bounded-model pattern as the IVF/PQ codebook training in
  ``pipeline/ann.py``.
- **Encoding broadcasts the learned merges and runs Arrow-batched.**
  ``bpe_encode`` is a pandas UDF (tokenization is genuinely not
  SQL-expressible) with a per-executor word→ids cache, so each distinct
  word in a batch is merged once no matter how often it repeats.

Determinism contract (needed for rerun-stable corpora and the replay
oracle in ``tests/test_tokenizer.py``): merge selection breaks count
ties on the lexicographically smaller pair; vocab ids are ``<unk>`` =
0, then base symbols in sorted order, then merge outputs in merge
order.

Reference parity note: the reference engine counts tokens with a
BPE-ish regex proxy only (see ``text_stats``); a trainable tokenizer is
an engine extension the builder brief's training-data-pipeline scope
asks for (token counting / corpus curation at scale).
"""

# NOTE: no `from __future__ import annotations` here — it stringifies
# the pandas-UDF type hints and Spark's signature inference rejects
# them; 3.11 handles the union syntax natively.
import json
from collections import Counter
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

__all__ = [
    "BpeModel",
    "word_counts",
    "bpe_train",
    "bpe_encode",
    "bpe_encode_word",
    "bpe_decode",
]

#: end-of-word sentinel appended as its own symbol (Sennrich '16 form)
END_OF_WORD = "</w>"
UNK = "<unk>"


def _tokens(col: Column | str, lowercase: bool) -> Column:
    """Whitespace tokens (optionally lowercased), empties dropped —
    the same split both training and encoding use."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    max_types: int | None = None,
) -> DataFrame:
    """Corpus word-frequency table: ``(word, count)``.

    One explode + one groupBy — partial aggregation makes the shuffle
    carry one row per (partition, word), and the result is bounded by
    the number of distinct words, not corpus size. ``max_types`` keeps
    the top-N types deterministically (count desc, word asc) — the
    standard trainer cap; dropped tail types later encode through their
    characters rather than failing.

    DuckDB twin (pinned in tests)::

        SELECT word, count(*) AS count
        FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '\\s+'), t -> t <> ''))
                AS word FROM documents)
        GROUP BY word
    """
    out = (
        df.select(F.explode(_tokens(text_col, lowercase)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if max_types is not None:
        out = out.orderBy(F.col("count").desc(), F.col("word").asc()).limit(
            max_types
        )
    return out


@dataclass
class BpeModel:
    """A trained BPE tokenizer: ordered merges + id-assigned vocab.

    ``vocab`` maps symbol → id with the deterministic layout
    ``<unk>`` = 0, base symbols sorted, merge outputs in merge order.
    Plain data (json-serializable) so it broadcasts cheaply inside the
    encode UDF closure.
    """

    merges: list[tuple[str, str]]
    vocab: dict[str, int]
    lowercase: bool = True
    end_of_word: str = END_OF_WORD
    _ranks: dict[tuple[str, str], int] | None = field(
        default=None, repr=False, compare=False, init=False
    )

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        if self._ranks is None:
            self._ranks = {pair: i for i, pair in enumerate(self.merges)}
        return self._ranks

    @property
    def unk_id(self) -> int:
        return self.vocab[UNK]

    def to_json(self) -> str:
        return json.dumps(
            {
                "merges": [list(p) for p in self.merges],
                "vocab": self.vocab,
                "lowercase": self.lowercase,
                "end_of_word": self.end_of_word,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "BpeModel":
        d = json.loads(s)
        return cls(
            merges=[tuple(p) for p in d["merges"]],
            vocab=d["vocab"],
            lowercase=d["lowercase"],
            end_of_word=d["end_of_word"],
        )


def _word_symbols(word: str, eow: str) -> tuple[str, ...]:
    return tuple(word) + (eow,)


def bpe_train(
    counts: DataFrame | list[tuple[str, int]],
    n_merges: int,
    *,
    lowercase: bool = True,
    end_of_word: str = END_OF_WORD,
    min_pair_count: int = 2,
    max_types: int = 200_000,
) -> BpeModel:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    ``counts`` is the output of :func:`word_counts` (or an explicit
    ``[(word, count), ...]`` list). When it is a DataFrame it is
    collected — bounded by ``max_types`` (top by count desc, word asc),
    enforced here so an uncapped type table cannot flood the driver.

    The learner keeps incremental pair counts with a pair→words index
    (classic Sennrich trainer): each merge touches only the words that
    contain the merged pair, so training cost is proportional to merge
    activity, not types × merges. Stops early when the best pair falls
    below ``min_pair_count`` (merging singletons only memorizes noise).

    Tie-break: highest count, then lexicographically smallest pair —
    replayed verbatim by the pure-Python oracle in the tests.
    """
    if isinstance(counts, DataFrame):
        rows = (
            counts.orderBy(F.col("count").desc(), F.col("word").asc())
            .limit(max_types)
            .collect()
        )
        pairs_in = [(r["word"], int(r["count"])) for r in rows]
    else:
        pairs_in = [(w, int(c)) for w, c in counts][:max_types]

    # word id → (symbol tuple, count); same word never appears twice
    # because word_counts grouped it
    words: dict[int, tuple[tuple[str, ...], int]] = {
        i: (_word_symbols(w, end_of_word), c)
        for i, (w, c) in enumerate(pairs_in)
        if w
    }

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, c) in words.items():
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words.setdefault((a, b), set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, ties → lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wid in list(pair_words.get(best, ())):
            syms, c = words[wid]
            # remove this word's old pair contributions
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wid)
                    if not s:
                        del pair_words[p]
            # re-segment: merge every left-to-right occurrence of best
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            words[wid] = (new_syms, c)
            # add the new contributions back
            for p in zip(new_syms, new_syms[1:]):
                pair_counts[p] += c
                pair_words.setdefault(p, set()).add(wid)

    # deterministic vocab: <unk>, sorted base symbols, merge outputs
    base: set[str] = set()
    for w, _c in pairs_in:
        base.update(w)
    base.add(end_of_word)
    vocab: dict[str, int] = {UNK: 0}
    for s in sorted(base):
        vocab[s] = len(vocab)
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = len(vocab)
    return BpeModel(
        merges=merges,
        vocab=vocab,
        lowercase=lowercase,
        end_of_word=end_of_word,
    )


def bpe_encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    eow: str,
) -> list[str]:
    """Merge one word's symbols greedily by merge rank (GPT-2-style
    apply loop): repeatedly merge the lowest-ranked adjacent pair until
    none of the remaining pairs were learned."""
    syms = list(_word_symbols(word, eow))
    while len(syms) > 1:
        best_rank = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = p
        if best_rank is None:
            break
        merged = best[0] + best[1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best[0]
                and syms[i + 1] == best[1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    model: BpeModel,
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col: array<int>`` — the BPE token ids of
    ``text_col``. Arrow-batched pandas UDF (tokenization is genuinely
    not SQL-expressible); the merge table rides the closure (broadcast
    once per executor) and a word→ids cache makes repeated words free
    within an executor. Map-only: adds no shuffle to the plan."""
    ranks = model.ranks
    vocab = model.vocab
    unk = model.unk_id
    eow = model.end_of_word
    lower = model.lowercase

    @pandas_udf(ArrayType(IntegerType()))
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[int]] = {}

        def enc(text: object) -> list[int]:
            if text is None:
                return []
            s = str(text).lower() if lower else str(text)
            ids: list[int] = []
            for w in s.split():
                got = cache.get(w)
                if got is None:
                    got = [
                        vocab.get(sym, unk)
                        for sym in bpe_encode_word(w, ranks, eow)
                    ]
                    cache[w] = got
                ids.extend(got)
            return ids

        return texts.map(enc)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_decode(ids: list[int], model: BpeModel) -> str:
    """Driver-side inverse (round-trip tests / debugging): ids →
    symbols → words. Unknown ids render as ``<unk>``."""
    inv = {i: s for s, i in model.vocab.items()}
    text = "".join(inv.get(i, UNK) for i in ids)
    return text.replace(model.end_of_word, " ").strip()
