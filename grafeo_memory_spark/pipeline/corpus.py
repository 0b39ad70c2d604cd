"""Composed training-corpus construction: the canonical LLM-data
recipe — clean → quality-filter → exact dedup → LM perplexity cut →
fuzzy dedup → span dedup → SemDeDup (embedding clusters) →
decontaminate → mixture-sample — as ONE configurable call with
per-stage accounting.

Each stage is the already-tested operator from its own module
(`cleaning` / `dedup` / `decontamination` / `sampling`); this layer
only sequences them and records what each stage did. The composition
matters at 100 TB because stage ORDER is a cost decision:

- cheap map-only stages (cleaning, quality flags) run FIRST so every
  later shuffle touches fewer bytes;
- exact dedup (one hash shuffle) runs before fuzzy dedup (shingle
  explode + band join) so the expensive sketch never sees verbatim
  copies;
- decontamination's broadcast anti-join and the mixture sample's
  map-only filter run LAST, on the smallest corpus.

Laziness contract: with ``count_stages=False`` (the default) the whole
recipe composes into Spark plans with ZERO driver-side actions besides
the mixture solve's |domains|-row aggregate — call it, then write the
result once. ``count_stages=True`` is the audit mode: each stage's
output is ``localCheckpoint``-materialized and counted ONCE (the
before-count reuses the previous stage's after-count), so an N-stage
recipe costs N single-stage executions — never a re-run of the whole
prefix per count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.cleaning import (
    gopher_quality_flags,
    mask_pii,
    normalize_whitespace,
    remove_urls,
    strip_html,
)
from grafeo_memory_spark.pipeline.decontamination import decontaminate
from grafeo_memory_spark.pipeline.lm import LmModel, lm_perplexity
from grafeo_memory_spark.pipeline.dedup import (
    dedup_spans_global,
    exact_dedup,
    near_dedup,
    near_dedup_simhash,
)
from grafeo_memory_spark.pipeline.sampling import mixture_sample

__all__ = ["CorpusRecipe", "StageReport", "build_training_corpus"]


@dataclass
class CorpusRecipe:
    """Which stages run and with what knobs. Every stage is optional;
    the defaults mirror the published C4/Gopher/GPT-3 settings the
    individual operators document."""

    clean: bool = True                 # HTML strip + URL removal + PII mask
    quality: bool = True               # Gopher rule family
    min_words: int = 50
    exact: bool = True                 # content-hash dedup
    lm_max_ppl: float | None = None    # CCNet perplexity cut (needs lm_model)
    fuzzy: bool = True                 # near-dup tier + components
    fuzzy_method: str = "minhash"      # 'minhash' (Jaccard) | 'simhash'
    jaccard_threshold: float = 0.5
    simhash_max_hamming: int = 3       # simhash path's distance cut
    spans: bool = False                # C4 global span dedup (line corpora)
    span: int = 3
    span_sep: str = "\n"
    semantic: bool = False             # SemDeDup (needs embeddings)
    semantic_eps: float = 0.35
    semantic_centroids: int = 64
    decontaminate: bool = True         # needs a benchmark DataFrame
    ngram: int = 13
    mixture: dict | None = None        # {domain: weight} over domain_col
    domain_col: str = "source"
    salt: int = 0
    tokenize: bool = False             # append BPE token_ids/n_tokens
    bpe_merges: int = 4096
    bpe_max_types: int = 200_000
    model_quality: bool = False        # classifier + Pareto (needs model)
    pareto_alpha: float = 9.0


@dataclass
class StageReport:
    """Per-stage accounting: rows in/out when counting is on, always
    the stage list actually executed (order matters for audits)."""

    stages: list[str] = field(default_factory=list)
    rows: dict[str, tuple[int | None, int | None]] = field(
        default_factory=dict
    )

    def record(
        self, name: str, before: int | None, after: int | None
    ) -> None:
        self.stages.append(name)
        self.rows[name] = (before, after)


def build_training_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    lm_model: LmModel | None = None,
    embeddings: DataFrame | None = None,
    emb_col: str = "embedding",
    emb_id_col: str | None = None,
    quality_model: "object | None" = None,
    recipe: CorpusRecipe | None = None,
    count_stages: bool = False,
) -> tuple[DataFrame, StageReport]:
    """Run the configured corpus recipe; returns (result, report).
    The result preserves ``docs``' schema (text rewritten in place by
    the cleaning/span stages)."""
    r = recipe or CorpusRecipe()
    report = StageReport()
    cur = docs
    prev_count: int | None = docs.count() if count_stages else None

    def step(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal prev_count
        if count_stages:
            # materialize so this count (and the next stage) executes
            # only THIS stage's plan; the before-count is the previous
            # stage's after-count — one count() per boundary, total
            nxt = nxt.localCheckpoint()
            before, after = prev_count, nxt.count()
            prev_count = after
        else:
            before = after = None
        report.record(name, before, after)
        return nxt

    if r.clean:
        cleaned = normalize_whitespace(
            mask_pii(remove_urls(strip_html(F.col(text_col))))
        )
        cur = step("clean", cur.withColumn(text_col, cleaned))
    if r.quality:
        flags = gopher_quality_flags(F.col(text_col), min_words=r.min_words)
        cur = step("quality", cur.where(flags.getField("keep")))
    if r.exact:
        cur = step("exact_dedup", exact_dedup(cur, text_col, id_col))
    if r.lm_max_ppl is not None and lm_model is not None:
        # CCNet cut after exact dedup (verbatim copies never pay the
        # scoring explode) and before the fuzzy sketch (fewer docs to
        # shingle). Null-scored docs (<2 tokens) drop with the tail.
        scored = lm_perplexity(cur, lm_model, text_col=text_col,
                               id_col=id_col)
        cur = step(
            "lm_filter",
            scored.where(F.col("lm_ppl") <= r.lm_max_ppl).drop(
                "lm_nll", "lm_ppl", "lm_bigrams"
            ),
        )
    if r.fuzzy:
        if r.fuzzy_method == "simhash":
            cur = step(
                "fuzzy_dedup_simhash",
                near_dedup_simhash(
                    cur, text_col, id_col,
                    max_hamming=r.simhash_max_hamming,
                ),
            )
        elif r.fuzzy_method == "minhash":
            cur = step(
                "fuzzy_dedup",
                near_dedup(
                    cur, text_col, id_col,
                    jaccard_threshold=r.jaccard_threshold,
                ),
            )
        else:
            raise ValueError(
                "CorpusRecipe.fuzzy_method must be 'minhash' or "
                f"'simhash', got {r.fuzzy_method!r}"
            )
    if r.spans:
        cur = step(
            "span_dedup",
            dedup_spans_global(
                cur, text_col, id_col, span=r.span, sep=r.span_sep
            ),
        )
    if r.semantic and embeddings is not None:
        # SemDeDup after the textual dedups (verbatim and near-verbatim
        # copies are cheaper to kill by hash/shingle than by embedding)
        # and before decontamination, on the smallest corpus that still
        # has its duplicate structure. The embeddings side is first
        # semi-joined down to the surviving ids, so clustering cost
        # tracks the filtered corpus, not the raw one.
        from grafeo_memory_spark.pipeline.ann import ivf_train
        from grafeo_memory_spark.pipeline.dedup import semdedup

        eid = emb_id_col or id_col
        emb_cur = embeddings.join(
            cur.select(F.col(id_col).alias(eid)).distinct(),
            eid,
            "left_semi",
        )
        cents = ivf_train(
            emb_cur, r.semantic_centroids, vec_col=emb_col, id_col=eid,
            iterations=2,
        )
        keep = semdedup(
            emb_cur, cents, eps=r.semantic_eps, vec_col=emb_col, id_col=eid
        ).select(F.col(eid).alias(id_col))
        cur = step("semantic_dedup", cur.join(keep, id_col, "left_semi"))
    if r.decontaminate and benchmark is not None:
        cur = step(
            "decontaminate",
            decontaminate(
                cur, benchmark, text_col=text_col, id_col=id_col,
                bench_text_col=bench_text_col, n=r.ngram,
            ),
        )
    if r.model_quality and quality_model is not None:
        # model-based quality pass after the dedups (don't waste
        # classifier scores on rows a hash would kill) and before the
        # mixture, so realized domain shares reflect what survives
        from grafeo_memory_spark.pipeline.quality_classifier import (
            pareto_filter,
        )

        scored = quality_model.score(cur, text_col=text_col)
        cur = step(
            "model_quality",
            pareto_filter(
                scored,
                quality_model.score_col,
                id_col,
                alpha=r.pareto_alpha,
                salt=r.salt,
            ).drop(quality_model.score_col),
        )
    if r.mixture:
        cur = step(
            "mixture_sample",
            mixture_sample(
                cur, r.domain_col, r.mixture, id_col=id_col, salt=r.salt
            ),
        )
    if r.tokenize:
        # tokenizer trains on (and encodes) the FINAL corpus — the
        # published order (tokenize after mixing, GPT/LLaMA pipelines):
        # the vocab reflects the data the model will actually see. The
        # train side is one word-count shuffle over the surviving docs;
        # encoding is map-only.
        from grafeo_memory_spark.pipeline.tokenizer import (
            bpe_encode,
            bpe_train,
            word_counts,
        )

        model = bpe_train(
            word_counts(cur, text_col),
            r.bpe_merges,
            max_types=r.bpe_max_types,
        )
        cur = step(
            "tokenize",
            bpe_encode(cur, text_col, model).withColumn(
                "n_tokens", F.size("token_ids")
            ),
        )
    return cur, report
