"""Driver queries for the LLM-corpus construction operators (builder
brief first-class components): C4 global span dedup, GPT-3-style
benchmark decontamination, Gopher quality signals, and deterministic
stratified / domain-mixture sampling — each hash-verified against a
DuckDB replay of the identical arithmetic (portable md5 hashing, ratio
math mirrored term-for-term).

These took the registry slots freed by merging the near-duplicate
relational rows (VERDICT r4 item 1): the §2 operators keep green rows
through the merged queries; the corpus layer gains driver-grade
oracle evidence it previously only had via pytest replay oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.cleaning import (
    duplicate_line_fraction,
    mean_word_length,
    symbol_to_word_ratio,
    top_word_ratio,
)
from grafeo_memory_spark.pipeline.decontamination import contamination_matches
from grafeo_memory_spark.pipeline.lm import ccnet_buckets, lm_scores, lm_train
from grafeo_memory_spark.pipeline.dedup import dedup_spans_global
from grafeo_memory_spark.pipeline.sampling import (
    length_bucket,
    mixture_sample,
    shuffle_rows,
    stratified_sample,
    weighted_sample_per_key,
    take_per_key,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.queries.pipeline_ops_q import (
    _QUALITY_SQL,
    _hash_sql,
    _shingles_sql,
)
from grafeo_memory_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------- SQL
# fragments mirroring pipeline/cleaning.py exactly

#: words as cleaning._words defines them: lowercase, split on runs of
#: anything outside [a-z0-9'], drop empties ('' doubles the quote in SQL)
_CWORDS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),"
    " w -> w <> '')"
)

#: trimmed non-blank lines as cleaning.duplicate_line_fraction builds them
_CLINES = (
    "list_filter(list_transform(string_split(text, chr(10)),"
    " l -> trim(l)), l -> l <> '')"
)

_DUP_LINE_SQL = (
    f"(CASE WHEN len({_CLINES}) <= 0 THEN 0.0 ELSE "
    f"(len({_CLINES}) - len(list_distinct({_CLINES})))::DOUBLE"
    f" / len({_CLINES}) END)"
)

# quadratic distinct×filter is fine for the ORACLE (sf0.01 docs are
# tiny); the Spark side uses the O(n log n) sorted run-length fold —
# max run length in the sorted array == max word frequency
_TOP_WORD_SQL = (
    f"(CASE WHEN len({_CWORDS}) <= 0 THEN 0.0 ELSE "
    f"list_max(list_transform(list_distinct({_CWORDS}),"
    f" w -> len(list_filter({_CWORDS}, x -> x = w))))::DOUBLE"
    f" / len({_CWORDS}) END)"
)

_MWL_SQL = (
    f"(CASE WHEN len({_CWORDS}) <= 0 THEN 0.0 ELSE "
    f"list_sum(list_transform({_CWORDS}, w -> length(w)))::DOUBLE"
    f" / len({_CWORDS}) END)"
)

_SYM_SQL = (
    "(CASE WHEN len({w}) <= 0 THEN 0.0 ELSE "
    "(length(text) - length(regexp_replace(text, '[#…]', '', 'g'))"
    r" + 3 * len(string_split_regex(text, '\.\.\.')) - 3)::DOUBLE"
    " / len({w}) END)"
).format(w=_CWORDS)

#: deterministic md5 Bernoulli uniform from sampling.stratified_sample:
#: first 8 hex chars of md5(id:salt) / 16^8
def _u_sql(salt: int) -> str:
    return (
        f"(('0x' || substr(md5(doc_id::VARCHAR || ':{salt}'), 1, 8))"
        "::BIGINT::DOUBLE / 4294967296.0)"
    )


# ------------------------------------------------------------ queries


@query(
    "span_dedup",
    oracle="""
    WITH ls AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> trim(x) <> '')
               AS lines
      FROM documents
    ),
    units AS (
      SELECT doc_id, i - 1 AS pos, lines[i] AS unit FROM (
        SELECT doc_id, lines,
               unnest(generate_series(1, len(lines))) AS i
        FROM ls)
    ),
    spans AS (
      SELECT doc_id, i AS pos,
             array_to_string(lines[i + 1 : i + 5], ' ') AS sp
      FROM (
        SELECT doc_id, lines,
               unnest(generate_series(0, len(lines) - 5)) AS i
        FROM ls WHERE len(lines) >= 5)
    ),
    keeper AS (
      SELECT sp, min(doc_id * 1000000 + pos) AS k FROM spans GROUP BY sp
    ),
    removed AS (
      SELECT DISTINCT doc_id, pos + j AS pos FROM (
        SELECT spans.doc_id, spans.pos,
               unnest(generate_series(0, 4)) AS j
        FROM spans JOIN keeper USING (sp)
        WHERE spans.doc_id * 1000000 + spans.pos <> keeper.k)
    ),
    rebuilt AS (
      SELECT u.doc_id, string_agg(u.unit, ' ' ORDER BY u.pos) AS txt
      FROM units u
      WHERE NOT EXISTS (SELECT 1 FROM removed r
                        WHERE r.doc_id = u.doc_id AND r.pos = u.pos)
      GROUP BY u.doc_id
    )
    SELECT d.doc_id, md5(COALESCE(rb.txt, '')) AS text_md5,
           CAST(length(COALESCE(rb.txt, '')) AS BIGINT) AS n_chars
    FROM documents d LEFT JOIN rebuilt rb USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup (`pipeline/dedup.dedup_spans_global`,
    Raffel et al. 2020 §2.2): any 5-run of consecutive units occurring
    more than once corpus-wide survives only at its smallest (id, pos)
    occurrence; later occurrences are cut and the doc reassembled. The
    driver documents are single-line, so the unit separator here is the
    space (word-run dedup) — same operator, and with the small synthetic
    vocabulary the removal path is genuinely exercised. The oracle
    replays first-occurrence election, span-window removal, and
    reassembly on the span *strings* (Spark groups on xxhash64 of the
    same strings — equality of groups, not of hash values, is what the
    semantics need). Rewritten text compares as md5 + length."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    out = dedup_spans_global(docs, "text", "doc_id", span=5, sep=" ")
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


@query(
    "decontamination_matches",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT {_hash_sql('g', 0)} AS h FROM (
        SELECT unnest({_shingles_sql(13)}) AS g
        FROM documents WHERE doc_id < 10)
    ),
    grams AS (
      SELECT doc_id, {_hash_sql('g', 0)} AS h FROM (
        SELECT doc_id, unnest({_shingles_sql(13)}) AS g FROM documents)
    ),
    hits AS (
      SELECT doc_id, count(*) AS matched_ngrams
      FROM grams JOIN bench USING (h) GROUP BY doc_id
    ),
    totals AS (
      SELECT doc_id, count(*) AS total_ngrams FROM grams
      WHERE doc_id IN (SELECT doc_id FROM hits) GROUP BY doc_id
    )
    SELECT h.doc_id, h.matched_ngrams, t.total_ngrams,
           round(h.matched_ngrams::DOUBLE / t.total_ngrams, 6)
             AS matched_fraction
    FROM hits h JOIN totals t USING (doc_id)
    ORDER BY h.doc_id
    """,
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style benchmark decontamination evidence
    (`pipeline/decontamination.contamination_matches`, Brown et al.
    2020 §C): per-doc count of word 13-grams colliding with the
    benchmark set's n-gram hashes. Benchmark = the first ten documents
    (standing in for an eval set; every one of them self-matches, and
    the small vocabulary produces genuine cross-doc collisions too).
    The corpus side is map-only with the benchmark hash set broadcast —
    the plan the 100 TB deployment runs."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    bench = docs.where(F.col("doc_id") < 10).select(
        F.col("text").alias("prompt")
    )
    m = contamination_matches(
        docs, bench, text_col="text", id_col="doc_id",
        bench_text_col="prompt", n=13,
    )
    return m.select(
        F.col("id").alias("doc_id"),
        "matched_ngrams",
        "total_ngrams",
        F.round("matched_fraction", 6).alias("matched_fraction"),
    ).orderBy("doc_id")


@query(
    "gopher_quality_flags",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_CWORDS}) AS BIGINT) AS n_words,
           round({_MWL_SQL}, 6) AS mean_word_len,
           round({_DUP_LINE_SQL}, 6) AS dup_line_frac,
           round({_TOP_WORD_SQL}, 6) AS top_word,
           round({_SYM_SQL}, 6) AS symbol_ratio,
           (len({_CWORDS}) BETWEEN 50 AND 100000
            AND {_MWL_SQL} BETWEEN 3.0 AND 10.0
            AND {_DUP_LINE_SQL} <= 0.3
            AND {_TOP_WORD_SQL} <= 0.2
            AND {_SYM_SQL} <= 0.1) AS keep,
           (CASE WHEN n_chars < 200 THEN 0
                 WHEN n_chars < 400 THEN 1
                 ELSE 2 END) AS len_bucket
    FROM documents ORDER BY doc_id
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-family quality signals (`pipeline/cleaning`, Rae et
    al. 2021 A.1.1) per document: word count, mean word length,
    duplicate-line fraction, top-word repetition ratio,
    symbol-to-word ratio, and the composed keep verdict — every kernel
    value-checked numerically, not just the booleans. Pure Column
    codegen; the filter pushes into the scan in a real pipeline.
    Also carries `pipeline/sampling.length_bucket` over n_chars
    (boundaries 200/400) so the bucketing op gets a hash-verified row
    without its own registry slot."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    # compute each kernel ONCE: deriving `keep` via
    # gopher_quality_flags() would re-run all five kernels (CollapseProject
    # inlines duplicated trees), measured 1.9s -> 1.0s at sf0.1. The
    # checkpoint holds one fixed-width row per doc (id + five doubles),
    # so the materialization stays O(n_docs), never O(corpus bytes).
    raw = docs.select(
        "doc_id",
        "n_chars",
        F.size(
            F.filter(
                F.split(F.lower("text"), r"[^a-z0-9']+"), lambda w: w != ""
            )
        ).cast("long").alias("n_words"),
        mean_word_length("text").alias("_mwl"),
        duplicate_line_fraction("text").alias("_dup"),
        top_word_ratio("text").alias("_top"),
        symbol_to_word_ratio("text").alias("_sym"),
    ).localCheckpoint()
    # thresholds compare the UNROUNDED values, matching the oracle;
    # every signal is a single int/int division, so Spark and DuckDB
    # produce bit-identical doubles
    keep = (
        (F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
        & (F.col("_mwl") >= 3.0) & (F.col("_mwl") <= 10.0)
        & (F.col("_dup") <= 0.3)
        & (F.col("_top") <= 0.2)
        & (F.col("_sym") <= 0.1)
    )
    return raw.select(
        "doc_id",
        "n_words",
        F.round("_mwl", 6).alias("mean_word_len"),
        F.round("_dup", 6).alias("dup_line_frac"),
        F.round("_top", 6).alias("top_word"),
        F.round("_sym", 6).alias("symbol_ratio"),
        keep.alias("keep"),
        length_bucket("n_chars", [200, 400]).alias("len_bucket"),
    ).orderBy("doc_id")


@query(
    "stratified_sample",
    oracle=f"""
    SELECT 'strat' AS kind, doc_id, source FROM documents
    WHERE {_u_sql(7)} <
      (CASE source WHEN 'src0' THEN 0.5
                   WHEN 'src1' THEN 0.25
                   WHEN 'src2' THEN 0.125
                   ELSE 0.0 END)
    UNION ALL
    SELECT 'cap' AS kind, doc_id, source FROM (
      SELECT doc_id, source, row_number() OVER (
        PARTITION BY source
        ORDER BY md5(doc_id::VARCHAR || ':7'), doc_id ASC) AS rn
      FROM documents
    ) WHERE rn <= 3
    UNION ALL
    SELECT 'wes' AS kind, doc_id, source FROM (
      SELECT doc_id, source, row_number() OVER (
        PARTITION BY source
        ORDER BY round(ln({_u_sql(5)}) / greatest(n_chars, 1), 9) DESC,
                 doc_id ASC) AS rn
      FROM documents
    ) WHERE rn <= 3
    UNION ALL
    SELECT 'shuffle' ||
           CAST((('0x' || substr(md5('11:' || doc_id::VARCHAR), 1, 15))
                 ::BIGINT % 4) AS VARCHAR) AS kind,
           doc_id, source
    FROM (
      SELECT doc_id, source FROM documents
      ORDER BY md5('11:' || doc_id::VARCHAR), doc_id ASC
      LIMIT 20
    )
    UNION ALL
    SELECT 'mixture' AS kind, doc_id, source FROM documents
    JOIN (
      WITH w(d, wt) AS (VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)),
      nw AS (SELECT d, wt / (SELECT sum(wt) FROM w) AS nwt FROM w),
      avail AS (
        SELECT source AS d, CAST(count(*) AS DOUBLE) AS a
        FROM documents GROUP BY source
      ),
      tt AS (SELECT min(a / nwt) AS t FROM avail JOIN nw USING (d))
      SELECT nw.d, nw.nwt * tt.t / avail.a AS f
      FROM nw JOIN avail USING (d) CROSS JOIN tt
    ) fr ON fr.d = source
    WHERE {_u_sql(3)} < fr.f
    ORDER BY kind, doc_id
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic selection ops in one driver row:

    'strat' — per-stratum Bernoulli sample
    (`pipeline/sampling.stratified_sample`): a row is kept iff the
    first 8 hex digits of md5(id:salt) fall under fraction·16⁸ — a pure
    function of the row, so reruns/retries/different partitionings all
    select the same rows (the resumability property a 100 TB pipeline
    needs, and exactly why the oracle can replay the selection
    bit-for-bit). Map-only: no shuffle, filter composes with the scan.
    Strata absent from the fraction map drop (sampleBy semantics).

    'cap' — deterministic per-key cap (`pipeline/sampling.take_per_key`,
    k=3 per source): rows ordered within each key by md5(id:salt), the
    stable pseudo-random balance cap. One shuffle on the key — the same
    shuffle a balanced shard write needs anyway.

    'wes' — Efraimidis-Spirakis deterministic weighted sampling
    (`pipeline/sampling.weighted_sample_per_key`, k=3 per source,
    weight = n_chars): reservoir keys ranked by the rounded monotone
    transform ln(u)/w, replayed bit-for-bit by the oracle.

    'mixture' — domain-mixture sampling (`pipeline/sampling.
    mixture_sample`, folded in from its own former row to free a
    registry slot for `asof_join`): solve the largest feasible total T
    with per-domain shares 0.5 / 0.3 / 0.2 over src0/src1/src2 (closed
    form from a |domains|-row aggregate, nothing else touches the
    corpus), then apply the deterministic md5 Bernoulli per domain.
    The oracle replays the whole thing — availability aggregate,
    feasibility min, fraction arithmetic in the same operation order,
    and the exact row selection.

    'shuffleN' — epoch shuffle + sharding (`pipeline/sampling.
    shuffle_rows`, seed=11, num_shards=4; folded in r10 so the op sits
    under the driver gate like its siblings — VERDICT r9 item 3): the
    first 20 rows of the seeded md5 permutation, each tagged with its
    derived shard in the kind ('shuffle0'..'shuffle3'). The oracle
    replays the draw (`md5('11:' || id)`), the (draw, id) total order,
    the top-20 prefix, and the hex-prefix shard arithmetic — pinning
    both the permutation and seed-stable shard membership."""
    docs = load_table(spark, sf_dir, "documents")
    strat = stratified_sample(
        docs, "source", {"src0": 0.5, "src1": 0.25, "src2": 0.125},
        id_col="doc_id", salt=7,
    ).select(F.lit("strat").alias("kind"), "doc_id", "source")
    cap = take_per_key(
        docs, "source", 3, id_col="doc_id", salt=7
    ).select(F.lit("cap").alias("kind"), "doc_id", "source")
    wes = weighted_sample_per_key(
        docs, "source", 3, "n_chars", id_col="doc_id", salt=5
    ).select(F.lit("wes").alias("kind"), "doc_id", "source")
    mix = mixture_sample(
        docs, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        id_col="doc_id", salt=3,
    ).select(F.lit("mixture").alias("kind"), "doc_id", "source")
    shuf = (
        shuffle_rows(docs, "doc_id", seed=11, num_shards=4)
        .limit(20)
        .select(
            F.concat(F.lit("shuffle"), F.col("shard").cast("string")).alias(
                "kind"
            ),
            "doc_id",
            "source",
        )
    )
    return (
        strat.unionByName(cap).unionByName(wes).unionByName(mix)
        .unionByName(shuf)
        .orderBy("kind", "doc_id")
    )


@query(
    "lm_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w <> '') AS ws
      FROM documents
    ),
    vocab AS (
      SELECT w AS word, count(*) AS c_uni
      FROM (SELECT unnest(ws) AS w FROM toks WHERE source = 'src0')
      GROUP BY w
      ORDER BY c_uni DESC, word ASC LIMIT 20
    ),
    pr_t AS (
      SELECT ws[i] AS w1r, ws[i + 1] AS w2r
      FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM toks WHERE source = 'src0' AND len(ws) >= 2)
    ),
    pm_t AS (
      SELECT CASE WHEN v1.word IS NULL THEN '<unk>' ELSE p.w1r END AS w1,
             CASE WHEN v2.word IS NULL THEN '<unk>' ELSE p.w2r END AS w2
      FROM pr_t p
      LEFT JOIN vocab v1 ON v1.word = p.w1r
      LEFT JOIN vocab v2 ON v2.word = p.w2r
    ),
    counted AS (SELECT w1, w2, count(*) AS c_bi FROM pm_t GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c_bi) AS c_ctx FROM counted GROUP BY w1),
    bg AS (SELECT w1, w2, c_bi FROM counted
           ORDER BY c_bi DESC, w1 ASC, w2 ASC LIMIT 200),
    vs AS (SELECT (count(*) + 1)::DOUBLE AS v FROM vocab),
    pr_s AS (
      SELECT doc_id, ws[i] AS w1r, ws[i + 1] AS w2r
      FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM toks WHERE len(ws) >= 2)
    ),
    pm_s AS (
      SELECT doc_id,
             CASE WHEN v1.word IS NULL THEN '<unk>' ELSE p.w1r END AS w1,
             CASE WHEN v2.word IS NULL THEN '<unk>' ELSE p.w2r END AS w2
      FROM pr_s p
      LEFT JOIN vocab v1 ON v1.word = p.w1r
      LEFT JOIN vocab v2 ON v2.word = p.w2r
    ),
    sc AS (
      SELECT p.doc_id,
             -ln((coalesce(b.c_bi, 0)::DOUBLE + 0.1)
                 / (coalesce(c.c_ctx, 0)::DOUBLE + 0.1 * vs.v)) AS nll
      FROM pm_s p
      LEFT JOIN bg b ON b.w1 = p.w1 AND b.w2 = p.w2
      LEFT JOIN ctx c ON c.w1 = p.w1
      CROSS JOIN vs
    ),
    agg AS (SELECT doc_id, count(*) AS n, avg(nll) AS nll
            FROM sc GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(a.n AS BIGINT) AS lm_bigrams,
           round(a.nll, 6) AS lm_nll,
           round(exp(a.nll), 6) AS lm_ppl,
           CASE WHEN a.nll IS NULL THEN NULL
                WHEN exp(a.nll) <= 20.0 THEN 'head'
                WHEN exp(a.nll) > 35.0 THEN 'tail'
                ELSE 'middle' END AS lm_bucket
    FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM perplexity scoring (`pipeline/lm.py`): train a
    pruned Lidstone bigram LM on the trusted slice (source='src0',
    max_vocab=20 so the `<unk>` collapse actually fires on this
    corpus, max_bigrams=200 of 376 observed so the smoothed-floor
    backoff is exercised too), score EVERY document map-only against
    the broadcast model, and split head/middle/tail at fixed
    perplexity thresholds (20/35 — explicit-threshold `ccnet_buckets`,
    the deterministic form).

    The oracle replays the entire thing — training counts, both prune
    orderings (count desc then lexicographic), the `<unk>` mapping,
    smoothing arithmetic in the same operation order, and the bucket
    split — so the hash pins training AND scoring, not just the score
    shape. Docs with <2 tokens surface with NULL scores (the oracle's
    left join; Spark-side they survive the score aggregate via
    explode_outer), matching `lm_perplexity`'s contract."""
    docs = load_table(spark, sf_dir, "documents")
    model = lm_train(
        docs.where(F.col("source") == "src0"),
        text_col="text", max_vocab=20, max_bigrams=200, alpha=0.1,
    )
    # lm_scores (not lm_perplexity): explode_outer keeps short docs in
    # the per-doc aggregate, so the score frame already has one row per
    # document — the corpus-keyed join back onto `documents` and its
    # second scan of the table are gone (r13; guide §2.4). The NULL
    # rows for <2-token docs come out of the aggregate itself.
    scored = lm_scores(docs, model, text_col="text", id_col="doc_id")
    bucketed = ccnet_buckets(scored, thresholds=(20.0, 35.0))
    return bucketed.select(
        "doc_id",
        "lm_bigrams",
        F.round("lm_nll", 6).alias("lm_nll"),
        F.round("lm_ppl", 6).alias("lm_ppl"),
        "lm_bucket",
    ).orderBy("doc_id")


@query(
    "tokenize_chunk",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
      FROM documents
    ),
    words AS (
      SELECT 'word' AS kind, count(*) AS k1,
             CAST(NULL AS BIGINT) AS k2, CAST(NULL AS BIGINT) AS k3,
             word AS s
      FROM (SELECT unnest(list_filter(
              string_split_regex(lower(text), '\s+'), t -> t <> ''))
              AS word FROM documents)
      GROUP BY word
      ORDER BY k1 DESC, word ASC
      LIMIT 50
    ),
    starts AS (
      SELECT doc_id, tk, unnest(range(0, len(tk), 24)) AS st FROM toks
    ),
    chunks AS (
      SELECT 'chunk' AS kind, doc_id AS k1,
             CAST(st // 24 AS BIGINT) AS k2,
             CAST(least(32, len(tk) - st) AS BIGINT) AS k3,
             md5(array_to_string(list_slice(tk, st + 1, st + 32), ' ')) AS s
      FROM starts
    )
    SELECT * FROM words
    UNION ALL
    SELECT * FROM chunks
    ORDER BY kind, k1, k2, s
    """,
)
def q_tokenize_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer base + token-budget chunking in one driver row
    (VERDICT r5 item 3): the corpus word-frequency table
    (`pipeline/tokenizer.word_counts` — the ONE corpus-wide shuffle BPE
    training is built on, top-50 types by count desc / word asc) tagged
    'word', and the fixed-window chunker
    (`pipeline/chunking.chunk_documents`, max_tokens=32 overlap=8 →
    step 24; one map-side posexplode, no shuffle) tagged 'chunk' with
    each window's md5 so the hash pins the exact window *content*, not
    just the arithmetic. The oracle replays the windows with
    `range(0, len, step)` + `list_slice` — the same starts-strictly-
    inside contract."""
    from grafeo_memory_spark.pipeline.chunking import chunk_documents
    from grafeo_memory_spark.pipeline.tokenizer import word_counts

    docs = spread(load_table(spark, sf_dir, "documents"))
    wc = word_counts(docs, "text", lowercase=True, max_types=50)
    words = wc.select(
        F.lit("word").alias("kind"),
        F.col("count").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("k3"),
        F.col("word").alias("s"),
    )
    ch = chunk_documents(
        docs.select("doc_id", "text"),
        "text",
        "doc_id",
        max_tokens=32,
        overlap=8,
    )
    chunks = ch.select(
        F.lit("chunk").alias("kind"),
        F.col("doc_id").alias("k1"),
        F.col("chunk_idx").cast("long").alias("k2"),
        F.col("chunk_tokens").cast("long").alias("k3"),
        F.md5("chunk_text").alias("s"),
    )
    return words.unionByName(chunks).orderBy("kind", "k1", "k2", "s")


#: synthesized-URL cases: the driver tables carry no URL column, so
#: both engines construct the SAME deterministic URL per doc_id (mod-6
#: case mix covering every normalize_url rule), and the oracle derives
#: the expected canonical form CONSTRUCTIVELY from the case fields —
#: an independent spec replay, not a port of the regexp cascade.
_URL_CASE_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN 'https://WWW.' || source || '.Example.COM:443/Docs/'
                    || doc_id || '/'
        WHEN 1 THEN 'HTTP://' || source
                    || '.blog.example.CO.UK:80/a/b?utm_source=x&q='
                    || doc_id || '&fbclid=z'
        WHEN 2 THEN 'https://user:pw@' || source || '.news.org:8443/p?ref=h&id='
                    || doc_id
        WHEN 3 THEN 'http://localhost:80/x/'
        WHEN 4 THEN 'ftp://files.' || source || '.net/data/' || doc_id
                    || '#frag'
        ELSE 'not a url ' || doc_id
      END
"""

_URL_NORM_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN 'https://' || source || '.example.com/Docs/' || doc_id
        WHEN 1 THEN 'http://' || source || '.blog.example.co.uk/a/b?q='
                    || doc_id
        WHEN 2 THEN 'https://' || source || '.news.org:8443/p?id=' || doc_id
        WHEN 3 THEN 'http://localhost/x'
        WHEN 4 THEN 'ftp://files.' || source || '.net/data/' || doc_id
        ELSE CAST(NULL AS VARCHAR)
      END
"""

_URL_DOMAIN_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN 'example.com'
        WHEN 1 THEN 'example.co.uk'
        WHEN 2 THEN 'news.org'
        WHEN 3 THEN 'localhost'
        WHEN 4 THEN source || '.net'
        ELSE CAST(NULL AS VARCHAR)
      END
"""


@query(
    "url_curation",
    oracle=f"""
    WITH u AS (
      SELECT doc_id,
             {_URL_NORM_SQL} AS norm,
             {_URL_DOMAIN_SQL} AS domain
      FROM documents
    ),
    urls AS (
      SELECT 'url' AS kind, doc_id AS id, domain, norm, md5(norm) AS key,
             CAST(NULL AS BIGINT) AS n_pages, CAST(NULL AS BIGINT) AS n_urls
      FROM u
    ),
    doms AS (
      SELECT 'dom' AS kind, CAST(NULL AS BIGINT) AS id, domain,
             CAST(NULL AS VARCHAR) AS norm, CAST(NULL AS VARCHAR) AS key,
             count(*) AS n_pages, count(DISTINCT md5(norm)) AS n_urls
      FROM u WHERE domain IS NOT NULL
      GROUP BY domain
    )
    SELECT * FROM urls
    UNION ALL
    SELECT * FROM doms
    ORDER BY kind, id, domain
    """,
)
def q_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain curation (`pipeline/urls.py`; VERDICT r5 item 3):
    canonicalization (scheme/host lowercase, www. strip, default-port
    drop, fragment drop, tracking-param strip incl. an emptied-? and
    leading/trailing &, trailing-slash drop, userinfo strip),
    registered-domain extraction (last-2 labels, co.uk-family last-3,
    single-label passthrough), the md5 dedup key, and the
    `domain_stats` rollup (n_pages + DISTINCT canonical URLs — the
    localhost case collapses to one URL, so countDistinct is load-
    bearing). URLs are synthesized deterministically per doc_id (mod-6
    case mix exercising every rule); the oracle states the *expected*
    canonical form per case constructively, so Spark's regexp cascade
    is verified against an independent statement of the contract, not
    a twin implementation. Everything outside the stats rollup is pure
    Column codegen — map-only at 100 TB."""
    from grafeo_memory_spark.pipeline.urls import (
        domain_stats,
        registered_domain,
        normalize_url,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    sid = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 6
    raw = (
        F.when(
            m == 0,
            F.concat(
                F.lit("https://WWW."), F.col("source"),
                F.lit(".Example.COM:443/Docs/"), sid, F.lit("/"),
            ),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("HTTP://"), F.col("source"),
                F.lit(".blog.example.CO.UK:80/a/b?utm_source=x&q="), sid,
                F.lit("&fbclid=z"),
            ),
        )
        .when(
            m == 2,
            F.concat(
                F.lit("https://user:pw@"), F.col("source"),
                F.lit(".news.org:8443/p?ref=h&id="), sid,
            ),
        )
        .when(m == 3, F.lit("http://localhost:80/x/"))
        .when(
            m == 4,
            F.concat(
                F.lit("ftp://files."), F.col("source"),
                F.lit(".net/data/"), sid, F.lit("#frag"),
            ),
        )
        .otherwise(F.concat(F.lit("not a url "), sid))
    )
    with_url = docs.select("doc_id", raw.alias("url"))
    # evaluate the canonicalization cascade ONCE; both output branches
    # (per-URL rows + the domain rollup) read the materialized columns
    # instead of re-running the regexp chain per consumer (r9). The
    # md5 dedup key is derived from the stored canonical form — same
    # expression url_dedup_key inlines.
    base = with_url.select(
        "doc_id",
        registered_domain(F.col("url")).alias("domain"),
        normalize_url(F.col("url")).alias("norm"),
    ).localCheckpoint(eager=False)
    urls = base.select(
        F.lit("url").alias("kind"),
        F.col("doc_id").alias("id"),
        "domain",
        "norm",
        F.md5("norm").alias("key"),
        F.lit(None).cast("long").alias("n_pages"),
        F.lit(None).cast("long").alias("n_urls"),
    )
    doms = domain_stats(
        base.withColumn("key", F.md5("norm")),
        "url",
        domain_col="domain",
        key_col="key",
    ).select(
        F.lit("dom").alias("kind"),
        F.lit(None).cast("long").alias("id"),
        "domain",
        F.lit(None).cast("string").alias("norm"),
        F.lit(None).cast("string").alias("key"),
        "n_pages",
        "n_urls",
    )
    return urls.unionByName(doms).orderBy("kind", "id", "domain")


@query(
    "quality_pareto",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, round({_QUALITY_SQL}, 6) AS q FROM documents
    ),
    draws AS (
      SELECT doc_id, q,
             pow(greatest(
               ('0x' || substr(md5(doc_id::VARCHAR || ':3'), 1, 8))
                 ::BIGINT::DOUBLE / 4294967296.0,
               1e-12), -1.0 / 9.0) - 1.0 AS draw
      FROM scored
    )
    SELECT doc_id, q FROM draws
    WHERE (1.0 - q) < draw
    ORDER BY doc_id
    """,
)
def q_quality_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GPT-3 Pareto acceptance rule
    (`pipeline/quality_classifier.pareto_filter`; VERDICT r5 item 3):
    keep a document iff ``(1 - score) < u^(-1/alpha) - 1`` where u is
    the repo's deterministic md5(id:salt) uniform — the rule that
    biases the filtered corpus toward high scores while keeping tail
    diversity. The score here is the oracle-shared text-quality
    composite (the trained pyspark.ml classifier itself is pinned by
    `tests/test_quality_classifier.py`; its acceptance arithmetic is
    identical to this row). Map-only: scoring and the draw are pure
    Column expressions over the scan."""
    from grafeo_memory_spark.pipeline.quality_classifier import pareto_filter
    from grafeo_memory_spark.pipeline.text_stats import quality_score

    docs = spread(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("q")
    )
    return (
        pareto_filter(scored, score_col="q", id_col="doc_id", alpha=9.0, salt=3)
        .select("doc_id", "q")
        .orderBy("doc_id")
    )
