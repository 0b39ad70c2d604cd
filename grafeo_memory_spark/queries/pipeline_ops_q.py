"""Driver queries for the training-data pipeline operators (dedup,
similarity, text analysis) over the `documents`/`embeddings` tables —
every sketch is hash-portable (md5-based), so the DuckDB oracles verify
signatures and pair sets bit-for-bit, not just row counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.ann import (
    hard_negatives,
    ann_lsh_join,
    hyperplane_signature,
    planes_sql_literal,
    random_hyperplanes,
)
from grafeo_memory_spark.pipeline.dedup import (
    semdedup,
    exact_dedup,
    exact_dedup_ids,
    jaccard_similarity_join,
    minhash_signature,
    simhash16,
    simhash64,
    simhash_near_dup,
)
from grafeo_memory_spark.pipeline.text_stats import (
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count_bpe_ish,
    token_count_ws,
    BPE_TOKEN_RE,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.sources.tables import load_table, spread

# ---------------------------------------------------------------- SQL
# fragments mirroring pipeline/dedup.py + text_stats.py exactly

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_TOKS = f"string_split({_NORM}, ' ')"


def _shingles_sql(n: int) -> str:
    return (
        f"list_distinct(list_filter(list_transform("
        f"range(0, greatest(len({_TOKS}) - {n}, 0) + 1), "
        f"i -> array_to_string({_TOKS}[i+1:i+{n}], ' ')), g -> g <> ''))"
    )


def _hash_sql(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5({expr} || '#{seed}'), 1, 15))::BIGINT"


def _minhash_sql(n: int, seed: int) -> str:
    return (
        f"list_aggregate(list_transform({_shingles_sql(n)}, "
        f"s -> {_hash_sql('s', seed)}), 'min')"
    )


def _simhash16_sql(seed: int = 0) -> str:
    words = _shingles_sql(1)
    bits = []
    for b in range(16):
        vote = (
            f"list_sum(list_transform({words}, "
            f"w -> CASE WHEN ({_hash_sql('w', seed)} & {1 << b}) > 0 "
            f"THEN 1 ELSE -1 END))"
        )
        bits.append(f"(CASE WHEN {vote} > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(bits)


def _hash2_sql(expr: str) -> str:
    """Hex chars 16-30 of the seed-0 md5 — the second 60-bit draw the
    64-bit SimHash reads its top nibble of vote bits from."""
    return f"('0x' || substr(md5({expr} || '#0'), 16, 15))::BIGINT"


def _simhash64_sql() -> str:
    """64 vote bits from ONE md5 per gram: bits 0..59 from hex chars
    1-15 (so bits 0..15 coincide with the 16-bit sketch), bits 60..63
    from hex chars 16-30; bit 63's weight is the signed two's-
    complement minimum (a plain 1<<63 overflows BIGINT in both
    engines) — mirrors pipeline.dedup.simhash64 exactly."""
    words = _shingles_sql(1)
    terms = []
    for b in range(64):
        src = _hash_sql("w", 0) if b < 60 else _hash2_sql("w")
        bit = 1 << (b if b < 60 else b - 60)
        vote = (
            f"list_sum(list_transform({words}, "
            f"w -> CASE WHEN ({src} & {bit}) > 0 THEN 1 ELSE -1 END))"
        )
        weight = str(1 << b) if b < 63 else "(-9223372036854775807 - 1)"
        terms.append(
            f"(CASE WHEN {vote} > 0 THEN {weight}::BIGINT ELSE 0 END)"
        )
    return " + ".join(terms)


_WORDS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"


def _stop_ratio_sql(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return (
        f"(CASE WHEN len({_WORDS}) = 0 THEN 0.0 ELSE "
        f"len(list_filter({_WORDS}, w -> list_contains({lst}, w)))::DOUBLE"
        f" / len({_WORDS}) END)"
    )


def _lang_id_sql() -> str:
    langs = sorted(STOPWORDS)
    best = "greatest(" + ", ".join(_stop_ratio_sql(l) for l in langs) + ")"
    out = "'und'"
    for lang in sorted(langs, reverse=True):
        r = _stop_ratio_sql(lang)
        out = f"(CASE WHEN {r} > 0 AND {r} = {best} THEN '{lang}' ELSE {out} END)"
    return out


_QUALITY_SQL = (
    "0.35 * least(1.0, length(text)::DOUBLE / 500)"
    f" + 0.30 * least(1.0, 3.0 * {_stop_ratio_sql('en')})"
    " + 0.20 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE"
    r" (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE"
    " / length(text) END))"
    " + 0.15 * (CASE WHEN"
    f" (CASE WHEN len({_WORDS}) = 0 THEN 0.0 ELSE"
    f" list_sum(list_transform({_WORDS}, w -> length(w)))::DOUBLE / len({_WORDS}) END)"
    " BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END)"
)

PLANES = random_hyperplanes(8, 64, seed=7)
_PLANES_SQL = planes_sql_literal(PLANES)


def _bucket_sql(vec_expr: str) -> str:
    bits = [
        f"(CASE WHEN list_dot_product({vec_expr}, {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES_SQL)
    ]
    return "(" + " + ".join(bits) + ")"


_DUCK_COS_AB = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


# ------------------------------------------------------------ queries


# exact_dedup's driver rows moved into `doc_fingerprints` (the `kept`
# column) and minhash_signatures' into `simhash_fingerprints` (m0..m3)
# in r6 to free registry slots for the corpus ops; the standalone
# operators keep their own oracle-replay tests.


@query(
    "simhash_fingerprints",
    oracle=f"""
    SELECT doc_id, CAST({_simhash16_sql()} AS BIGINT) AS simhash,
           {_simhash64_sql()} AS simhash64,
           {_minhash_sql(3, 0)} AS m0,
           {_minhash_sql(3, 1)} AS m1,
           {_minhash_sql(3, 2)} AS m2,
           {_minhash_sql(3, 3)} AS m3
    FROM documents
    ORDER BY doc_id
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash sketches per document, one row each (the former standalone
    `minhash_signatures` slot is folded in as m0..m3 — r6 registry
    consolidation). SimHash (unigram votes on portable hash bits; both
    the 16-bit continuity sketch and the production 64-bit one, whose
    vote bits all come from the single seed-0 md5 per gram: hex chars
    1-15 → bits 0..59, so bits 0..15 coincide with simhash16; chars
    16-30 → bits 60..63) next to the first 4 of 16 MinHash permutations
    (min over word-trigram shingle hashes per salted hash function).
    Every sketch hash-verified bit-for-bit; the LSH banding above the
    MinHash columns is pure arithmetic on these values."""
    from grafeo_memory_spark.pipeline.dedup import (
        minhash_sig_col,
        normalize_text,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    # ONE map-only scan for every sketch (r12): the MinHash lanes are a
    # per-row min-fold (`minhash_sig_col`) since the r12 explode/groupBy
    # removal, so they compose with the 64-bit SimHash in a single
    # select — the former (sketches ⋈ sig on doc_id) shuffle join is
    # gone and the query is scan → project → sort. The non-blank filter
    # reproduces the old inner join's drop of shingle-less docs.
    #
    # simhash16 ≡ the low 16 bits of simhash64 by construction (both
    # read vote bits 0..15 of the same seed-0 md5), so the row computes
    # the 64-bit sketch ONCE, materializes the tiny fixed-width row, and
    # masks — one md5+vote pass instead of two (r7). The checkpoint is
    # load-bearing: without it ProjectCollapse inlines the sketch
    # expression into BOTH output columns and the pass runs twice
    # (measured slower than the two-function version it replaced).
    # simhash16() remains for callers that only want the cheap sketch;
    # lane equality is pinned in tests.
    return (
        docs.where(normalize_text("text") != "")
        .select(
            "doc_id",
            simhash64("text").alias("simhash64"),
            minhash_sig_col("text", num_perm=4, n=3).alias("_sig"),
        )
        .localCheckpoint(eager=False)
        .select(
            "doc_id",
            F.col("simhash64").bitwiseAND(F.lit(0xFFFF)).alias("simhash"),
            "simhash64",
            *[F.col("_sig")[k].alias(f"m{k}") for k in range(4)],
        )
        .orderBy("doc_id")
    )


@query(
    "jaccard_topk_pairs",
    oracle=f"""
    WITH sh0 AS (
      SELECT doc_id AS id, unnest({_shingles_sql(3)}) AS shingle
      FROM documents
    ), keep AS (
      SELECT shingle FROM sh0 GROUP BY shingle
      HAVING count(DISTINCT id) <= 64
    ), sh AS (
      SELECT sh0.* FROM sh0 JOIN keep USING (shingle)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id HAVING count(*) >= 2
    )
    SELECT id_a, id_b,
           round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    ORDER BY jaccard DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def q_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity join (shingle inverted index) — top-20
    most similar document pairs, WITH the df_cap skew guard engaged
    (cap 64): shingles appearing in more docs are boilerplate that
    generates quadratic join fan-out and near-zero signal, so the
    graded path is the same one that survives at scale. The oracle
    applies the identical cap."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    pairs = jaccard_similarity_join(
        docs, "text", "doc_id", n=3, min_intersection=2, df_cap=64
    )
    return (
        pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(20)
    )


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {_bucket_sql('embedding::DOUBLE[]')} AS bucket
      FROM embeddings
    ),
    fp AS MATERIALIZED (
      SELECT doc_id AS id, {_simhash64_sql()} AS fp FROM documents
    ),
    bands AS (
      SELECT id, fp, band, (fp >> (16 * band)) & 65535 AS val
      FROM fp, (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    bkeep AS (
      SELECT band, val FROM bands GROUP BY band, val
      HAVING count(*) <= 1000
    ),
    bb AS (SELECT bands.* FROM bands JOIN bkeep USING (band, val)),
    sh_pairs AS (
      SELECT DISTINCT x.id AS id_a, y.id AS id_b,
             bit_count(xor(x.fp, y.fp)) AS hamming
      FROM bb x JOIN bb y ON x.band = y.band AND x.val = y.val
                         AND x.id < y.id
      WHERE bit_count(xor(x.fp, y.fp)) <= 3
    )
    SELECT 'emb' AS kind, a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DUCK_COS_AB}, 6) AS score
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_DUCK_COS_AB} >= 0.2
    UNION ALL
    SELECT 'simhash' AS kind, id_a, id_b, CAST(hamming AS DOUBLE) AS score
    FROM sh_pairs
    ORDER BY kind, id_a, id_b
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs, two modalities in one slot (r7 folding —
    VERDICT r6 item 2): 'emb' rows are embedding-cosine near-dups via
    hyperplane-LSH blocking (same 8-bit bucket → exact cosine verify
    ≥ 0.2); 'simhash' rows are the banded SimHash Hamming join
    (`pipeline/dedup.simhash_near_dup`: 4 pigeonhole bands over the
    64-bit fingerprint, band equi-join + bucket-size guard,
    bit_count(xor) ≤ 3 verify), score = the Hamming distance. The
    deterministic planes/hashes mean both oracles reproduce the *same*
    approximation — blocking is verified, not just sampled."""
    from grafeo_memory_spark.functions.vector import dot, l2_norm

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    # row norm computed once per row and carried through the bucket
    # join (r9, same fold-budget move as semdedup): the pair predicate
    # below reproduces cosine_similarity's exact expression from the
    # carried norms — bit-identical, one fold per pair instead of three
    sig = emb.select(
        "vec_id",
        "embedding",
        hyperplane_signature("embedding", PLANES).alias("bucket"),
        l2_norm("embedding").alias("v_norm"),
    )
    # Materialize the signature table once (r13, the same move as
    # semdedup's assignment checkpoint): `sig` feeds BOTH bucket
    # self-join sides, so without this the embeddings parquet is
    # scanned twice and the 8-plane signature + norm folds are
    # evaluated twice per run (r12 plan: two parquet scans each under
    # their own spread Exchange). Eager, like semdedup's `scored`, so
    # the two consumer stages read cached blocks instead of racing to
    # compute the same partitions. SPARK_GRAFT_NEARDUP_NO_CKPT=1
    # restores the two-scan shape for A/B or forensics.
    if os.environ.get("SPARK_GRAFT_NEARDUP_NO_CKPT") != "1":
        sig = sig.localCheckpoint(eager=True)
    a = sig.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("e_a"),
        F.col("v_norm").alias("n_a"),
        "bucket",
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("e_b"),
        F.col("v_norm").alias("n_b"),
        "bucket",
    )
    pair_cos = F.coalesce(
        dot(F.col("e_a"), F.col("e_b"))
        / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0)),
        F.lit(0.0),
    )
    pairs = (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", pair_cos)
        .where(F.col("cos_raw") >= 0.2)
    )
    emb_rows = pairs.select(
        F.lit("emb").alias("kind"),
        "id_a",
        "id_b",
        F.round("cos_raw", 6).alias("score"),
    )
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh_rows = simhash_near_dup(
        docs, "text", "doc_id", max_hamming=3, max_bucket_size=1000
    ).select(
        F.lit("simhash").alias("kind"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return emb_rows.unionByName(sh_rows).orderBy("kind", "id_a", "id_b")


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {_bucket_sql('embedding::DOUBLE[]')} AS bucket
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS probe_id, embedding AS qe, bucket
      FROM sig WHERE vec_id IN (0, 1, 2)
    ), scored AS (
      SELECT p.probe_id, t.vec_id AS id,
             list_dot_product(t.embedding::DOUBLE[], p.qe::DOUBLE[])
               / (sqrt(list_dot_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(p.qe::DOUBLE[], p.qe::DOUBLE[]))) AS sim
      FROM sig t JOIN probes p ON t.bucket = p.bucket
      WHERE t.vec_id <> p.probe_id
    )
    , ranked AS (
      SELECT 'lsh' AS kind, probe_id, id, round(sim, 6) AS sim,
             CAST(rank AS INTEGER) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY sim DESC, id ASC) AS rank
        FROM scored
      ) WHERE rank <= 5
    ), hn_scored AS (
      SELECT p.vec_id AS probe_id, t.vec_id AS id,
             list_dot_product(t.embedding::DOUBLE[], p.embedding::DOUBLE[])
               / (sqrt(list_dot_product(t.embedding::DOUBLE[], t.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(p.embedding::DOUBLE[], p.embedding::DOUBLE[])))
               AS sim
      FROM embeddings t
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id IN (0, 1, 2)) p
      WHERE t.label <> p.label
    ), hn AS (
      SELECT 'hardneg' AS kind, probe_id, id, round(sim, 6) AS sim,
             CAST(rank AS INTEGER) AS rank
      FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY sim DESC, id ASC) AS rank
        FROM hn_scored
      ) WHERE rank <= 5
    )
    SELECT * FROM ranked
    UNION ALL
    SELECT * FROM hn
    ORDER BY kind, probe_id, rank
    """,
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two batch-retrieval ops over the same 3 probe vectors, tagged:

    'lsh' rows — LSH-bucketed ANN top-5: the scale path for batch
    similarity search; the bucket equi-join replaces the brute-force
    cross join (multi_probe covers the exact baseline).

    'hardneg' rows — hard-negative mining
    (`pipeline/ann.hard_negatives`): the 5 most-similar vectors with a
    DIFFERENT label per anchor, the near-miss impostors a contrastive
    objective trains against. Exact baseline form here (anchors
    broadcast, one scan, codegen cosine, per-anchor top-k); the
    docstring documents the LSH/IVF-bucketed variant as the
    production-scale candidate generator."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qv")
    )
    out = ann_lsh_join(
        emb.withColumnRenamed("vec_id", "tid").withColumnRenamed(
            "embedding", "emb"
        ).select(F.col("tid").alias("vec_id"), F.col("emb").alias("embedding")),
        probes,
        PLANES,
        k=5,
    )
    out = out.where(F.col("id") != F.col("probe_id"))
    # re-rank after dropping self-matches so ranks stay dense 1..5
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    lsh = (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            F.lit("lsh").alias("kind"),
            "probe_id", "id", F.round("sim", 6).alias("sim"), "rank",
        )
    )
    hn = hard_negatives(
        emb, emb.where(F.col("vec_id").isin([0, 1, 2])), k=5
    ).select(
        F.lit("hardneg").alias("kind"),
        "probe_id", "id", F.round("sim", 6).alias("sim"), "rank",
    )
    return lsh.unionByName(hn).orderBy("kind", "probe_id", "rank")


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           {_lang_id_sql()} AS lang_guess,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                t -> t <> '')) AS INTEGER) AS tok_ws,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))
                AS INTEGER) AS tok_bpe,
           round({_QUALITY_SQL}, 6) AS quality
    FROM documents ORDER BY doc_id
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis per document: stopword-heuristic language ID,
    whitespace + BPE-ish token counts, and the quality composite
    (length / stopword density / punctuation / word-length sanity)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        lang_id("text").alias("lang_guess"),
        token_count_ws("text").alias("tok_ws"),
        token_count_bpe_ish("text").alias("tok_bpe"),
        F.round(quality_score("text"), 6).alias("quality"),
    ).orderBy("doc_id")


# Bloom tier sizing shared by the Spark query and its oracle: a FIXED
# nominal capacity (not a count of the build set) keeps the derived
# (m_bits, k) — and therefore the oracle SQL — scale-factor-independent.
_BLOOM_N, _BLOOM_FPP = 1024, 0.01
_BLOOM_M, _BLOOM_K = __import__(
    "grafeo_memory_spark.pipeline.bloom", fromlist=["bloom_parameters"]
).bloom_parameters(_BLOOM_N, _BLOOM_FPP)


@query(
    "doc_fingerprints",
    oracle=f"""
    WITH h AS (SELECT doc_id, md5({_NORM}) AS hh FROM documents),
    keep AS (SELECT hh, min(doc_id) AS k FROM h GROUP BY hh),
    bseeds AS (SELECT unnest(range(0, {_BLOOM_K})) AS s),
    setbits AS MATERIALIZED (
      SELECT DISTINCT
        ('0x' || substr(md5(text || '#' || s), 1, 15))::BIGINT
          % {_BLOOM_M} AS pos
      FROM documents, bseeds WHERE doc_id % 2 = 0
    ),
    maybe AS (
      SELECT p.doc_id, bool_and(sb.pos IS NOT NULL) AS maybe
      FROM (
        SELECT doc_id,
          ('0x' || substr(md5(text || '#' || s), 1, 15))::BIGINT
            % {_BLOOM_M} AS pos
        FROM documents, bseeds
      ) p LEFT JOIN setbits sb USING (pos)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           md5(array_to_string(list_transform(
             list_sort(list_transform({_shingles_sql(3)},
                                      s -> {_hash_sql('s', 0)}))[1:8],
             v -> v::VARCHAR), ',')) AS fp,
           (d.doc_id IN (SELECT k FROM keep)) AS kept,
           NOT m.maybe AS bloom_unseen
    FROM documents d JOIN maybe m USING (doc_id) ORDER BY d.doc_id
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-8 sketch fingerprint per document (k smallest trigram
    hashes, md5-folded) — a compact blocking key for near-dup
    clustering — plus ``kept``: whether the document survives exact
    dedup (md5 of normalized text, smallest id per content group; the
    former standalone `exact_dedup` slot, folded here in r6) — plus
    ``bloom_unseen`` (NEW r7, VERDICT r6 item 3): the two-tier
    incremental-dedup probe. A Bloom filter (`pipeline/bloom`) is
    built over the even-id half of the corpus (the "already ingested"
    tier) and every document is probed map-only; True means the Bloom
    tier *guarantees* the text was never ingested (exact-dup docs of
    an even-id doc always read False; odd-id-only texts read False at
    the ~1% fpp). The oracle replays the identical md5 positions and
    bit tests, so build + probe are hash-verified end-to-end."""
    from grafeo_memory_spark.pipeline.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    # ids-only form (r9): the `kept` flag needs membership, not the
    # surviving rows — one text scan + one (hash, id) shuffle, no
    # semi-join back against the corpus
    survivors = exact_dedup_ids(docs, "text", "doc_id")
    bf = bloom_build(
        docs.where(F.col("doc_id") % 2 == 0),
        "text",
        n_items=_BLOOM_N,
        fpp=_BLOOM_FPP,
    )
    return (
        docs.select(
            "doc_id",
            doc_fingerprint("text", n=3, k=8).alias("fp"),
            (~bloom_might_contain(F.col("text"), bf)).alias("bloom_unseen"),
        )
        .join(
            survivors.withColumn("kept", F.lit(True)), "doc_id", "left"
        )
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(False)))
        .select("doc_id", "fp", "kept", "bloom_unseen")
        .orderBy("doc_id")
    )


_DUCK_COS_EC2 = (
    "list_dot_product(e.embedding::DOUBLE[], c.cv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(c.cv, c.cv)))"
)


@query(
    "semdedup",
    oracle=f"""
    WITH RECURSIVE cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id
      LIMIT greatest(8, (SELECT count(*) // 128 FROM embeddings))
    ),
    assign AS (
      SELECT vec_id, cid, sim AS c_sim FROM (
        SELECT e.vec_id, c.cid,
               max({_DUCK_COS_EC2}) OVER (PARTITION BY e.vec_id) AS best,
               {_DUCK_COS_EC2} AS sim
        FROM embeddings e CROSS JOIN cent c
      ) WHERE sim = best
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cid DESC) = 1
    ),
    pairs AS (
      SELECT x.vec_id AS ia, y.vec_id AS ib
      FROM assign x JOIN assign y
        ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN embeddings a ON a.vec_id = x.vec_id
      JOIN embeddings b ON b.vec_id = y.vec_id
      WHERE {_DUCK_COS_AB} >= 0.35
    ),
    und AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION SELECT ib, ia FROM pairs
      UNION SELECT ia, ia FROM pairs
      UNION SELECT ib, ib FROM pairs
    ),
    cc(it, node, lbl) AS (
      SELECT 0, a, a FROM (SELECT DISTINCT a FROM und)
      UNION ALL
      SELECT l.it + 1, e.a, min(l.lbl)
      FROM cc l JOIN und e ON e.b = l.node
      WHERE l.it < 10
      GROUP BY l.it, e.a
    ),
    comp AS (SELECT node, lbl AS cluster FROM cc WHERE it = 10),
    reps AS (
      SELECT node FROM (
        SELECT c.node, row_number() OVER (
          PARTITION BY c.cluster ORDER BY a.c_sim ASC, c.node ASC) AS rn
        FROM comp c JOIN assign a ON a.vec_id = c.node
      ) WHERE rn = 1
    ),
    losers AS (
      SELECT node FROM comp
      WHERE node NOT IN (SELECT node FROM reps)
    )
    SELECT e.vec_id, e.label FROM embeddings e
    WHERE e.vec_id NOT IN (SELECT node FROM losers)
    ORDER BY e.vec_id
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup survivors (Abbas et al. 2023; `pipeline/dedup.semdedup`)
    over the embeddings table: 8 deterministic seed centroids (same
    codebook convention as `ivf_topk`/`pq_adc_topk`), within-cluster
    cosine pairs at eps=0.35, min-label connected components, keep the
    farthest-from-centroid member of each duplicate group.

    The oracle replays every stage: the argmax assignment with the
    highest-cid tie-break (struct `array_max` ≡ `ORDER BY cid DESC`),
    the pair threshold, ten rounds of min-label propagation over the
    self-looped pair graph (≥ duplicate-component diameter, and stable
    past the fixpoint — same argument as the `communities_lpa`
    oracle), the lowest-(c_sim, id) representative choice, and the
    anti-join keep. Hash therefore pins clustering AND the survivor
    policy, not just the output size.

    Codebook size follows the paper's scale rule (n_centroids grows
    with the corpus; SemDeDup uses ~100k clusters for LAION):
    ``max(8, n // 128)`` seed centroids keeps within-cluster pair
    fan-out ~n*128 instead of (n/8)^2 * 8. The oracle derives its
    centroid count from the SAME expression
    (``greatest(8, count(*) // 128)`` in its LIMIT, r8 — ADVICE r7),
    so a fixture regeneration past 1152 rows changes both engines in
    lockstep instead of silently splitting them. The Spark-side
    100k cap is the only divergence point, far past gate scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    # grows with the corpus, capped where the broadcast codebook stops
    # being driver-sized (the paper holds ~100k clusters at LAION
    # scale; past the cap clusters grow instead — within-cluster pair
    # cost rises linearly, never quadratically in the corpus)
    n_cent = min(max(8, emb.count() // 128), 100_000)
    cents = [
        (i, [float(x) for x in r[0]])
        for i, r in enumerate(
            emb.orderBy("vec_id").limit(n_cent).select("embedding").collect()
        )
    ]
    out = semdedup(emb, cents, eps=0.35, vec_col="embedding", id_col="vec_id")
    return out.select("vec_id", "label").orderBy("vec_id")
