"""Model-based quality filter (pipeline/quality_classifier.py):
separable-corpus sanity, deterministic scoring, Pareto acceptance
replayed in DuckDB, and the map-only scoring plan pin."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.quality_classifier import (
    pareto_filter,
    train_quality_classifier,
)

GOOD = [
    "the study presents a rigorous analysis of long form prose "
    "with careful citations and measured conclusions",
    "chapter three develops the historical argument with archival "
    "evidence and thorough footnotes throughout",
    "the novel renders its characters with patient detailed "
    "interior monologue and restrained lyrical prose",
    "a peer reviewed survey of the literature summarizing decades "
    "of experimental findings and open problems",
]
SPAM = [
    "click here buy now free free free discount casino winner",
    "cheap pills online no prescription limited offer act now",
    "congratulations you won claim your prize click click click",
    "hot singles near you sign up now free bonus casino spins",
]


def _model(spark):
    pos = spark.createDataFrame([(t,) for t in GOOD * 8], ["text"])
    neg = spark.createDataFrame([(t,) for t in SPAM * 8], ["text"])
    return train_quality_classifier(pos, neg, num_features=1 << 12)


def test_separable_corpora_score_apart(spark):
    model = _model(spark)
    probe = spark.createDataFrame(
        [
            (1, "a careful survey of archival evidence and citations"),
            (2, "free casino winner click now claim prize"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r["quality_prob"]
        for r in model.score(probe).collect()
    }
    assert rows[1] > 0.8 > 0.2 > rows[2]


def test_scoring_is_deterministic_and_schema_preserving(spark):
    model = _model(spark)
    probe = spark.createDataFrame(
        [(i, GOOD[i % 4], "web") for i in range(8)],
        "doc_id int, text string, source string",
    )
    a = sorted(map(tuple, model.score(probe).collect()))
    b = sorted(map(tuple, model.score(probe).collect()))
    assert a == b
    cols = model.score(probe).columns
    assert cols == ["doc_id", "text", "source", "quality_prob"]


def test_pareto_filter_matches_duckdb_replay(spark):
    rows = [(i, round(0.05 + 0.9 * i / 99, 6)) for i in range(100)]
    scored = spark.createDataFrame(rows, "doc_id int, quality_prob double")
    kept = sorted(
        r["doc_id"]
        for r in pareto_filter(scored, alpha=9.0, salt=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {p})" for i, p in rows)
        + ") t(doc_id, quality_prob)"
    )
    want = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT doc_id FROM s
            WHERE (1.0 - quality_prob) <
              pow(greatest(
                ('0x' || substr(md5(doc_id::VARCHAR || ':3'), 1, 8))
                  ::BIGINT::DOUBLE / 4294967296.0, 1e-12), -1.0/9.0) - 1.0
            """
        ).fetchall()
    )
    assert kept == want
    # the rule is biased, not a cutoff: the top quintile survives at a
    # strictly higher rate than the bottom one (keep prob (2−s)^−α),
    # and neither everything nor nothing survives
    high = sum(1 for i in kept if i >= 80)
    low = sum(1 for i in kept if i < 20)
    assert high > low
    assert 0 < len(kept) < 100


def test_pareto_filter_deterministic_rerun(spark):
    scored = spark.createDataFrame(
        [(i, 0.5) for i in range(200)], "doc_id int, quality_prob double"
    )
    a = sorted(r["doc_id"] for r in pareto_filter(scored).collect())
    b = sorted(r["doc_id"] for r in pareto_filter(scored).collect())
    assert a == b


def test_scoring_plan_is_map_only(spark):
    model = _model(spark)
    probe = spark.createDataFrame([(1, "text here")], "doc_id int, text string")
    plan = (
        model.score(probe)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
