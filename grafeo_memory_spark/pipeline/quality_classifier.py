"""Model-based quality filtering (the GPT-3 §Appendix-A / LLaMA
pipeline stage): train a linear classifier to distinguish a
high-quality reference corpus (positives) from raw crawl (negatives),
score every document, and keep documents by the published
Pareto-acceptance rule so the filtered corpus is *biased toward* —
not truncated at — high scores.

Spark-first by construction: featurization is hashed bag-of-words
(``pyspark.ml.feature.HashingTF`` — the fastText trick, no vocabulary
state) and the model is ``pyspark.ml`` logistic regression (JVM-side
L-BFGS over the cluster; no Python in the loop). Scoring broadcasts
the coefficient vector with the fitted pipeline and is map-only.

Acceptance rule (GPT-3: keep if ``pareto_sample < score``, α = 9):
re-expressed rerun-deterministically — the uniform draw is the repo's
md5 Bernoulli convention (``sampling.stratified_sample``), inverted
through the Pareto CDF, so the same (id, salt) always draws the same
threshold and backfills reproduce bit-identical corpora.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["QualityModel", "train_quality_classifier", "pareto_filter"]


@dataclass
class QualityModel:
    """Fitted featurize+classify pipeline plus its training knobs."""

    pipeline_model: "object"  # pyspark.ml PipelineModel
    num_features: int
    score_col: str = "quality_prob"

    def score(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Append ``score_col`` — P(document ~ reference corpus) — to
        ``df``. Map-only: the coefficient vector rides the broadcast
        pipeline; no shuffle, no Python UDF."""
        from pyspark.ml.functions import vector_to_array

        scored = self.pipeline_model.transform(
            df.withColumn("__qtext", F.coalesce(F.col(text_col), F.lit("")))
        )
        return scored.withColumn(
            self.score_col,
            F.round(
                vector_to_array(F.col("__qprob")).getItem(1), 6
            ),
        ).drop("__qtext", "__qwords", "__qfeat", "__qraw", "__qprob", "__qpred")


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    *,
    num_features: int = 1 << 18,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> QualityModel:
    """Fit the reference-vs-crawl classifier. ``positives`` is the
    high-quality corpus (wiki/books), ``negatives`` the raw crawl
    sample; both need only ``text_col``. Hashed features keep the
    model stateless (no vocabulary to ship — ``num_features`` buckets,
    2^18 default ≈ fastText's defaults) and the label column is built
    here, so callers pass plain document tables.

    Training cost: one pass per L-BFGS iteration over (pos ∪ neg) —
    at 100 TB you train on a SAMPLE (a few million docs is the
    published scale) and score the full corpus with the fixed model.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    data = positives.select(
        F.coalesce(F.col(text_col), F.lit("")).alias("__qtext"),
        F.lit(1.0).alias("__qlabel"),
    ).unionByName(
        negatives.select(
            F.coalesce(F.col(text_col), F.lit("")).alias("__qtext"),
            F.lit(0.0).alias("__qlabel"),
        )
    )
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="__qtext",
                outputCol="__qwords",
                pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="__qwords",
                outputCol="__qfeat",
                numFeatures=num_features,
            ),
            LogisticRegression(
                featuresCol="__qfeat",
                labelCol="__qlabel",
                predictionCol="__qpred",
                probabilityCol="__qprob",
                rawPredictionCol="__qraw",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return QualityModel(
        pipeline_model=pipe.fit(data), num_features=num_features
    )


def pareto_filter(
    scored: DataFrame,
    score_col: str = "quality_prob",
    id_col: str = "doc_id",
    *,
    alpha: float = 9.0,
    salt: int = 0,
) -> DataFrame:
    """GPT-3's documented acceptance rule: keep a document when
    ``1 - score < pareto_draw`` fails to reject — i.e. keep iff
    ``(1 - score) < x`` where ``x ~ Pareto(alpha)−1``. High-score docs
    almost always pass; low-score docs survive occasionally, keeping
    tail diversity instead of a hard cutoff.

    Deterministic: the uniform is the md5(id:salt) Bernoulli from the
    sampling module, pushed through the inverse Pareto CDF
    ``x = u^(−1/α) − 1`` — rerun-stable, oracle-replayable in SQL
    (DuckDB: same md5 arithmetic + ``pow``). Map-only."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col(id_col), F.lit(str(salt)))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    # guard u=0 (md5 prefix 00000000): pow(0, -1/a) = inf → always kept
    draw = F.pow(F.greatest(u, F.lit(1e-12)), F.lit(-1.0 / alpha)) - 1.0
    return scored.where((F.lit(1.0) - F.col(score_col)) < draw)
