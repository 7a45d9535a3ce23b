"""Trained document-quality classifier (the CCNet-style model filter).

The heuristic quality gate (operators/text.quality_columns, C4/Gopher
rules) is a fixed formula; production pipelines follow it with a TRAINED
filter (CCNet trains a fastText LM to rank documents by "looks like
clean text"). The container has no fastText, so the in-repo model tier
pattern applies (same as pipeline/perceptron_ner.py): a real trained
model — Spark ML logistic regression over pure-codegen text features —
with deterministic synthetic supervision, graded on OUTPUT (held-out
accuracy floors in tests/test_quality_clf.py), and a drop-in call site
for a production model.

Supervision is self-generated the way weak-supervision quality filters
bootstrap: the corpus plays the POSITIVE class, and NEGATIVES are
deterministic corruptions of the same documents covering the three
dominant junk modes a crawl actually yields —

- repetition junk (a few tokens tiled — the Gopher repetition failure),
- non-language gibberish (tokens replaced by their md5 hex — no
  stopwords, digit-heavy, wrong token shape),
- boilerplate floods (nav/footer token soup repeated).

Everything per-row is whole-stage-codegen Column expressions (corruption
AND featurization — no Python, no UDFs); only the L-BFGS fit runs in
Spark ML. At 100 TB the featurize+score path is a scan-speed projection;
the fit touches whatever labeled sample the pipeline budgets.

Reference: the scraper keeps every parsed page unconditionally
(CrawlPaperTuoiTre.py saves all articles); quality filtering is a
capability its data consumers add downstream — this is that stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from web_scraper_spark.operators.text import quality_columns, tokens

_BOILERPLATE = (
    "home login register cookie privacy policy next page menu search "
    "subscribe footer copyright contact terms sitemap share follow"
)

FEATURES = [
    "avg_token_len",
    "alpha_ratio",
    "digit_ratio",
    "punct_ratio",
    "stopword_ratio",
    "distinct_ratio",
]


def corrupt_text(text_col: Column, id_col: Column) -> Column:
    """Deterministic junk twin of a document, mode = doc_id % 3."""
    tok = tokens(text_col)
    mode = id_col.cast("bigint") % 3
    rep = F.array_join(
        F.flatten(F.array_repeat(F.slice(tok, 1, 4), 12)), " "
    )
    gib = F.array_join(
        F.transform(tok, lambda t: F.substring(F.md5(t), 1, 8)), " "
    )
    boil = F.array_join(F.array_repeat(F.lit(_BOILERPLATE), 6), " ")
    return (
        F.when(mode == 0, rep).when(mode == 1, gib).otherwise(boil)
    )


def feature_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + the 6-feature vector, all codegen (no Python in plan)."""
    q = quality_columns(text_col)
    tok = tokens(F.col(text_col))
    distinct_ratio = F.round(
        F.size(F.array_distinct(tok)).cast("double")
        / F.greatest(F.size(tok), F.lit(1)),
        6,
    )
    cols = {k: q[k] for k in FEATURES if k in q}
    cols["distinct_ratio"] = distinct_ratio
    return docs.select(
        "doc_id",
        *[cols[k].alias(k) for k in FEATURES],
        F.array(*[cols[k].cast("double") for k in FEATURES]).alias("farr"),
    )


def _with_vector(feat: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return feat.withColumn("features", array_to_vector("farr"))


def fit_quality_clf(train_docs: DataFrame):
    """Fit LR on (clean=1, corrupted-twin=0) built from ``train_docs``.

    The corruption runs distributed as codegen expressions — the labeled
    set is never collected; the only driver-side artifact is the fitted
    coefficient vector (6 doubles)."""
    from pyspark.ml.classification import LogisticRegression

    clean = train_docs.select("doc_id", "text")
    junk = train_docs.select(
        "doc_id", corrupt_text(F.col("text"), F.col("doc_id")).alias("text")
    )
    labeled = _with_vector(
        feature_frame(clean).withColumn("label", F.lit(1.0)).unionByName(
            feature_frame(junk).withColumn("label", F.lit(0.0))
        )
    )
    lr = LogisticRegression(
        maxIter=50, regParam=0.01, featuresCol="features", labelCol="label"
    )
    return lr.fit(labeled)


def score_quality(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, prob_clean, pred for any documents frame.

    The fitted artifact is 7 doubles (6 coefficients + intercept), so
    scoring is a pure-codegen sigmoid over the feature projection — NOT
    ``model.transform`` (which ships the model object into tasks; its
    training summary pins the SparkSession and is not task-serializable
    in a shared session) — i.e. the whole score path runs at scan speed
    with zero Python and zero JVM object shipping."""
    coef = [float(c) for c in model.coefficients]
    b = float(model.intercept)
    feat = feature_frame(docs, text_col)
    z = F.lit(b)
    for i, w in enumerate(coef):
        z = z + F.lit(w) * F.col("farr")[i]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.select(
        "doc_id",
        F.round(prob, 6).alias("prob_clean"),
        (prob >= 0.5).cast("int").alias("pred"),
    )


def quality_classifier(docs: DataFrame, holdout_mod: int = 5) -> DataFrame:
    """Registered-query composition: fit on the train split
    (doc_id % holdout_mod != 0), score a held-out mixed clean+junk set.

    Output per held-out row: ``doc_id`` (junk twins get doc_id +
    10_000_000), ``is_junk`` ground truth, ``prob_clean``, ``pred``.
    Rows-only (ML fit; L-BFGS gradient sums are partition-order floats);
    held-out accuracy floor asserted in tests/test_quality_clf.py.
    """
    train = docs.filter(F.col("doc_id") % holdout_mod != 0)
    held = docs.filter(F.col("doc_id") % holdout_mod == 0)
    model = fit_quality_clf(train)
    held_clean = held.select("doc_id", "text")
    held_junk = held.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        corrupt_text(F.col("text"), F.col("doc_id")).alias("text"),
    )
    mixed = held_clean.withColumn("is_junk", F.lit(False)).unionByName(
        held_junk.withColumn("is_junk", F.lit(True))
    )
    return (
        score_quality(model, mixed)
        .join(mixed.select("doc_id", "is_junk"), on="doc_id")
        .select("doc_id", "is_junk", "prob_clean", "pred")
    )
