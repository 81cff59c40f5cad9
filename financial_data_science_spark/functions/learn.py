"""MLlib pipeline layer (reference recipes/learn.py:36-72).

The reference preps train/test splits and batches for torch models; the
Spark-native counterpart is an MLlib ``Pipeline`` whose stages run
distributed and whose fitted model is itself a DataFrame transformer.
``lang_classifier_pipeline`` is the worked example on the synthetic
documents table: tokens -> counts -> logistic regression over the ``lang``
label — tokenization and featurization scale out; training is MLlib's
distributed LBFGS.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import CountVectorizer, RegexTokenizer, StringIndexer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lang_classifier_pipeline(
    text_col: str = "text",
    label_col: str = "lang",
    vocab_size: int = 4096,
    max_iter: int = 20,
) -> Pipeline:
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens__", pattern="\\W+", toLowercase=True
    )
    cv = CountVectorizer(
        inputCol="__tokens__", outputCol="__features__", vocabSize=vocab_size
    )
    idx = StringIndexer(inputCol=label_col, outputCol="__label__")
    lr = LogisticRegression(
        featuresCol="__features__", labelCol="__label__", maxIter=max_iter,
        regParam=0.01,
    )
    return Pipeline(stages=[tok, cv, idx, lr])


def fit_and_score(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    test_frac: float = 0.25,
    seed: int = 42,
) -> tuple[PipelineModel, float]:
    """Fit on a random split, return (model, held-out accuracy)."""
    train, test = docs.randomSplit([1.0 - test_frac, test_frac], seed=seed)
    model = lang_classifier_pipeline(text_col, label_col).fit(train)
    pred = model.transform(test)
    acc = (
        pred.select(
            (F.col("prediction") == F.col("__label__")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    return model, float(acc)
