"""Vocabulary / document-vector layer on MLlib (reference
unstructured/vocab.py:21-114).

The reference keeps word<->index dicts plus a numpy embedding matrix and
loops documents through them.  The Spark-native shape is an MLlib
Pipeline: ``RegexTokenizer`` -> ``CountVectorizer`` fit over the corpus
(distributed vocabulary count), giving a ``CountVectorizerModel`` whose
``vocabulary`` IS the word->index map; doc-term vectors are a column, not
a python dict.  Embedding lookup is a broadcast join of exploded tokens
against an (word, vector) table — no driver-side matrix.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import CountVectorizer, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_vocab_pipeline(
    text_col: str = "text",
    vocab_size: int = 1 << 16,
    min_df: float | int = 1,
    pattern: str = "\\W+",
) -> Pipeline:
    """Tokenize + count-vectorize pipeline (vocab.py:29-66 Vocab build).

    ``CountVectorizer.fit`` runs one distributed wordcount; the fitted
    vocabulary is ordered by corpus frequency, like the reference's
    most-common-first indexing.
    """
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens__", pattern=pattern,
        toLowercase=True,
    )
    cv = CountVectorizer(
        inputCol="__tokens__", outputCol="doc_vec", vocabSize=vocab_size,
        minDF=min_df,
    )
    return Pipeline(stages=[tok, cv])


def fit_vocab(
    docs: DataFrame, text_col: str = "text", **kwargs
) -> tuple[PipelineModel, list[str]]:
    """Fit the vocab pipeline; returns (model, vocabulary) where
    vocabulary[i] is the token at index i (word->index = dict position,
    vocab.py:49-57)."""
    model = build_vocab_pipeline(text_col, **kwargs).fit(docs)
    return model, model.stages[-1].vocabulary


def doc_term_vectors(
    model: PipelineModel, docs: DataFrame
) -> DataFrame:
    """Attach the sparse doc-term vector column."""
    return model.transform(docs).drop("__tokens__")


def embedding_join(
    docs: DataFrame,
    embeddings: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    word_col: str = "word",
    vec_col: str = "vector",
) -> DataFrame:
    """Mean-of-word-embeddings document vector via explode + broadcast join
    + aggregate (vocab.py:98-114 embedding matrix lookup, distributed).

    ``embeddings`` is the (word, vector array<float>) dimension — broadcast
    (GloVe-scale fits); the corpus side only shuffles for the final
    per-document mean.
    """
    toks = docs.select(
        id_col,
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), "\\W+"), lambda t: t != "")
        ).alias(word_col),
    )
    dim = int(embeddings.select(F.size(vec_col)).first()[0])
    joined = toks.join(F.broadcast(embeddings), word_col, "inner")
    return joined.groupBy(id_col).agg(
        F.transform(
            F.aggregate(
                F.collect_list(vec_col),
                F.array_repeat(F.lit(0.0), dim),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("double")),
            ),
            lambda s: s / F.count(word_col),
        ).alias("doc_embedding"),
        F.count(word_col).alias("n_matched"),
    )
