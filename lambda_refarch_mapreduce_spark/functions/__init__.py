from lambda_refarch_mapreduce_spark.functions.scalar import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    substr_key,
    tokenize,
    word_ngrams,
)
