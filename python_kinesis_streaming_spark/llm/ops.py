"""§2.11 LLM-data-pipeline operator family — aggregator module.

Importing this module registers every op in the family (the registry's
``_OP_MODULES`` lists only this aggregator):

- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
- ``similarity`` — brute-force knn, blocked pairwise top-k, embedding
                   near-dup, random-hyperplane LSH ANN
- ``text``       — corpus stats, tf-idf, language ID, quality gate,
                   fingerprint, token counting
- ``multimodal`` — array/text columns through relational ops; binary
                   payload decode plumbing
"""

from __future__ import annotations

from python_kinesis_streaming_spark.llm import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    text,
)
