from graphscope_spark.functions import (
    corpus,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
    urls,
)

__all__ = [
    "corpus",
    "dedup",
    "multimodal",
    "sampling",
    "similarity",
    "text",
    "urls",
]
