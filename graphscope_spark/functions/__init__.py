from graphscope_spark.functions import (
    classify,
    corpus,
    dedup,
    multimodal,
    ranking,
    sampling,
    similarity,
    sketch,
    text,
    urls,
)

__all__ = [
    "classify",
    "corpus",
    "dedup",
    "multimodal",
    "ranking",
    "sampling",
    "similarity",
    "sketch",
    "text",
    "urls",
]
