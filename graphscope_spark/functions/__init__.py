from graphscope_spark.functions import (
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
