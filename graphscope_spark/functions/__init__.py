from graphscope_spark.functions import corpus, dedup, multimodal, similarity, text, urls

__all__ = ["corpus", "dedup", "multimodal", "similarity", "text", "urls"]
