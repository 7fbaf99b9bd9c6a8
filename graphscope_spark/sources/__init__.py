from graphscope_spark.sources.pages import generate_pages, pages_schema
from graphscope_spark.sources.extract import extract_text, extract_links, links_from_pages
from graphscope_spark.sources.linkgraph import graph_from_pages

__all__ = [
    "generate_pages",
    "pages_schema",
    "extract_text",
    "extract_links",
    "links_from_pages",
    "graph_from_pages",
]
