from cortex_spark.extract.html import extract_text_py, extract_text_udf
from cortex_spark.extract.chunk import chunk_markdown, chunk_plain, chunk_udf
from cortex_spark.extract.classify import classify_col, title_col, classify_py, title_py
from cortex_spark.extract.pipeline import pages_to_nodes

__all__ = [
    "extract_text_py",
    "extract_text_udf",
    "chunk_markdown",
    "chunk_plain",
    "chunk_udf",
    "classify_col",
    "title_col",
    "classify_py",
    "title_py",
    "pages_to_nodes",
]
