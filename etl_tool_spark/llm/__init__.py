"""LLM-training-data pipeline operators (beyond the reference's surface,
per the north star): deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal column plumbing.

All deterministic: every hash derives from md5 so the DuckDB oracle can
reproduce results bit-for-bit (see hash64 in text.py)."""

from etl_tool_spark.llm import (bpe, dedup, multimodal, prep, similarity,
                                text, warc)

__all__ = ["bpe", "dedup", "similarity", "text", "multimodal", "prep",
           "warc"]
