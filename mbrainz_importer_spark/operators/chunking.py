"""Document chunking: fixed-size token windows with overlap — the
context-window preprocessing step every retrieval / training pipeline
runs before embedding or packing.

Distinct from operators.curation.pack_sequences (which concatenates the
corpus and cuts at global offsets): chunking is PER-DOCUMENT, so it is a
pure projection — tokenize, enumerate window starts, slice — with ZERO
exchanges and no cross-row state. At 100 TB that matters: the operator
composes onto any scan without adding a shuffle, and Catalyst keeps the
whole thing in one WholeStageCodegen span (no UDF: sequence/slice/
transform/posexplode are all built-ins).

Window semantics (the llama-index/langchain convention): starts at
0, stride, 2·stride, …; every start < n_tokens; the last window may be
short; an empty document yields no chunks. stride < chunk means
overlap; stride == chunk means disjoint windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    stride: int,
) -> DataFrame:
    """(id, chunk_idx, start_token, n_tokens, chunk_text) — one row per
    sliding token window. chunk_idx is 0-based in document order;
    start_token is the 0-based token offset of the window."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1: {stride}")
    toks = tokens(F.col(text_col))
    # trailing/leading whitespace tokenizes to "" — drop, like every
    # text operator in this repo
    toks = F.filter(toks, lambda t: t != "")
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array()
    )
    out = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts).alias(
            "chunk_idx", "start_token"
        )
    )
    window = F.slice(
        F.col("__toks"), F.col("start_token") + 1, F.lit(chunk_tokens)
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start_token").cast("bigint").alias("start_token"),
        F.size(window).cast("bigint").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
