"""Compression-ratio text quality signal — the zlib-ratio heuristic of
web-scale curation pipelines (highly repetitive or templated text
compresses far better than natural prose; extremely high entropy looks
like binary/garbage): ratio = deflated bytes / raw bytes.

DEFLATE output for a given input, level, and strategy is deterministic
(RFC 1951 encoder state is fully specified by the zlib implementation),
so the signal is reproducible run-to-run on the same library — but it
is NOT expressible in SQL, so this operator carries a rows-only
registry contract (no DuckDB oracle) plus exact unit tests on known
strings.

Execution shape: Arrow-batched mapInPandas — the executor-side Python
worker deflates each batch (zlib releases the GIL around the C call);
no shuffle, no driver involvement, linear scan-projection like any
other per-row signal. At 100 TB this pipelines with the other text
filters in a single pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compression_ratios(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression stats:
    (id, n_bytes, n_compressed, compression_ratio). Empty text yields
    ratio over max(n_bytes, 1) so the column is never null/inf."""
    if not (0 <= level <= 9):
        raise ValueError(f"zlib level must be 0..9: {level}")

    out_schema = f"{id_col} long, n_bytes long, n_compressed long, compression_ratio double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "compression_ratio": n_comp / n_bytes.clip(lower=1),
                }
            )

    return df.select(id_col, text_col).mapInPandas(score, schema=out_schema)


def compression_filter(
    df: DataFrame,
    min_ratio: float = 0.25,
    max_ratio: float = 1.05,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Keep documents whose ratio sits in the natural-prose band:
    below `min_ratio` is template/repetition spam, above `max_ratio`
    is incompressible noise. Joins the verdict back by id so callers
    keep their full row."""
    scores = compression_ratios(df, id_col, text_col, level).select(
        id_col,
        F.col("compression_ratio").between(min_ratio, max_ratio).alias(
            "__keep"
        ),
    )
    return df.join(scores, id_col).where(F.col("__keep")).drop("__keep")
