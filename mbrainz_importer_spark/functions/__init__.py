"""The engine's declared scalar-function surface (SURVEY.md §2.6).

Everything here is a JVM built-in (whole-stage codegen) or a thin
composition of built-ins — re-exported so the engine API is explicit and
greppable. Engine-specific helpers (tempid, fingerprints) live alongside.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# re-exported built-ins (each exercised by at least one oracle-paired query)
from pyspark.sql.functions import (  # noqa: F401
    abs,
    array,
    coalesce,
    concat_ws,
    date_trunc,
    datediff,
    dayofmonth,
    explode,
    floor,
    from_json,
    get_json_object,
    greatest,
    least,
    length,
    lower,
    map_from_entries,
    month,
    regexp_extract,
    regexp_replace,
    round,
    size,
    split,
    struct,
    substring,
    to_json,
    upper,
    when,
    year,
)

from ..operators.text import fingerprint, fingerprint_num, tokens  # noqa: F401


def tempid(prefix: str, *cols: Column | str) -> Column:
    """P6 tempid synthesis (create-tempid, importer.clj:161-164):
    '{prefix}-{v1}-{v2}-...' — the coalescing key for entities asserted
    from multiple rows (multi-artist tracks)."""
    return F.concat_ws("-", F.lit(prefix), *[F.col(c) if isinstance(c, str) else c for c in cols])
