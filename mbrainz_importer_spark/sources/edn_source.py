"""Distributed EDN file source (SURVEY.md §2.1 S1–S5).

The reference streams EDN forms off a PushbackReader on a dedicated thread
(src/cognitect/xform/async_edn.clj:27-51). Spark-first equivalent: each file
becomes one row of `spark.read.text(..., wholetext=True)`, and an
Arrow-batched `mapInPandas` generator parses forms executor-side, yielding
bounded chunks — parallelism across files, bounded memory per chunk.

A `_row_idx` column captures form order within the file: the reference gets
stable input order implicitly from the file stream; we materialize it
because batch numbering (G3) and media run-grouping (G1) depend on it
(SURVEY.md §7.4.1). With a glob input the key is composed as
`file_ordinal * 2^40 + in_file_index` (files ranked by sorted path,
driver-side listing without content read), so the total order — and hence
batch membership under the idempotency contract — stays deterministic
run-to-run across any number of files.

Scale note: EDN is the reference's interchange format, kept for parity and
for golden tests. A 100 TB deployment would land data as Parquet/JSONL and
skip this source entirely; everything downstream of here is format-agnostic
DataFrames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..edn import iter_forms

CHUNK = 2048
_FILE_STRIDE = 1 << 40  # max forms per file before ordinals collide


def _strip_kw(k):
    return k[1:] if isinstance(k, str) and k.startswith(":") else k


def _norm_path(p: str) -> str:
    """Normalize 'file:///x', 'file:/x', '/x' to one comparable form."""
    if "://" in p:
        p = p.split("://", 1)[1]
    elif p.startswith("file:"):
        p = p[len("file:"):]
    return "/" + p.lstrip("/")


def _file_ranks(spark: SparkSession, path: str) -> dict[str, int]:
    """Deterministic ordinal per matched file, by sorted path. Uses the
    binaryFile source with a path-only projection so file CONTENT is never
    read for the listing."""
    rows = spark.read.format("binaryFile").load(path).select("path").collect()
    files = sorted(_norm_path(r["path"]) for r in rows)
    return {f: i for i, f in enumerate(files)}


_READ_CHUNK = 1 << 20  # 1 MiB of text per incremental parser feed


def read_edn_entities(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    with_index: bool = True,
    whole_file: bool = False,
) -> DataFrame:
    """Read a file (or glob) of top-level EDN maps into a DataFrame.

    Unknown keys are dropped; missing optional keys become null (the
    reference's schema-on-read semantics: absent keys, not null values).

    Default mode STREAMS each file executor-side: the task opens its
    file and feeds 1 MiB text chunks to the incremental form parser
    (edn.iter_forms_chunks), so per-task memory is bounded by the
    largest single FORM, not the largest file — a file bigger than
    executor heap ingests fine (pinned in test_query_edn). The file
    open is a local/POSIX read; on an object store this is where a
    Hadoop-FS/fsspec open would slot in. `whole_file=True` keeps the
    original wholetext source (one row per file through Spark's text
    reader) — same results, file-bounded memory — for inputs that are
    not plain local paths."""
    names = [f.name for f in schema.fields]
    out_schema = T.StructType(
        list(schema.fields) + ([T.StructField("_row_idx", T.LongType(), False)] if with_index else [])
    )
    ranks = _file_ranks(spark, path)

    def rows_to_frames(forms, base, with_idx):
        rows: list[dict] = []
        for idx, form in enumerate(forms):
            if not isinstance(form, dict):
                raise ValueError(f"expected EDN map, got {type(form)}")
            row = {n: None for n in names}
            for k, v in form.items():
                n = _strip_kw(k)
                if n in row:
                    row[n] = v
            if with_idx:
                row["_row_idx"] = base + idx
            rows.append(row)
            if len(rows) >= CHUNK:
                yield pd.DataFrame(rows, columns=list(row))
                rows = []
        if rows:
            yield pd.DataFrame(rows, columns=list(rows[0]))

    if not whole_file:
        from ..edn import iter_forms_chunks

        def parse_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for fname, rank in zip(pdf["path"], pdf["rank"]):
                    def chunks():
                        with open(fname, encoding="utf-8") as f:
                            while True:
                                c = f.read(_READ_CHUNK)
                                if not c:
                                    return
                                yield c

                    yield from rows_to_frames(
                        iter_forms_chunks(chunks()),
                        int(rank) * _FILE_STRIDE,
                        with_index,
                    )

        files = spark.createDataFrame(
            sorted(ranks.items()), "path string, rank long"
        ).repartition(max(len(ranks), 1), "path")
        return files.mapInPandas(parse_stream, schema=out_schema)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, text in zip(pdf["_file"], pdf["value"]):
                base = 0
                if with_index:
                    rank = ranks.get(_norm_path(fname))
                    if rank is None:
                        raise ValueError(
                            f"file {fname!r} not in driver listing {sorted(ranks)}"
                        )
                    base = rank * _FILE_STRIDE
                yield from rows_to_frames(iter_forms(text), base, with_index)

    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"), "value"
    )
    return raw.mapInPandas(parse, schema=out_schema)


def read_edn_forms_local(path: str) -> list:
    """Driver-side whole-file EDN read for small config/dim files —
    the analog of the reference's slurp+read-string (importer.clj:257-269).
    Only ever used for dimension/config data that is then broadcast."""
    with open(path, encoding="utf-8") as f:
        return list(iter_forms(f.read()))


def write_edn(df: DataFrame, path: str, order_col: str | None = None) -> int:
    """EDN file sink (K1, async_edn.clj:66-82): collect-and-print, for
    golden-format export only (intermediates standardize on Parquet).
    Returns number of forms written."""
    from ..edn_dump import dumps

    rows = df.collect()
    if order_col is not None:
        rows = sorted(rows, key=lambda r: r[order_col])
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            d = r.asDict(recursive=True)
            d.pop(order_col, None)
            f.write(dumps(d))
            f.write("\n")
            n += 1
    return n
