"""The streaming EDN form parser (edn.iter_forms_chunks) and the
executor-side file-streaming source mode (r10 verdict #8): per-task
memory bounded by the largest FORM, not the largest file, with results
identical to the wholetext path at every chunk boundary."""

from __future__ import annotations

import pytest

from mbrainz_importer_spark.edn import EdnError, iter_forms, iter_forms_chunks

TRICKY = (
    '{:a "str with \\" quote and \\\\ slash" :b [1 2 3]}\n'
    "; a comment that must not eat the next form\n"
    '#_ {:discarded true} {:c #uuid "6F1A38D0-4B47-11E2-9D44-D6CDE0F6B37E"}\n'
    "#:artist{:name \"Amy\" :id 42}\n"
    "#{1 2 3} [nil true false -1.5e3 :kw/name sym]\n"
    "{:nested {:deep [{:x 1} {:y (a b)}]}}\n"
    "12345\n"
)


def _chunked(text: str, size: int):
    return (text[i : i + size] for i in range(0, len(text), size))


def test_chunked_parse_equals_string_parse_at_every_split():
    """Every 1..n chunk size — including 1-char chunks that split
    strings, escapes, comments, #uuid tags, discards, and trailing
    scalars mid-token — must yield exactly the string parser's forms."""
    want = list(iter_forms(TRICKY))
    assert len(want) == 7  # sanity: the fixture exercises real forms
    for size in [1, 2, 3, 5, 7, 16, 64, len(TRICKY)]:
        got = list(iter_forms_chunks(_chunked(TRICKY, size)))
        assert got == want, f"diverged at chunk size {size}"


def test_trailing_scalar_is_not_split_across_chunks():
    """A scalar token ending one chunk and continuing in the next must
    come out whole — the truncated-token case only end-of-input can
    certify."""
    assert list(iter_forms_chunks(iter(["12", "34 56"]))) == [1234, 56]
    assert list(iter_forms_chunks(iter(["12", "34"]))) == [1234]


def test_comment_spanning_chunks_does_not_splice():
    text_a = "{:a 1} ; comment without newline yet"
    text_b = " still comment\n{:b 2}"
    got = list(iter_forms_chunks(iter([text_a, text_b])))
    assert got == [{":a": 1}, {":b": 2}]


def test_malformed_input_raises_at_end_of_stream():
    with pytest.raises(EdnError):
        list(iter_forms_chunks(iter(["{:a 1} {:unterminated "])))
    with pytest.raises(EdnError):
        list(iter_forms_chunks(iter(['{:a "no close'])))


def test_streaming_parse_memory_is_form_bounded(tmp_path):
    """Ingest a file ~20 MB through the chunked parser reading lazily
    from disk: tracemalloc peak must stay a small fraction of the file
    size (the wholetext path would hold all of it). This is the
    'file larger than headroom' contract at test scale."""
    import tracemalloc

    p = tmp_path / "big.edn"
    form = '{:id %d :name "entity-%d" :tags [:a :b :c] :score %d.5}\n'
    with open(p, "w") as f:
        n = 0
        size = 0
        while size < 20 * 1024 * 1024:
            s = form % (n, n, n % 100)
            f.write(s)
            size += len(s)
            n += 1

    def chunks():
        with open(p) as f:
            while True:
                c = f.read(1 << 20)
                if not c:
                    return
                yield c

    tracemalloc.start()
    count = sum(1 for _ in iter_forms_chunks(chunks()))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n
    assert peak < 6 * 1024 * 1024, (
        f"peak {peak / 1e6:.1f} MB for a 20 MB file — parser is not "
        "form-bounded"
    )


def test_source_streaming_mode_equals_wholetext_mode(spark, tmp_path):
    """read_edn_entities default (executor-side file streaming) must
    produce exactly the wholetext rows, including _row_idx order,
    across a multi-file glob."""
    from pyspark.sql import types as T

    from mbrainz_importer_spark.sources.edn_source import read_edn_entities

    d = tmp_path / "edn"
    d.mkdir()
    (d / "b.edn").write_text('{:id 3 :name "c"}\n{:id 4}\n')
    (d / "a.edn").write_text('{:id 1 :name "a"}\n{:id 2 :name "b" :junk 9}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    stream_rows = sorted(
        tuple(r) for r in read_edn_entities(spark, f"{d}/*.edn", schema).collect()
    )
    whole_rows = sorted(
        tuple(r)
        for r in read_edn_entities(
            spark, f"{d}/*.edn", schema, whole_file=True
        ).collect()
    )
    assert stream_rows == whole_rows
    assert len(stream_rows) == 4


def test_source_streaming_arrow_uri_equals_posix(spark, tmp_path):
    """Object-store streaming path (r11 verdict #1): the same multi-file
    glob read through a file:// URI with the pyarrow.fs open pinned
    (`filesystem='arrow'`) must produce exactly the POSIX streaming
    rows, including _row_idx assignment — end-to-end through real Spark
    tasks, so the listing, the per-task FileSystem.from_uri resolve,
    the byte-stream open, and the incremental UTF-8 decode are all the
    production object-store code (LocalFileSystem and S3FileSystem
    share the open_input_stream contract)."""
    from pyspark.sql import types as T

    from mbrainz_importer_spark.sources.edn_source import read_edn_entities

    d = tmp_path / "edn"
    d.mkdir()
    (d / "b.edn").write_text('{:id 3 :name "c✓"}\n{:id 4}\n')
    (d / "a.edn").write_text('{:id 1 :name "héllo"}\n{:id 2 :junk 9}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    posix = sorted(
        tuple(r)
        for r in read_edn_entities(spark, f"{d}/*.edn", schema).collect()
    )
    arrow = sorted(
        tuple(r)
        for r in read_edn_entities(
            spark, f"file://{d}/*.edn", schema, filesystem="arrow"
        ).collect()
    )
    assert arrow == posix
    assert len(arrow) == 4


def test_arrow_chunk_stream_decodes_split_multibyte(tmp_path):
    """The arrow open reads BYTES in fixed chunks; a chunk boundary that
    splits a multibyte UTF-8 character must decode losslessly through
    the incremental decoder."""
    from mbrainz_importer_spark.sources import edn_source as es

    p = tmp_path / "m.edn"
    text = '{:s "' + "é✓" * 1000 + '"}\n'
    p.write_text(text, encoding="utf-8")
    old = es._READ_CHUNK
    es._READ_CHUNK = 7  # guaranteed to split the 2- and 3-byte chars
    try:
        got = "".join(es._iter_text_chunks(f"file://{p}", "arrow"))
    finally:
        es._READ_CHUNK = old
    assert got == text


def test_fs_mode_resolution_and_fallback(tmp_path):
    """Scheme dispatch: local paths stream POSIX; URIs no installed
    library can open fall back to the wholetext reader instead of
    failing inside a task with a cryptic open() error (ADVICE r11:
    silent default-behavior change for non-local call sites)."""
    from mbrainz_importer_spark.sources.edn_source import _resolve_fs_mode

    assert _resolve_fs_mode(str(tmp_path / "*.edn"), "auto") == "posix"
    assert _resolve_fs_mode(f"file://{tmp_path}", "auto") == "posix"
    assert _resolve_fs_mode("weird-scheme://bucket/x.edn", "auto") == "wholetext"
    assert _resolve_fs_mode("s3://bucket/x.edn", "arrow") == "arrow"


def test_fsspec_streaming_matches_wholetext(spark, tmp_path):
    """When fsspec IS installed it outranks pyarrow in auto mode; prove
    the fsspec open path end-to-end. Skipped where fsspec is absent
    (this container bakes pyarrow only — the arrow test above is the
    always-on object-store proof)."""
    pytest.importorskip("fsspec")
    from pyspark.sql import types as T

    from mbrainz_importer_spark.sources.edn_source import read_edn_entities

    d = tmp_path / "edn"
    d.mkdir()
    (d / "a.edn").write_text('{:id 1}\n{:id 2}\n')
    schema = T.StructType([T.StructField("id", T.LongType())])
    got = sorted(
        tuple(r)
        for r in read_edn_entities(
            spark, f"file://{d}/*.edn", schema, filesystem="fsspec"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in read_edn_entities(
            spark, f"{d}/*.edn", schema, whole_file=True
        ).collect()
    )
    assert got == want
