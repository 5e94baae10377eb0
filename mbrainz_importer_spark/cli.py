"""CLI entry point — the analog of the reference's `-main`
(src/datomic/mbrainz/importer.clj:318-352) plus a query runner for the
REPL workflow of examples/explore_db.clj.

    python -m mbrainz_importer_spark.cli MANIFEST
    python -m mbrainz_importer_spark.cli query WAREHOUSE QUERY_EDN [param ...]

Manifest (EDN like the reference's config/manifest.edn.example, or JSON):

    {:basedir "/root/reference/subsets"
     :warehouse "/tmp/mbrainz-warehouse"
     :batch-size 100
     :concurrency 8          ; Spark shuffle/write parallelism
     :import-order [...]}    ; optional override

Idempotent; prints per-stage results and timing; exits non-zero on error.

The query mode builds the datoms view (data + schema-as-datoms) over the
imported warehouse's gid-keyed entity tables and runs VERBATIM Datomic
query text against it — the explore_db.clj queries paste in unchanged:

    python -m mbrainz_importer_spark.cli query /tmp/wh \\
      '[:find ?attr :where [?e :db/unique] [?e :db/ident ?attr]]'

Extra CLI args bind :in params (strings).
"""

from __future__ import annotations

import json
import sys
import time


def read_manifest(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if path.endswith(".json"):
        raw = json.loads(text)
    else:
        from .edn import loads

        raw = loads(text)
    out = {}
    for k, v in raw.items():
        key = str(k).lstrip(":").replace("-", "_")
        if key == "import_order":
            v = [str(x).lstrip(":") for x in v]  # EDN keywords -> stage names
        out[key] = v
    for req in ("basedir", "warehouse"):
        if req not in out:
            raise SystemExit(f"manifest missing required key: {req}")
    return out


def warehouse_datoms(spark, warehouse: str):
    """The queryable database over an imported warehouse: datoms of
    every gid-keyed entity table (atomic columns; nested media stay in
    the relational view) unioned with the schema-as-datoms projection,
    so explore_db.clj's schema introspection works unchanged."""
    import os

    from pyspark.sql import types as T

    from .plans.eav import build_datoms, schema_datoms

    tdir = os.path.join(warehouse, "tables")
    tables = {}
    for name in sorted(os.listdir(tdir)) if os.path.isdir(tdir) else []:
        path = os.path.join(tdir, name)
        if not os.path.isdir(path):
            continue
        df = spark.read.parquet(path)
        if "gid" not in df.columns:
            continue  # link tables have composite keys; query them via refs
        atomic = [
            f.name for f in df.schema.fields
            if not isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        ]
        tables[name] = (df.select(*atomic), "gid")
    if not tables:
        raise SystemExit(f"no gid-keyed entity tables under {tdir}")
    return build_datoms(tables).unionByName(schema_datoms(spark, tables))


def query_main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(
            "usage: python -m mbrainz_importer_spark.cli query WAREHOUSE "
            "QUERY_EDN [param ...]",
            file=sys.stderr,
        )
        return 2
    warehouse, text, *params = argv

    from .plans.query_edn import q_edn
    from .session import get_spark

    spark = get_spark("mbrainz-query")
    out = q_edn(text, warehouse_datoms(spark, warehouse), *params)
    rows = out.collect()
    for r in rows:
        print("[" + " ".join(repr(v) for v in r) + "]")
    print(f";; {len(rows)} rows", file=sys.stderr)
    return 0


def curate_main(argv: list[str]) -> int:
    """`cli curate IN_PARQUET OUT_DIR [threshold]` — score a document
    corpus (hashed-linear quality + compression band), write
    `OUT_DIR/verdicts` (every doc's scores + keep flag) and
    `OUT_DIR/kept` (surviving documents). The batch face of
    streaming/quality_stream — identical scoring code."""
    if len(argv) not in (2, 3):
        print("usage: cli curate IN_PARQUET OUT_DIR [threshold]", file=sys.stderr)
        return 2
    in_path, out_dir = argv[0], argv[1]
    threshold = float(argv[2]) if len(argv) == 3 else 0.0

    from .session import get_spark
    from .streaming.quality_stream import score_batch

    spark = get_spark("curate")
    docs = spark.read.parquet(in_path)
    verdicts = score_batch(docs, threshold=threshold)
    verdicts.write.mode("overwrite").parquet(f"{out_dir}/verdicts")
    kept = docs.join(
        verdicts.where("keep").select("doc_id"), "doc_id", "left_semi"
    )
    kept.write.mode("overwrite").parquet(f"{out_dir}/kept")
    n_all = docs.count()
    n_kept = spark.read.parquet(f"{out_dir}/kept").count()
    print(f"kept {n_kept}/{n_all} documents (threshold={threshold})")
    return 0


def explain_main(argv: list[str]) -> int:
    """`cli explain WAREHOUSE QUERY_EDN [param...]` — print the
    PHYSICAL plan Catalyst chose for a verbatim Datomic query (the
    .explain("formatted") a performance reviewer asks for: broadcasts,
    exchanges, pushed filters), without executing it."""
    if len(argv) < 2:
        print("usage: cli explain WAREHOUSE QUERY_EDN [param ...]", file=sys.stderr)
        return 2
    warehouse, text, *params = argv

    from .plans.query_edn import q_edn
    from .session import get_spark

    spark = get_spark("explain")
    out = q_edn(text, warehouse_datoms(spark, warehouse), *params)
    out.explain(mode="formatted")  # prints the formatted physical plan
    return 0


def main(argv: list[str]) -> int:
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    if argv and argv[0] == "explain":
        return explain_main(argv[1:])
    if argv and argv[0] == "curate":
        return curate_main(argv[1:])
    if len(argv) != 1:
        print(
            "usage: python -m mbrainz_importer_spark.cli MANIFEST\n"
            "       python -m mbrainz_importer_spark.cli query WAREHOUSE "
            "QUERY_EDN [param ...]\n"
            "       python -m mbrainz_importer_spark.cli curate IN_PARQUET "
            "OUT_DIR [threshold]",
            file=sys.stderr,
        )
        return 2
    manifest = read_manifest(argv[0])

    from .pipeline import DEFAULT_BATCH_SIZE, Importer
    from .plans.metaschema import build_entity_tables
    from .session import get_spark

    concurrency = int(manifest.get("concurrency", 0)) or None
    spark = get_spark("mbrainz-import", shuffle_partitions=concurrency)
    importer = Importer(spark, manifest["basedir"])

    t0 = time.time()
    results = importer.run_import(
        manifest["warehouse"],
        batch_size=int(manifest.get("batch_size", DEFAULT_BATCH_SIZE)),
        import_order=manifest.get("import_order"),
    )
    for stage, res in results.items():
        print(f"{stage}: {res}")
    tables = build_entity_tables(
        spark, manifest["warehouse"], importer, f"{manifest['warehouse']}/tables"
    )
    print(f"tables: {sorted(tables)}")
    print(f"elapsed: {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
