"""CLI entry point — the analog of the reference's `-main`
(src/datomic/mbrainz/importer.clj:318-352).

    python -m mbrainz_importer_spark.cli MANIFEST

Manifest (EDN like the reference's config/manifest.edn.example, or JSON):

    {:basedir "/root/reference/subsets"
     :warehouse "/tmp/mbrainz-warehouse"
     :batch-size 100
     :concurrency 8          ; Spark shuffle/write parallelism
     :import-order [...]}    ; optional override

Idempotent; prints per-stage results and timing; exits non-zero on error.
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


def main(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: python -m mbrainz_importer_spark.cli MANIFEST", file=sys.stderr)
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
