"""IVF-style approximate nearest neighbor search (the scale path the brief
names alongside LSH).

Coarse quantization: KMeans (Spark ML, seeded => deterministic) learns
`n_cells` centroids; every corpus vector is assigned to its nearest
centroid (one narrow pass, centroids broadcast as literals). A query probes
only the `n_probe` nearest cells and re-ranks exactly within them — the
classic IVF trade: recall vs fraction of corpus scanned.

Engine-specific training makes this rows-only for the oracle gate; recall
against brute force is asserted in tests/test_llm_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine

IVF_SEED = 42


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 20,
) -> list[list[float]]:
    """Seeded KMeans over the corpus; returns centroid vectors.

    Training is SEPARABLE from querying: centroids are a statistic of
    the embedding distribution, so at production scale they are trained
    offline on a sample and shipped to `ivf_topk` as plan literals —
    query latency never includes the KMeans iterations."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=IVF_SEED, maxIter=max_iter).fit(ml_df)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def train_centroids_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> list[list[float]]:
    """Driver-side seeded KMeans (Lloyd's, numpy) on a bounded ordered
    sample — the offline-training shape production IVF uses: centroid
    fitting needs only a distribution sample, so <=sample_limit vectors
    come to the driver (a TakeOrdered, deterministic by `id_col`) and
    the corpus itself never does. Orders of magnitude cheaper than
    spinning Spark ML jobs per iteration for what is driver-scale math."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if len(X) < n_cells:
        raise ValueError(f"sample of {len(X)} vectors < n_cells={n_cells}")
    rng = np.random.RandomState(seed)
    centers = X[rng.choice(len(X), size=n_cells, replace=False)].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=-1)
        assign = d2.argmin(axis=1)
        for j in range(n_cells):
            members = X[assign == j]
            if len(members):
                centers[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in centers]


def _nearest_cells(vec_col: F.Column, centroids: list[list[float]], n: int) -> F.Column:
    """Array of the `n` nearest centroid ids (by cosine, descending)."""
    from .litexpr import lit_doubles

    sims = F.array(*[
        F.struct(
            cosine(vec_col, lit_doubles(c)).alias("sim"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    ranked = F.reverse(F.array_sort(sims))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])


def materialize_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The IVF index as STORAGE: every vector assigned to its nearest
    centroid, written cell-PARTITIONED — a probe of n cells becomes a
    partition-pruned scan of n directories instead of a corpus pass
    (the inverted-list layout every production IVF uses; same storage
    contract as the attribute-partitioned datom store). The centroids
    are written NEXT TO the lists (`_centroids.json`): they are part
    of the index, not the caller's memory — every probe and merge
    verifies the set it was handed against the stored one, so a
    stale-centroid probe of a retrained layout fails loudly instead
    of silently searching the wrong cells."""
    _assign(corpus, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    _write_centroids(path, centroids)


def _write_centroids(path: str, centroids: list[list[float]]) -> None:
    import json
    import os

    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(centroids, f)


def check_centroids(path: str, centroids: list[list[float]]) -> None:
    """Raise if `centroids` differ from the set the index at `path`
    was laid out with. Probing or merging with a foreign set is the
    silent-wrong-cells bug; a missing file (pre-discipline index) is
    accepted for compatibility."""
    import json
    import os

    meta = os.path.join(path, "_centroids.json")
    if not os.path.exists(meta):
        return
    with open(meta) as f:
        stored = json.load(f)
    if [[float(x) for x in c] for c in centroids] != stored:
        raise ValueError(
            f"centroid set does not match the index layout at {path} — "
            "after retrain_ivf_index, use the returned centroids "
            "(read them with stored_centroids())"
        )


def stored_centroids(path: str) -> list[list[float]]:
    """The centroid set the index at `path` is laid out with."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        return json.load(f)


def _assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )


def read_ivf_index(spark, path: str) -> DataFrame:
    """(nid, nv, cell) — `.where(cell.isin(...))` prunes to the probed
    lists' partition directories."""
    return spark.read.parquet(path).select("nid", "nv", "cell")


def merge_ivf_increment(
    spark,
    path: str,
    arrivals: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_moved: str = "error",
) -> None:
    """Incremental index maintenance: arrivals assign to the SAME
    persisted centroids and fold into only the cell partitions they
    land in (dynamic partition overwrite of touched cells, staged
    through disk exactly like the datom-store merge) — O(touched cells
    + increment); the index never rebuilds and untouched lists keep
    their files. Centroids are a distribution statistic: they drift
    only on a re-train cadence (`retrain_ivf_index` is the repair).
    Re-merging the same arrivals is a no-op on content, so redelivered
    increments are safe.

    The arrivals-are-NEW contract is ENFORCED, not assumed: an id
    re-asserted with a vector that lands in a DIFFERENT cell would
    leave its old row live in the untouched cell — the silent
    cross-cell duplicate. A column-pruned (nid + partition value only)
    probe of the index detects moved ids; `on_moved="error"` (default)
    raises so the caller routes updates through delete + re-add,
    `on_moved="tombstone"` widens the touched-cell set to the moved
    ids' OLD cells and drops their stale rows in the same rewrite.
    Within every touched cell the arrival's row wins per id (old rows
    anti-joined out), so a same-cell re-assert is an update, not a
    max-struct coin toss."""
    if on_moved not in ("error", "tombstone"):
        raise ValueError(f"on_moved must be 'error' or 'tombstone', got {on_moved!r}")
    check_centroids(path, centroids)
    fresh = (
        _assign(arrivals, centroids, id_col, vec_col)
        .groupBy("nid")  # an increment may carry an id twice; one survives
        .agg(F.max(F.struct("cell", "nv")).alias("w"))
        .select("nid", F.col("w.nv").alias("nv"), F.col("w.cell").alias("cell"))
    )
    _merge_fresh_into_cells(
        spark, path, fresh, ("nid", "nv", "cell"), on_moved, "merge_ivf_increment"
    )


def _merge_fresh_into_cells(
    spark,
    path: str,
    fresh: DataFrame,
    columns: tuple,
    on_moved: str,
    caller: str,
) -> None:
    """The shared touched-cells merge core (plain IVF and IVF×PQ faces):
    moved-id guard, arrival-wins anti-join, WRITE-ONCE commit of exactly
    the touched cell partitions.

    r13: the merged rows write ONCE into a cell-partitioned staging
    directory and the staged cell directories swap into the index root
    by rename (the datom store's write-once merge machinery,
    plans/eav.py:_swap_staged_partitions, generalized over the
    partition column) — the previous design staged the rows flat and
    rewrote them through a dynamic partition overwrite, a second full
    write pass plus a read-back over the touched mass every merge.
    Crash contract identical to the datom store: a mid-stage death
    leaves the index untouched (the partial stage drops on the next
    merge's entry); a mid-swap death is healed by the manifest here on
    entry."""
    from ..plans.eav import (
        _drop_stage,
        _stage_root,
        _swap_staged_partitions,
        resume_merge_swap,
    )

    stage = _stage_root(path)
    if resume_merge_swap(path, stage):
        spark.catalog.refreshByPath(path)
    _drop_stage(path)

    # Materialize the increment ONCE: the three consumers below (the
    # touched/moved probe and the staged write) each re-evaluated the
    # assignment expression otherwise — for the IVF faces that is the
    # n_cells-cosine codegen tree (or the Arrow PQ-encode pass) run
    # 3x per merge over the same arrival rows (guide §1.2: per-task
    # work — don't compute things twice). The increment is
    # O(arrivals), bounded by contract.
    fresh = fresh.localCheckpoint()
    # the checkpoint leaves fresh a stats-less LogicalRDD, so every
    # join below pins it as the broadcast side EXPLICITLY — it is
    # O(increment) by contract, and without the hint Catalyst's
    # default-size estimate would shuffle (or worse, broadcast) the
    # corpus-scale index side instead
    # one aggregation yields the touched-cell set AND the increment
    # size (n_fresh feeds the redelivery probe below — no separate
    # count job)
    cell_counts = fresh.groupBy("cell").count().collect()
    touched = sorted(r["cell"] for r in cell_counts)
    n_fresh = sum(r["count"] for r in cell_counts)
    if not touched:
        return
    # cross-cell guard: nid comes from the parquet id column, cell from
    # the partition directory — the scan reads one column of the index.
    # The same probe counts how many arrival ids are already indexed
    # ANYWHERE (n_hit) — the redelivery signal the content no-op check
    # below keys on.
    idx_cells = spark.read.parquet(path).select(
        "nid", F.col("cell").alias("old_cell")
    )
    hit = (
        F.broadcast(fresh.select("nid", "cell"))
        .join(idx_cells, "nid")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.collect_set(
                F.when(
                    F.col("old_cell") != F.col("cell"), F.col("old_cell")
                )
            ).alias("moved"),
        )
        .collect()[0]
    )
    n_hit, moved_cells = hit["n_hit"], sorted(hit["moved"])
    if moved_cells and on_moved == "error":
        raise ValueError(
            f"{caller}: arrival ids already indexed in other "
            f"cells {moved_cells} — a moved vector would duplicate "
            "across cells. Re-merge with on_moved='tombstone' or route "
            "updates through delete + re-add."
        )
    touched = sorted(set(touched) | set(moved_cells))
    existing = spark.read.parquet(path).select(*columns).where(
        F.col("cell").isin(touched)
    )
    # content no-op probe (the fulltext merge's redelivery discipline,
    # applied here): when nothing moved and EVERY arrival id is already
    # indexed (n_hit == n_fresh — known from the guard probe, so a
    # genuine merge with any new id skips this entirely and pays
    # nothing extra), compare payloads over the touched cells; if every
    # arrival row exists identically, the merged content equals the
    # existing content and the touched-cell rewrite + swap would
    # re-write every byte for nothing — the dominant cost of a
    # redelivered increment at any tier. Any difference (same-cell
    # update) falls through to the write path unchanged.
    if not moved_cells and n_hit == n_fresh:
        others = [c for c in columns if c not in ("nid",)]
        f_ren = fresh.select(
            "nid", *[F.col(c).alias(f"__f_{c}") for c in others]
        )
        same = existing.join(F.broadcast(f_ren), "nid")
        for c in others:
            same = same.where(F.expr(f"{c} <=> __f_{c}"))
        if same.count() == n_fresh:
            return
    merged = existing.join(
        F.broadcast(fresh.select("nid")), "nid", "left_anti"
    ).unionByName(fresh)
    merged.select(*columns).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(stage)
    _swap_staged_partitions(
        stage, path, [str(c) for c in touched], col="cell"
    )
    _drop_stage(path)
    spark.catalog.refreshByPath(path)


def merge_ivf_pq_increment(
    spark,
    path: str,
    arrivals: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_moved: str = "error",
) -> None:
    """Incremental maintenance for the IVF×PQ index — the same contract
    as `merge_ivf_increment` (arrivals fold into only their cells,
    redelivery-safe, moved-id guard with error/tombstone), with the
    arrival pass ALSO encoding PQ codes through the arrow bulk kernel.
    Centroids and codebooks must both match the stored metadata: an
    increment encoded against foreign codebooks would poison the ADC
    scores of just the touched cells — the hardest bug to see, which
    is why the check runs before any write."""
    if on_moved not in ("error", "tombstone"):
        raise ValueError(f"on_moved must be 'error' or 'tombstone', got {on_moved!r}")
    check_centroids(path, centroids)
    check_codebooks(path, codebooks)
    fresh = (
        _assign_pq_arrow(arrivals, centroids, codebooks, dim, id_col, vec_col)
        .groupBy("nid")  # an increment may carry an id twice; one survives
        .agg(F.max(F.struct("cell", "nv", "codes")).alias("w"))
        .select(
            "nid",
            F.col("w.nv").alias("nv"),
            F.col("w.codes").alias("codes"),
            F.col("w.cell").alias("cell"),
        )
    )
    _merge_fresh_into_cells(
        spark, path, fresh, ("nid", "nv", "codes", "cell"), on_moved,
        "merge_ivf_pq_increment",
    )


def retrain_ivf_index(
    spark,
    path: str,
    n_cells: int = 16,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> list[list[float]]:
    """Centroid-drift repair — the re-train cadence as an operator:
    fit fresh centroids from a bounded ordered sample of the CURRENT
    index contents (driver-side Lloyd's, the train_centroids_sample
    shape — the corpus never collects) and re-materialize every
    inverted list under them. A retrain touches every cell by
    definition, so this is the one full rewrite in the IVF lifecycle
    (the compaction analog); it stages through disk so the writer
    never scans the partitions it replaces. Returns the new centroids
    — the caller must use them for every subsequent probe and merge
    (probing with the stale set against the new layout is the bug this
    operator exists to prevent; the recall cost of NOT retraining is
    measured in tests/test_ivf_index.py on a drifted corpus)."""
    from ..plans.eav import _drop_stage, _stage_merge

    vecs = read_ivf_index(spark, path).select(
        F.col("nid").alias("vec_id"), F.col("nv").alias("embedding")
    )
    cents = train_centroids_sample(
        vecs, "vec_id", "embedding",
        n_cells=n_cells, max_iter=max_iter,
        sample_limit=sample_limit, seed=seed,
    )
    assigned = _assign(vecs, cents, "vec_id", "embedding")
    staged = _stage_merge(spark, assigned, path, columns=("nid", "nv", "cell"))
    staged.write.mode("overwrite").partitionBy("cell").parquet(path)
    _drop_stage(path)
    # the static overwrite cleared the directory — the new layout's
    # centroids ARE the index metadata, written last so a crash
    # between the two writes reads as a pre-discipline index (no
    # check) rather than certifying the WRONG set
    _write_centroids(path, cents)
    return cents


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k per query over the MATERIALIZED index: the bounded query
    set's probed cells collect driver-side (|queries| x n_probe ids —
    the interactive-search contract, similarity.py's bounded-queries
    shape) and become a partition filter, so the scan reads exactly the
    probed lists' directories. Ranking identical to `ivf_topk`."""
    check_centroids(path, centroids)
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    index = read_ivf_index(spark, path).where(F.col("cell").isin(cells))
    sim = F.round(cosine(F.col("qv"), F.col("nv")), 6)
    pairs = (
        probes.join(index, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("cos_sim"))
        .groupBy("qid", "nid")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivf_topk_from_index_arrow(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """The Arrow/BLAS face of `ivf_topk_from_index` — same partition-
    pruned read of the probed cells, same (rounded) scores, same
    deterministic ranking, but pair scoring is one matmul per Arrow
    batch instead of an interpreted higher-order fold (the expression
    `cosine` never enters whole-stage codegen; the sf10 tier measured
    the difference). The bounded query set collects once; each corpus
    batch scores only the queries that probe its rows' cells (per-cell
    masking), so partial-probe cost stays proportional to probed
    lists. Cell RANKING for partial probes happens in numpy — sim ties
    across cells may probe a different cell than the expression face
    (irrelevant in exhaustive mode, approximate-contract otherwise)."""
    import numpy as np
    import pandas as pd

    check_centroids(path, centroids)
    rows = queries.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("ivf_topk_from_index_arrow needs a non-empty query set")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    C = np.array(centroids, dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    sims_qc = (Q @ C.T) / np.outer(qn, cn)
    # per query: n_probe best cells (sim desc, cell asc tie-break)
    order = np.lexsort((np.arange(C.shape[0])[None, :].repeat(len(Q), 0),
                        -sims_qc))
    probed = order[:, :n_probe]
    cell_to_q = {}
    for qi, cells in enumerate(probed):
        for c in cells:
            cell_to_q.setdefault(int(c), []).append(qi)
    all_cells = sorted(cell_to_q)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["nv"].to_numpy()).astype(np.float64, copy=False)
            nid = pdf["nid"].to_numpy(dtype=np.int64)
            mn = np.sqrt((M * M).sum(axis=1))
            cells = pdf["cell"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for c in np.unique(cells):
                qsel = cell_to_q.get(int(c))
                if not qsel:
                    continue
                mask = cells == c
                sims = np.round(
                    (M[mask] @ Q[qsel].T) / np.outer(mn[mask], qn[qsel]), 6
                )
                b, nq = sims.shape
                out_q.append(np.tile(qids[qsel], b))
                out_n.append(np.repeat(nid[mask], nq))
                out_s.append(sims.ravel())
            if out_q:
                yield pd.DataFrame({
                    "qid": np.concatenate(out_q),
                    "nid": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_s),
                })

    index = read_ivf_index(spark, path).where(F.col("cell").isin(all_cells))
    pairs = (
        index.mapInPandas(score, schema="qid long, nid long, cos_sim double")
        .where(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF × PQ: cell-partitioned inverted lists of PQ codes (the FAISS
# "IVFx,PQy" composition — coarse cells bound the scan, product codes
# bound the bytes scored, exact re-rank bounds the vectors read)
# ---------------------------------------------------------------------------


def _write_codebooks(path: str, codebooks: list[list[list[float]]]) -> None:
    import json
    import os

    with open(os.path.join(path, "_codebooks.json"), "w") as f:
        json.dump(codebooks, f)


def stored_codebooks(path: str) -> list[list[list[float]]]:
    """The PQ codebooks the index at `path` was encoded with."""
    import json
    import os

    with open(os.path.join(path, "_codebooks.json")) as f:
        return json.load(f)


def check_codebooks(path: str, codebooks: list[list[list[float]]]) -> None:
    """Raise if `codebooks` differ from the set the index at `path` was
    encoded with — ADC against foreign codebooks is the silent-wrong-
    scores bug (the codes are meaningless without their tables). Same
    contract as `check_centroids`; a missing file is accepted."""
    import json
    import os

    meta = os.path.join(path, "_codebooks.json")
    if not os.path.exists(meta):
        return
    with open(meta) as f:
        stored = json.load(f)
    want = [[[float(x) for x in c] for c in book] for book in codebooks]
    if want != stored:
        raise ValueError(
            f"PQ codebooks do not match the index layout at {path} — "
            "read the stored set back with stored_codebooks()"
        )


def _assign_pq_arrow(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow face of the IVF×PQ assignment projection: cell by cosine
    argmax, per-subspace code by L2 argmin, one numpy pass per batch —
    the bulk-build path (the expression face's m*k-literal encode blob
    measured 554s for the 2M-vector sf100 build; this face exists for
    exactly that). argmin/argmax take the LOWEST index on exact float
    ties, where the expression face's reversed array_sort takes the
    highest CELL — same caveat as ivf_topk_from_index_arrow, irrelevant
    off exact ties (content equality on tie-free corpora is pinned in
    tests)."""
    import numpy as np
    import pandas as pd

    C = np.array(centroids, dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = dim // m
    cn = np.sqrt((C * C).sum(axis=1))
    vtype = corpus.schema[vec_col].dataType.simpleString()

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            xn = np.sqrt((X * X).sum(axis=1))
            if (xn == 0).any():
                bad = pdf[id_col].to_numpy()[xn == 0][:5].tolist()
                raise ValueError(
                    "zero-norm vector(s) cannot be cell-assigned by "
                    f"cosine (ids {bad}) — NaN cosines would silently "
                    "land in cell 0, diverging from the expression face"
                )
            cell = ((X @ C.T) / np.outer(xn, cn)).argmax(axis=1)
            codes = np.empty((len(X), m), dtype=np.int64)
            for i in range(m):
                S = X[:, i * sub : (i + 1) * sub]
                d2 = ((S[:, None, :] - books[i][None, :, :]) ** 2).sum(axis=-1)
                codes[:, i] = d2.argmin(axis=1)
            yield pd.DataFrame({
                "nid": pdf[id_col].to_numpy(dtype=np.int64),
                "nv": pdf[vec_col],
                "codes": list(codes),
                "cell": cell,
            })

    return corpus.mapInPandas(
        enc, schema=f"nid long, nv {vtype}, codes array<int>, cell int"
    )


def materialize_ivf_pq_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode: str = "arrow",
) -> None:
    """The IVF×PQ index as STORAGE: one narrow pass assigns each vector
    to its nearest coarse cell AND encodes its PQ code (both centroid
    tables travel as plan literals — no join, no second scan), written
    cell-partitioned as (nid, nv, codes). The ADC candidate pass later
    reads only (nid, codes) of the probed cells — m ints per vector
    instead of dim floats, the 16-64x residency cut that makes a 100 TB
    corpus probe memory-resident — and the exact re-rank reads `nv`
    for the few surviving candidates. Centroids and codebooks are index
    metadata (written LAST, like `_centroids.json`): probing with a
    foreign set fails loudly.

    encode="arrow" (default) encodes through `_assign_pq_arrow`, the
    bulk-build kernel — the expression face's m*k-literal encode blob
    measured 554s for the 2M-vector sf100 build, the arrow kernel is
    the production path; encode="expr" keeps the pure-expression face
    (the certified twin — content equality pinned in tests, and the
    exact-regime oracle gate runs the arrow default)."""
    if encode == "arrow":
        assigned = _assign_pq_arrow(
            corpus, centroids, codebooks, dim, id_col, vec_col
        )
    elif encode == "expr":
        from .quantize import pq_codes

        assigned = corpus.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nv"),
            pq_codes(F.col(vec_col), dim, codebooks).alias("codes"),
            _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        )
    else:
        raise ValueError(f"encode must be 'arrow' or 'expr', got {encode!r}")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    _write_centroids(path, centroids)
    _write_codebooks(path, codebooks)


def retrain_ivf_pq_index(
    spark,
    path: str,
    dim: int,
    n_cells: int = 16,
    m: int = 16,
    k: int = 64,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Drift repair for the IVF×PQ index — the PQ twin of
    `retrain_ivf_index`: refit centroids AND codebooks from a bounded
    ordered sample of the index contents (driver-side Lloyd's; the
    corpus never collects), re-encode and re-materialize every cell
    through the arrow bulk kernel, staged through disk. The static
    overwrite clears the metadata files with the old layout; the new
    codebooks and centroids write LAST, so a crash mid-rewrite degrades
    to the unchecked (pre-discipline) state — it can never certify a
    foreign set against the new layout. Returns (centroids, codebooks):
    the caller must probe and merge with BOTH returned sets (a stale
    pair raises via the metadata checks)."""
    from ..plans.eav import _drop_stage, _stage_merge
    from .quantize import train_pq_codebooks

    vecs = spark.read.parquet(path).select(
        F.col("nid").alias("vec_id"), F.col("nv").alias("embedding")
    )
    cents = train_centroids_sample(
        vecs, "vec_id", "embedding",
        n_cells=n_cells, max_iter=max_iter,
        sample_limit=sample_limit, seed=seed,
    )
    books = train_pq_codebooks(
        vecs, "vec_id", "embedding", dim, m=m, k=k,
        sample_limit=sample_limit, max_iter=max_iter, seed=seed,
    )
    assigned = _assign_pq_arrow(vecs, cents, books, dim, "vec_id", "embedding")
    staged = _stage_merge(
        spark, assigned, path, columns=("nid", "nv", "codes", "cell")
    )
    staged.write.mode("overwrite").partitionBy("cell").parquet(path)
    _drop_stage(path)
    _write_codebooks(path, books)
    _write_centroids(path, cents)
    return cents, books


def ivf_pq_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
    rerank: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """Top-k per query over the materialized IVF×PQ index — the
    production ANN serving plan end to end:

    1. coarse probe: each query's n_probe nearest cells become a
       partition filter (the bounded-queries contract — |Q| x n_probe
       cell ids collect, the corpus never does);
    2. ADC candidate generation: asymmetric-distance inner product of
       the unquantized query against the PROBED CELLS' CODES — a
       column-pruned scan reading m ints per vector (`nv` never
       transfers here), scored entirely in whole-stage codegen;
    3. exact re-rank: only the rerank*k best ADC candidates per query
       join back for full-precision scoring on `nv`.

    metric="cosine" re-ranks by cosine (rounded 6dp, the sim_* gate
    convention); metric="ip" by inner product rounded to bigint `dot_q`
    (the quantize-gate convention — with lossless codebooks ADC equals
    the exact integer dot, which is what lets the whole path
    hash-certify against an oracle that has never heard of PQ or IVF).
    Candidate selection is approximate in the lossy regime by contract;
    recall is pinned in tests/test_ivf_index.py."""
    if metric not in ("cosine", "ip"):
        raise ValueError(f"metric must be 'cosine' or 'ip', got {metric!r}")
    from .quantize import pq_adc_ip, pq_recon_norm

    check_centroids(path, centroids)
    check_codebooks(path, codebooks)
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    # ADC pass: (nid, codes) only — parquet column pruning keeps nv on disk.
    # cosine candidates rank by ip/recon_norm (the query norm is constant
    # per query); ip candidates by raw ADC
    coded = spark.read.parquet(path).where(F.col("cell").isin(cells)).select(
        "nid", "codes", "cell"
    )
    adc_score = pq_adc_ip(F.col("qv"), F.col("codes"), dim, codebooks)
    if metric == "cosine":
        adc_score = adc_score / pq_recon_norm(F.col("codes"), codebooks)
    adc = (
        probes.join(coded, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", adc_score.alias("adc"))
    )
    w_adc = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("nid"))
    cands = (
        adc.withColumn("arank", F.row_number().over(w_adc))
        .where(F.col("arank") <= rerank * k)
        .select("qid", "nid")
    )
    # re-rank pass: full vectors of the survivors only (|Q| * rerank*k
    # rows — broadcastable by construction)
    return _ivf_pq_rerank(spark, path, cells, cands, queries, id_col, vec_col, metric, k)


def _pq_adc_scores_arrow(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str,
    vec_col: str,
    n_probe: int,
    want_cos: bool,
):
    """The shared Arrow/LUT ADC candidate kernel (FAISS's per-query
    lookup tables): collect the bounded query set, pick each query's
    n_probe nearest coarse cells, and score every code of the probed
    cells by m table lookups per Arrow batch — reading (nid, codes,
    cell) ONLY. Returns (adc DataFrame[qid, nid, adc], qids, query
    norms, probed cell ids); callers rank/cut the ADC stream their own
    way (exact nv re-rank, ADC-only serving, SQ8 refine)."""
    import numpy as np
    import pandas as pd

    rows = queries.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("the PQ index probe needs a non-empty query set")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    C = np.array(centroids, dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    sims_qc = (Q @ C.T) / np.outer(qn, cn)
    order = np.lexsort(
        (np.arange(C.shape[0])[None, :].repeat(len(Q), 0), -sims_qc)
    )
    probed = order[:, :n_probe]
    cell_to_q: dict[int, list[int]] = {}
    for qi, cs in enumerate(probed):
        for c in cs:
            cell_to_q.setdefault(int(c), []).append(qi)
    all_cells = sorted(cell_to_q)
    m = len(codebooks)
    sub = dim // m
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    # per (query, subspace) inner-product LUT; per-centroid squared norms
    luts = [Q[:, i * sub : (i + 1) * sub] @ books[i].T for i in range(m)]
    n2s = [(b * b).sum(axis=1) for b in books]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64, copy=False)
            nid = pdf["nid"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy()
            rnorm = None
            if want_cos:
                rnorm = np.sqrt(
                    sum(n2s[i][codes[:, i]] for i in range(m))
                )
            out_q, out_n, out_s = [], [], []
            for c in np.unique(cells):
                qsel = cell_to_q.get(int(c))
                if not qsel:
                    continue
                mask = cells == c
                # (rows_in_cell, |qsel|) ADC inner products via LUTs
                adc = sum(luts[i][qsel][:, codes[mask, i]] for i in range(m)).T
                if want_cos:
                    adc = adc / rnorm[mask][:, None]
                b, nq = adc.shape
                out_q.append(np.tile(qids[qsel], b))
                out_n.append(np.repeat(nid[mask], nq))
                out_s.append(adc.ravel())
            if out_q:
                yield pd.DataFrame({
                    "qid": np.concatenate(out_q),
                    "nid": np.concatenate(out_n),
                    "adc": np.concatenate(out_s),
                })

    coded = spark.read.parquet(path).where(F.col("cell").isin(all_cells)).select(
        "nid", "codes", "cell"
    )
    adc = coded.mapInPandas(
        score, schema="qid long, nid long, adc double"
    ).where(F.col("qid") != F.col("nid"))
    return adc, qids, qn, all_cells


def ivf_pq_topk_from_index_arrow(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
    rerank: int = 4,
    metric: str = "cosine",
) -> DataFrame:
    """The Arrow/LUT face of `ivf_pq_topk_from_index` — the ADC
    candidate pass as FAISS actually computes it: per (query, subspace)
    a k-entry lookup table (one small matmul, lut_i = book_i @ q_sub_i)
    built ONCE per bounded query set, then every corpus code scores by
    m table lookups (numpy fancy indexing per Arrow batch). This
    replaces the m*k-literal codegen blob of the expression face —
    whose plan COMPILE time, not its runtime, dominates at large m*k
    (4.4 MiB task binaries at m=16/k=64) — while reading the same
    column-pruned (nid, codes) of the probed cells. Re-rank is the same
    JVM-side exact pass on the survivors' full vectors, so final scores
    are identical to the expression face (pinned in tests); candidate
    sets can differ only on float ties at the rerank cutoff."""
    if metric not in ("cosine", "ip"):
        raise ValueError(f"metric must be 'cosine' or 'ip', got {metric!r}")
    check_centroids(path, centroids)
    check_codebooks(path, codebooks)
    adc, qids, qn, all_cells = _pq_adc_scores_arrow(
        spark, path, queries, centroids, codebooks, dim,
        id_col, vec_col, n_probe, want_cos=(metric == "cosine"),
    )
    want_cos = metric == "cosine"
    w_adc = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("nid"))
    if rerank == 0:
        # ADC-ONLY serving (FAISS's no-refine mode): rank by the
        # quantized score and never touch `nv` — the probe's END-TO-END
        # fetch is the codes column alone (the §24 cut as wall time; the
        # exact re-rank's point-reads otherwise pull whole nv chunks of
        # the probed cells, measured 205 MB vs 11.6 at sf100 geometry —
        # PLAN_NOTES_r10). Scores are reconstruction-normalized ADC
        # (plus query-norm for cosine — comparable across queries),
        # NOT exact: §15/§22 measured ADC candidate recall at the plain
        # IVF cell-pruning ceiling for these settings, so the ranks
        # this mode serves are the ones rerank would read vectors to
        # re-score.
        # query norms as a bounded literal map (|Q| entries — the
        # interactive contract), JVM-side; no UDF in the hot path
        qn_map = F.create_map(
            *[x for q, n in zip(qids, qn) for x in (F.lit(int(q)), F.lit(float(n)))]
        )
        score_col = (
            F.round(F.col("adc") / qn_map[F.col("qid")], 6)
            if want_cos
            else F.round("adc").cast("bigint")
        )
        name = "adc_sim" if want_cos else "adc_dot"
        return (
            adc.withColumn("rank", F.row_number().over(w_adc).cast("bigint"))
            .where(F.col("rank") <= k)
            .select("qid", "nid", score_col.alias(name), "rank")
        )
    cands = (
        adc.withColumn("arank", F.row_number().over(w_adc))
        .where(F.col("arank") <= rerank * k)
        .select("qid", "nid")
    )
    return _ivf_pq_rerank(spark, path, all_cells, cands, queries, id_col, vec_col, metric, k)


def _ivf_pq_rerank(
    spark,
    path: str,
    cells: list,
    cands: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    metric: str,
    k: int,
) -> DataFrame:
    """Shared exact re-rank: the |Q| * rerank*k ADC survivors join back
    to the probed cells' full vectors (broadcast both small sides) and
    rank by full-precision score."""
    from .similarity import cosine, dot

    vecs = spark.read.parquet(path).where(F.col("cell").isin(cells)).select(
        "nid", "nv"
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    pairs = vecs.join(F.broadcast(cands), "nid").join(F.broadcast(qv), "qid")
    if metric == "cosine":
        scored = pairs.select(
            "qid", "nid", F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim")
        )
        order = [F.desc("cos_sim"), F.asc("nid")]
    else:
        scored = pairs.select(
            "qid", "nid",
            F.round(dot(F.col("qv"), F.col("nv"))).cast("bigint").alias("dot_q"),
        )
        order = [F.desc("dot_q"), F.asc("nid")]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF×SQ8 — the scalar-quantized in-index code (r9 verdict #4)
# ---------------------------------------------------------------------------


def _write_sq8_bounds(path: str, lo: list[float], hi: list[float]) -> None:
    import json
    import os

    with open(os.path.join(path, "_sq8_bounds.json"), "w") as f:
        json.dump({"lo": lo, "hi": hi}, f)


def stored_sq8_bounds(path: str) -> tuple[list[float], list[float]]:
    """The per-dim grid bounds the index at `path` was encoded with."""
    import json
    import os

    with open(os.path.join(path, "_sq8_bounds.json")) as f:
        b = json.load(f)
    return b["lo"], b["hi"]


def check_sq8_bounds(path: str, lo: list[float], hi: list[float]) -> None:
    """Raise if the grid bounds differ from the index's stored set —
    integer dots of codes from two different grids are meaningless
    (the SQ8 twin of check_codebooks); a missing file is accepted."""
    import json
    import os

    meta = os.path.join(path, "_sq8_bounds.json")
    if not os.path.exists(meta):
        return
    with open(meta) as f:
        stored = json.load(f)
    want = {"lo": [float(x) for x in lo], "hi": [float(x) for x in hi]}
    if want != stored:
        raise ValueError(
            f"SQ8 bounds do not match the index layout at {path} — "
            "read the stored grid back with stored_sq8_bounds()"
        )


def materialize_ivf_sq8_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    lo: list[float],
    hi: list[float],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The IVF×SQ8 index: same storage contract as the PQ face —
    (nid, nv, codes) cell-partitioned in one narrow pass, metadata
    (centroids + grid bounds) written LAST — with int8 scalar codes
    instead of product codes: 4x residency cut vs PQ's 16-64x, but
    ZERO training (the grid is a closed-form per-dim min/max) and the
    code dot is EXACTLY recomputable in SQL, so the oracle gate
    certifies the whole corpus — no lossless-regime subset needed
    (faiss "IVFx,SQ8"; sq8 encode is a pure column expression, so the
    build needs no Arrow kernel either)."""
    from .quantize import sq8_code

    assigned = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        sq8_code(F.col(vec_col), lo, hi).alias("codes"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    _write_centroids(path, centroids)
    _write_sq8_bounds(path, lo, hi)


def ivf_sq8_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Quantized inner-product top-k over the materialized IVF×SQ8
    index: queries encode on the stored grid, the probe prunes to
    n_probe cell directories and reads (nid, codes) ONLY — the 4x
    column cut, `nv` stays on disk — and ranks by the exact integer
    dot (dot_q DESC, nid ASC), the sq8_ip_topk contract served from
    storage. With n_probe = n_cells the result equals the Flat,SQ8
    scan over the whole corpus, which is what the oracle recomputes."""
    from .quantize import int_dot, sq8_code

    check_centroids(path, centroids)
    check_sq8_bounds(path, lo, hi)
    probes = queries.select(
        F.col(id_col).alias("qid"),
        sq8_code(F.col(vec_col), lo, hi).alias("qc"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    index = spark.read.parquet(path).select("nid", "codes", "cell").where(
        F.col("cell").isin(cells)
    )
    pairs = (
        probes.join(index, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", int_dot(F.col("qc"), F.col("codes")).alias("dot_q"))
        .groupBy("qid", "nid")
        .agg(F.max("dot_q").alias("dot_q"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot_q"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def ivf_sq8_topk_from_index_arrow(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """The Arrow face of `ivf_sq8_topk_from_index` — same partition-
    pruned codes-only read, same exact integer ranking, scored as one
    int64 matmul per Arrow batch instead of an interpreted 64-element
    zip_with fold per (query, row) pair (measured: the expression face
    spends 48.5s on the sf10 exhaustive certification scan; integer
    arithmetic has no rounding faces to diverge, so this face is
    bit-equal by construction — query encoding emulates Spark's
    HALF_UP round on the same double-precision grid arithmetic).
    Contract pinned equal to the expression face in tests."""
    import numpy as np
    import pandas as pd

    from .quantize import SQ_LEVELS

    check_centroids(path, centroids)
    check_sq8_bounds(path, lo, hi)
    rows = queries.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("ivf_sq8_topk_from_index_arrow needs a non-empty query set")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    # encode on the stored grid exactly as quantize.sq8_code does:
    # (x - lo) * (255 / (hi - lo)) in double, HALF_UP, clamped; a
    # degenerate dim codes to 0
    lo_a = np.array(lo, dtype=np.float64)
    scale = np.array(
        [0.0 if h == l else SQ_LEVELS / (h - l) for l, h in zip(lo, hi)],
        dtype=np.float64,
    )
    scaled = (Q - lo_a) * scale
    qc = np.clip(np.floor(scaled + 0.5), 0, SQ_LEVELS).astype(np.int64)
    C = np.array(centroids, dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    order = np.lexsort(
        (np.arange(C.shape[0])[None, :].repeat(len(Q), 0),
         -(Q @ C.T) / np.outer(qn, cn))
    )
    cell_to_q: dict[int, list[int]] = {}
    for qi, cs in enumerate(order[:, :n_probe]):
        for c in cs:
            cell_to_q.setdefault(int(c), []).append(qi)
    all_cells = sorted(cell_to_q)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64, copy=False)
            nid = pdf["nid"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for c in np.unique(cells):
                qsel = cell_to_q.get(int(c))
                if not qsel:
                    continue
                mask = cells == c
                dots = codes[mask] @ qc[qsel].T  # exact int64
                b, nq = dots.shape
                # row-major ravel pairs with tile(qids)/repeat(nid):
                # (n0,q0),(n0,q1),... — a transpose here shuffles scores
                # across pairs (caught by the 64-d faces-equal test; the
                # hand corpus's per-cell rankings are query-invariant,
                # which hid it)
                out_q.append(np.tile(qids[qsel], b))
                out_n.append(np.repeat(nid[mask], nq))
                out_s.append(dots.ravel())
            if out_q:
                yield pd.DataFrame({
                    "qid": np.concatenate(out_q),
                    "nid": np.concatenate(out_n),
                    "dot_q": np.concatenate(out_s),
                })

    coded = spark.read.parquet(path).select("nid", "codes", "cell").where(
        F.col("cell").isin(all_cells)
    )
    scored = coded.mapInPandas(
        score, schema="qid long, nid long, dot_q long"
    ).where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.desc("dot_q"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def merge_ivf_sq8_increment(
    spark,
    path: str,
    arrivals: DataFrame,
    centroids: list[list[float]],
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_moved: str = "error",
) -> None:
    """Incremental maintenance for the IVF×SQ8 index — the exact
    contract of `merge_ivf_pq_increment` (touched cells only,
    redelivery-safe, moved-id guard) through the shared
    `_merge_fresh_into_cells` core, with the arrival pass encoding on
    the STORED grid (an increment encoded against foreign bounds would
    poison the integer dots of the touched cells — checked before any
    write)."""
    from .quantize import sq8_code

    if on_moved not in ("error", "tombstone"):
        raise ValueError(f"on_moved must be 'error' or 'tombstone', got {on_moved!r}")
    check_centroids(path, centroids)
    check_sq8_bounds(path, lo, hi)
    fresh = (
        arrivals.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nv"),
            sq8_code(F.col(vec_col), lo, hi).alias("codes"),
            _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        )
        .groupBy("nid")  # an increment may carry an id twice; one survives
        .agg(F.max(F.struct("cell", "nv", "codes")).alias("w"))
        .select(
            "nid",
            F.col("w.nv").alias("nv"),
            F.col("w.codes").alias("codes"),
            F.col("w.cell").alias("cell"),
        )
    )
    _merge_fresh_into_cells(
        spark, path, fresh, ("nid", "nv", "codes", "cell"), on_moved,
        "merge_ivf_sq8_increment",
    )


def retrain_ivf_sq8_index(
    spark,
    path: str,
    dim: int,
    n_cells: int = 16,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> tuple[list[list[float]], list[float], list[float]]:
    """Drift repair for the IVF×SQ8 index: refit centroids from a
    bounded ordered sample (the corpus never collects) and the grid
    bounds from the FULL index contents (sq8_train_bounds is one exact
    min/max aggregation — no sampling error in the artifact that
    decides code values), then re-encode and re-materialize every cell
    staged through disk, metadata written LAST. Returns
    (centroids, lo, hi): probe and merge with the returned set — the
    stale grid raises via check_sq8_bounds."""
    from ..plans.eav import _drop_stage, _stage_merge
    from .quantize import sq8_code, sq8_train_bounds

    vecs = spark.read.parquet(path).select(
        F.col("nid").alias("vec_id"), F.col("nv").alias("embedding")
    )
    cents = train_centroids_sample(
        vecs, "vec_id", "embedding",
        n_cells=n_cells, max_iter=max_iter,
        sample_limit=sample_limit, seed=seed,
    )
    lo, hi = sq8_train_bounds(vecs, "embedding", dim)
    assigned = vecs.select(
        F.col("vec_id").alias("nid"),
        F.col("embedding").alias("nv"),
        sq8_code(F.col("embedding"), lo, hi).alias("codes"),
        _nearest_cells(F.col("embedding"), cents, 1)[0].alias("cell"),
    )
    staged = _stage_merge(
        spark, assigned, path, columns=("nid", "nv", "codes", "cell")
    )
    staged.write.mode("overwrite").partitionBy("cell").parquet(path)
    _drop_stage(path)
    _write_sq8_bounds(path, lo, hi)
    _write_centroids(path, cents)
    return cents, lo, hi


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k per query, scanning only the n_probe nearest cells.
    The corpus-side assignment is a narrow map (centroid literals travel
    with the plan); the probe join is an equi-join on cell id — shuffle
    proportional to probed cells, not the whole corpus."""
    assign = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, n_probe)).alias("cell"),
    )
    sim = F.round(cosine(F.col("qv"), F.col("nv")), 6)
    pairs = (
        probes.join(assign, "cell")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("cos_sim"))
        .groupBy("qid", "nid")
        .agg(F.max("cos_sim").alias("cos_sim"))  # dedupe multi-probe hits
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF×PQ + SQ8 refine — the two-stage quantized serving stack (r10).
#
# The I/O-pressure A/B (PLAN_NOTES_r10.md §8) measured the uncomfortable
# half of the §24 fetch-bytes story: the exact re-rank's point-reads pull
# the probed cells' WHOLE nv column chunks (205 MB at sf100 geometry —
# parity with plain IVF), because scattered survivor ids can't prune
# single-row-group cell files. This tier removes nv from the probe path
# entirely: PQ codes generate candidates (ADC LUTs, m ints/vector), and a
# second, finer quantizer — SQ8, dim bytes/vector, exactly recomputable
# in SQL — re-scores the survivors. FAISS ships the same shape as a
# refine index (IndexRefine over IVFPQ with a scalar-quantized refiner);
# the reference's analog is serving reads from a compact covering index
# instead of the base segment (style guide only — the engine is ours).
# ---------------------------------------------------------------------------


def _check_grid_dim(lo: list[float], hi: list[float], dim: int, caller: str) -> None:
    """A grid shorter than `dim` would TRUNCATE every SQ8 code, and
    `int_dot`'s zip_with silently drops the unmatched tail — wrong
    integer dots, not an error. Validate at entry (the r9 ADVICE
    posture: fail where the mistake is made, not deep in the math)."""
    if len(lo) != dim or len(hi) != dim:
        raise ValueError(
            f"{caller}: SQ8 grid has {len(lo)}/{len(hi)} bounds but "
            f"dim={dim} — codes would truncate and integer dots would "
            "silently drop the tail"
        )


def materialize_ivf_pq_refine_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    lo: list[float],
    hi: list[float],
    dim: int,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The refine index as STORAGE: (nid, nv, codes, sq8, cell) written
    cell-partitioned in one pass — PQ codes via the arrow bulk kernel,
    SQ8 codes as a pure column expression over the same frame (no second
    scan). All three artifacts (centroids, codebooks, grid bounds) are
    checked metadata written LAST; probing or merging with a foreign set
    raises. `nv` is kept for offline exact audits and retrains, but the
    serving probe never reads it — that is the point of the tier."""
    from .quantize import sq8_code

    _check_grid_dim(lo, hi, dim, "materialize_ivf_pq_refine_index")
    assigned = _assign_pq_arrow(
        corpus, centroids, codebooks, dim, id_col, vec_col
    ).withColumn("sq8", sq8_code(F.col("nv"), lo, hi))
    assigned.select("nid", "nv", "codes", "sq8", "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    _write_centroids(path, centroids)
    _write_codebooks(path, codebooks)
    _write_sq8_bounds(path, lo, hi)


def ivf_pq_sq8_refine_topk(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    lo: list[float],
    hi: list[float],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
    rerank: int = 8,
) -> DataFrame:
    """Two-stage quantized top-k over the refine index:

    1. coarse probe + ADC candidates — the shared arrow LUT kernel over
       the probed cells' (nid, codes, cell), m ints per vector;
    2. SQ8 refine — the rerank*k ADC survivors per query re-score by the
       EXACT integer dot of SQ8 codes (dim bytes per vector), ranked
       (dot_q DESC, nid ASC), the Flat,SQ8 convention.

    `nv` never transfers: end-to-end probe fetch is codes + sq8 of the
    probed cells (plan-asserted in tests), vs the exact re-rank's
    whole-chunk nv point-reads that cost it the §8 A/B. With an
    exhaustive band (n_probe = n_cells, rerank*k >= corpus) the result
    is exactly the Flat,SQ8 ranking — the hash-certified regime of
    sim_ivf_pq_sq8_refine_exact; under selective bands candidates are
    approximate by the PQ contract (recall pinned in tests)."""
    from .quantize import int_dot, sq8_code

    _check_grid_dim(lo, hi, dim, "ivf_pq_sq8_refine_topk")
    check_centroids(path, centroids)
    check_codebooks(path, codebooks)
    check_sq8_bounds(path, lo, hi)
    adc, _qids, _qn, all_cells = _pq_adc_scores_arrow(
        spark, path, queries, centroids, codebooks, dim,
        id_col, vec_col, n_probe, want_cos=False,
    )
    w_adc = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("nid"))
    cands = (
        adc.withColumn("arank", F.row_number().over(w_adc))
        .where(F.col("arank") <= rerank * k)
        .select("qid", "nid")
    )
    # refine pass: SQ8 codes of the probed cells; survivors and query
    # codes broadcast (|Q| * rerank*k rows — bounded by construction)
    qc = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"),
            sq8_code(F.col(vec_col), lo, hi).alias("qc"),
        )
    )
    refined = (
        spark.read.parquet(path)
        .where(F.col("cell").isin(all_cells))
        .select("nid", "sq8")
        .join(F.broadcast(cands), "nid")
        .join(qc, "qid")
        .select(
            "qid", "nid", int_dot(F.col("qc"), F.col("sq8")).alias("dot_q")
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot_q"), F.asc("nid"))
    return (
        refined.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def merge_ivf_pq_refine_increment(
    spark,
    path: str,
    arrivals: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    lo: list[float],
    hi: list[float],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_moved: str = "error",
) -> None:
    """Incremental maintenance for the refine index — the exact contract
    of `merge_ivf_pq_increment` (touched cells only, redelivery-safe,
    moved-id guard) with the arrival pass encoding BOTH codes: PQ via
    the arrow kernel, SQ8 on the STORED grid. All three metadata sets
    are checked before any write — an increment encoded against a
    foreign grid or codebook would poison exactly the touched cells."""
    from .quantize import sq8_code

    if on_moved not in ("error", "tombstone"):
        raise ValueError(f"on_moved must be 'error' or 'tombstone', got {on_moved!r}")
    _check_grid_dim(lo, hi, dim, "merge_ivf_pq_refine_increment")
    check_centroids(path, centroids)
    check_codebooks(path, codebooks)
    check_sq8_bounds(path, lo, hi)
    fresh = (
        _assign_pq_arrow(arrivals, centroids, codebooks, dim, id_col, vec_col)
        .withColumn("sq8", sq8_code(F.col("nv"), lo, hi))
        .groupBy("nid")  # an increment may carry an id twice; one survives
        .agg(F.max(F.struct("cell", "nv", "codes", "sq8")).alias("w"))
        .select(
            "nid",
            F.col("w.nv").alias("nv"),
            F.col("w.codes").alias("codes"),
            F.col("w.sq8").alias("sq8"),
            F.col("w.cell").alias("cell"),
        )
    )
    _merge_fresh_into_cells(
        spark, path, fresh, ("nid", "nv", "codes", "sq8", "cell"), on_moved,
        "merge_ivf_pq_refine_increment",
    )


def retrain_ivf_pq_refine_index(
    spark,
    path: str,
    dim: int,
    n_cells: int = 16,
    m: int = 16,
    k: int = 64,
    max_iter: int = 8,
    sample_limit: int = 4096,
    seed: int = IVF_SEED,
) -> tuple[list[list[float]], list[list[list[float]]], list[float], list[float]]:
    """Drift repair for the refine index: centroids and codebooks refit
    from a bounded ordered sample (driver-side Lloyd's — the corpus
    never collects), the SQ8 grid from the FULL index contents (one
    exact min/max aggregation — no sampling error in the artifact that
    decides code values), then every cell re-encodes and re-materializes
    staged through disk, metadata written LAST. Returns (centroids,
    codebooks, lo, hi) — the caller must probe and merge with the
    returned sets (a stale set raises via the metadata checks)."""
    from ..plans.eav import _drop_stage, _stage_merge
    from .quantize import sq8_code, sq8_train_bounds, train_pq_codebooks

    vecs = spark.read.parquet(path).select(
        F.col("nid").alias("vec_id"), F.col("nv").alias("embedding")
    )
    cents = train_centroids_sample(
        vecs, "vec_id", "embedding",
        n_cells=n_cells, max_iter=max_iter,
        sample_limit=sample_limit, seed=seed,
    )
    books = train_pq_codebooks(
        vecs, "vec_id", "embedding", dim, m=m, k=k,
        sample_limit=sample_limit, max_iter=max_iter, seed=seed,
    )
    lo, hi = sq8_train_bounds(vecs, "embedding", dim)
    assigned = _assign_pq_arrow(
        vecs, cents, books, dim, "vec_id", "embedding"
    ).withColumn("sq8", sq8_code(F.col("nv"), lo, hi))
    staged = _stage_merge(
        spark, assigned, path, columns=("nid", "nv", "codes", "sq8", "cell")
    )
    staged.write.mode("overwrite").partitionBy("cell").parquet(path)
    _drop_stage(path)
    _write_codebooks(path, books)
    _write_sq8_bounds(path, lo, hi)
    _write_centroids(path, cents)
    return cents, books, lo, hi
