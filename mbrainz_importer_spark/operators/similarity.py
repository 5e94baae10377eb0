"""Similarity search over embedding columns (array<float>).

Two paths, matching the brief:
  - brute-force cosine top-k: exact baseline. The dot product is a
    JVM-side higher-order expression (zip_with + aggregate) — no Python
    in the loop. O(Q x N); right when one side is small or broadcastable.
  - random-hyperplane LSH buckets: the scale path. Bucket key = sign
    pattern of dot products with R fixed hyperplanes; candidates share a
    bucket, exact cosine re-ranks within the bucket. Linear shuffle in
    corpus size, fan-out driven by collisions.

Hyperplanes are seeded-numpy constants embedded as literal arrays, so the
DuckDB oracle evaluates the identical function.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_SEED = 42


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid in LONG form — (label, dim, centroid_val) —
    the building block for class prototypes / SemDeDup-style cluster
    representatives. posexplode + one (label, dim) groupBy: map-side
    combined, no array re-assembly (long form joins/compares directly
    and avoids engine-specific array equality)."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("__v").cast("double")), 6).alias("centroid_val")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self). Deterministic
    ranking: (rounded cosine desc, neighbor id asc). The corpus side is
    broadcast when it fits — a Q x N nested loop with no shuffle."""
    # norms precomputed per side BEFORE the nested loop: norm(q) would
    # otherwise be re-folded N times per query and norm(n) Q times per
    # neighbor (no CSE across join rows) — only the dot product is
    # genuinely per-pair work
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
        norm(F.col(vec_col)).alias("nn"),
    )
    sim = F.round(dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6)
    pairs = (
        q.crossJoin(F.broadcast(c))
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", sim.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = LSH_SEED) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit r set iff dot(vec, plane_r) > 0."""
    bucket = F.lit(0)
    for r, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(1 << r)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    threshold: float = 0.3,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs via LSH bucketing + exact re-rank:
    (id_a, id_b, cos_sim) for same-bucket pairs with cosine >= threshold."""
    planes = hyperplanes(dim, n_planes)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    # threshold on the UNROUNDED cosine (matches the oracle's WHERE);
    # rounding is output-only, for representation-stable hashing.
    # norms ride along from the pre-join projection (see brute_force_topk).
    raw = dot(F.col("l.v"), F.col("r.v")) / (F.col("l.n") * F.col("r.n"))
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .where(raw >= threshold)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(raw, 6).alias("cos_sim"),
        )
    )


# -------------------------------------------------------------------------
# SemDeDup — semantic deduplication via cluster-then-prune
# -------------------------------------------------------------------------

def semdedup_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid cell assignment as a shuffle-free array argmax:
    cosine to every centroid (a plan literal, the offline-training
    contract of ann.train_centroids_sample) rounded to 6 decimals, max
    by (sim desc, cell asc). Rounding BEFORE the argmax makes the
    assignment engine-portable — unrounded ulp differences could flip
    near-equidistant vectors between cells. Returns (id, cell)."""
    if not centroids:
        raise ValueError("semdedup_assign needs centroids")
    v = F.col(vec_col)
    sims = F.array(*[
        F.struct(
            F.round(cosine(v, F.array(*[F.lit(x) for x in c])), 6).alias("sim"),
            F.lit(-i).alias("negcell"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.array_max(sims)
    return df.select(
        F.col(id_col).alias("doc"),
        (-best["negcell"]).cast("int").alias("cell"),
    )



def semdedup_assign_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow face of semdedup_assign: one matmul against the centroid
    matrix per batch instead of k interpreted cosine folds per row.
    HALF_UP rounding emulated (numpy rounds half-even) and np.argmax's
    first-max tie-break IS the expression face's (sim desc, cell asc),
    so assignments match bit-for-bit (asserted in tests)."""
    import numpy as np
    import pandas as pd

    if not centroids:
        raise ValueError("semdedup_assign_arrow needs centroids")
    C = np.array(centroids, dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = np.sqrt((V * V).sum(axis=1))
            S = (V @ C.T) / np.outer(vn, cn)
            S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "doc": pdf[id_col].to_numpy(),
                    "cell": S.argmax(axis=1).astype("int32"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, schema="doc long, cell int"
    )


def _split_hot_cells(
    cells: DataFrame,
    max_cell_size: int,
    in_dim: int,
    seed: int = LSH_SEED,
    max_depth: int = 8,
) -> DataFrame:
    """Enforce the SemDeDup bounded-cell contract: recursively split
    any cell larger than `max_cell_size` by a seeded secondary
    hyperplane, until every cell fits or `max_depth` is reached. The
    split is MEAN-CENTERED: side = (w·v > avg over the cell of w·v) —
    a raw sign split is useless on a tight cluster (every member of a
    cell near a centroid projects to the same sign), while thresholding
    at the cell mean separates any cell whose members differ at all.
    Exact-duplicate vectors project identically and always stay
    co-celled; near-duplicates separate only in the thin band around
    the cell mean — the recall trade every hyperplane split makes
    (paper-consistent: SemDeDup caps cluster sizes).

    Input/output: (doc, cell, v, n) -> same plus `pcell` (the PAIR
    cell used for candidate generation; `cell` keeps the original
    assignment for reporting). The id remap each round is injective:
    hot cells map to 2c/2c+1 by plane side, cold cells to 2c — parity
    separates children of hot cells from everything else.

    Per round: one cell-size aggregate and one per-cell-mean aggregate,
    both bounded by the NUMBER OF CELLS (the bounded .collect /
    broadcast contract — the corpus itself never moves), one
    projection, one eager localCheckpoint so round r+1 doesn't replay
    rounds 1..r. A cell of identical vectors can never split (all
    projections equal the mean); the depth cap stops the recursion and
    the cell stays oversized — correct, since those pairs must be
    compared anyway."""
    out = cells.withColumn("pcell", F.col("cell").cast("long"))
    for depth in range(max_depth):
        sizes = out.groupBy("pcell").agg(F.count(F.lit(1)).alias("cnt"))
        hot = [
            r["pcell"]
            for r in sizes.where(F.col("cnt") > max_cell_size).collect()
        ]
        if not hot:
            break
        plane = hyperplanes(in_dim, 1, seed + depth + 1)[0]
        proj = dot(F.col("v"), F.array(*[F.lit(x) for x in plane]))
        projected = out.withColumn("__proj", proj)
        means = (
            projected.where(F.col("pcell").isin(hot))
            .groupBy("pcell")
            .agg(F.avg("__proj").alias("__thr"))
        )
        out = (
            projected.join(F.broadcast(means), "pcell", "left")
            .withColumn(
                "pcell",
                F.when(
                    F.col("__thr").isNotNull(),
                    F.col("pcell") * 2
                    + (F.col("__proj") > F.col("__thr")).cast("long"),
                ).otherwise(F.col("pcell") * 2),
            )
            .drop("__proj", "__thr")
            .localCheckpoint(eager=True)
        )
    return out


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
    max_cell_size: int | None = None,
    collapse_identical: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): embeddings cluster
    into k cells, and only WITHIN a cell are pairwise cosines examined
    — the k-fold candidate reduction that makes semantic dedup feasible
    where all-pairs never is. A document is dropped iff a smaller-id
    member of its cell sits above the similarity threshold (the
    deterministic min-id variant of the paper's keep-one rule).

    Shapes: assignment is a shuffle-free projection; the self-join is
    keyed on cell, so fan-out is bounded by cell population, never the
    corpus — with balanced cells this is |corpus|²/k pair work done as
    an equi-join, the SemDeDup cost model. `max_cell_size` ENFORCES
    that bound: cells above it are recursively split by secondary
    hyperplanes before pair generation (_split_hot_cells), so one
    skewed cluster can neither blow up the join fan-out nor OOM the
    Arrow face's per-cell |cell|² Gram matrix; the reported `cell`
    stays the original assignment. The Arrow face is the DEFAULT
    (2.8x faster at sf0.1, bit-for-bit identical — tested); the
    expression face (use_arrow=False) remains the oracle face.
    Returns (doc, cell, keep) for every input row.

    `collapse_identical` (default on) runs the quadratic core over
    DISTINCT vectors only: byte-identical embeddings collapse to their
    min-id representative first (one hash shuffle keyed on the vector),
    and members fan back out afterwards. This is EXACT, not an
    approximation — a non-representative member always has its own
    group's min id as a co-celled mate at cosine 1.0 >= threshold (so
    keep=False), and cross-group domination is unchanged because an
    identical group's min id is <= every member id and identical
    vectors share every pairwise cosine. Hyperplane splits cannot
    separate identical vectors (_split_hot_cells keeps them co-celled),
    so WITHOUT the collapse a heavily-duplicated corpus pays quadratic
    pair work on duplicate mass no cell bound can reduce — the sf10
    scale-tier bench measured 446s on a 100x-replicated corpus that
    the collapsed path handles at distinct-vector cost. Disabled
    automatically for threshold > 1 - 1e-6, where self-similarity
    could round below the bar."""
    if collapse_identical and threshold <= 1.0 - 1e-6:
        from pyspark.sql import Window

        members = df.select(
            F.col(id_col).alias("__m_id"), F.col(vec_col).alias("__m_v")
        ).withColumn(
            "__rep", F.min("__m_id").over(Window.partitionBy("__m_v"))
        )
        reps = members.where(F.col("__m_id") == F.col("__rep")).select(
            F.col("__m_id").alias(id_col), F.col("__m_v").alias(vec_col)
        )
        core = semdedup(
            reps, centroids, threshold, id_col, vec_col, use_arrow,
            max_cell_size, collapse_identical=False,
        )
        return members.join(core, members["__rep"] == core["doc"]).select(
            F.col("__m_id").alias("doc"),
            core["cell"],
            (F.col("keep") & (F.col("__m_id") == F.col("__rep"))).alias("keep"),
        )
    assign = (
        semdedup_assign_arrow(df, centroids, id_col, vec_col)
        if use_arrow
        else semdedup_assign(df, centroids, id_col, vec_col)
    )
    # norms precompute PER SIDE before the pair join — a per-pair
    # cosine() would re-fold each 64-element norm once per pair
    # (|cell|^2/2 times per vector), the exact waste brute_force_topk's
    # layout avoids; only the dot product is genuinely per-pair work
    vecs = df.select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
    )
    cells = assign.join(vecs, "doc")
    if max_cell_size is not None:
        cells = _split_hot_cells(cells, max_cell_size, len(centroids[0]))
    else:
        cells = cells.withColumn("pcell", F.col("cell").cast("long"))
    if use_arrow:
        dups = _semdedup_dups_arrow(cells, threshold)
    else:
        a = cells.select(
            F.col("doc").alias("id_a"), F.col("pcell").alias("cell_a"),
            F.col("v").alias("va"), F.col("n").alias("na"),
        )
        b = cells.select(
            F.col("doc").alias("id_b"), F.col("pcell").alias("cell_b"),
            F.col("v").alias("vb"), F.col("n").alias("nb"),
        )
        sim = F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
        )
        dups = (
            a.join(b, (F.col("cell_a") == F.col("cell_b"))
                   & (F.col("id_a") < F.col("id_b")))
            .where(sim >= threshold)
            .select(F.col("id_b").alias("doc"))
            .distinct()
        )
    return (
        assign.join(dups.withColumn("__dup", F.lit(True)), "doc", "left")
        .select(
            "doc", "cell",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
        )
    )



def _semdedup_dups_arrow(cells: DataFrame, threshold: float) -> DataFrame:
    """Vectorized within-cell duplicate detection: applyInPandas per
    pair-cell, one Gram matmul per cell instead of |cell|² interpreted
    higher-order dot folds. Rounding emulates Spark's HALF_UP (numpy's
    round is banker's) so the kept set matches the expression face
    bit-for-bit. Per-cell memory is |pcell|² doubles — bounded when the
    caller passes max_cell_size to semdedup (the `pcell` key is the
    hot-cell-split assignment from _split_hot_cells)."""
    import numpy as np
    import pandas as pd

    def find_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"doc": []}).astype({"doc": "int64"})
        order = np.argsort(pdf["doc"].to_numpy())
        ids = pdf["doc"].to_numpy()[order]
        V = np.array(pdf["v"].tolist(), dtype=np.float64)[order]
        n = np.sqrt((V * V).sum(axis=1))
        S = (V @ V.T) / np.outer(n, n)
        S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6  # HALF_UP
        hit = S >= threshold
        np.fill_diagonal(hit, False)
        # doc j is a dup iff any SMALLER-id cell-mate i<j is similar
        dup = np.triu(hit, k=1).any(axis=0)
        return pd.DataFrame({"doc": ids[dup].astype("int64")})

    return cells.groupBy("pcell").applyInPandas(find_dups, schema="doc long")


def random_projection(
    df: DataFrame,
    out_dim: int,
    in_dim: int,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: multiply each embedding
    by a seeded Gaussian matrix (out_dim x in_dim, a PLAN LITERAL —
    the same offline-artifact contract as IVF centroids and LSH
    hyperplanes) and scale by 1/sqrt(out_dim), preserving pairwise
    distances in expectation. The standard cheap dimensionality
    reduction before ANN indexing / clustering at corpus scale — a pure
    per-row projection, zero shuffles, no UDF (out_dim dot products via
    aggregate/zip_with). Rounded for engine-portable certification."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1: {out_dim}")
    planes = hyperplanes(in_dim, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    comps = [
        F.round(
            dot(F.col(vec_col), F.array(*[F.lit(x) for x in p])) * scale,
            round_to,
        )
        for p in planes
    ]
    return df.select(
        F.col(id_col).alias("id"), F.array(*comps).alias("projected")
    )


def brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """The Arrow/numpy face of brute_force_topk — same contract, same
    (rounded) scores, same deterministic ranking. The bounded query set
    (the interactive-search contract: queries are few, the corpus is
    big) collects to a literal matrix; the corpus streams through
    mapInPandas in Arrow batches and each batch scores ALL queries with
    one BLAS matmul. Per-pair cost drops from an interpreted
    higher-order fold (expression aggregate/zip_with never enters
    whole-stage codegen) to a vectorized multiply — the documented
    "drop to pandas UDF when built-ins can't express it FAST" path.
    Rounding to 6 absorbs the summation-order difference between numpy
    pairwise sums and sequential folds, so the two faces agree
    (asserted in tests)."""
    import numpy as np
    import pandas as pd

    rows = queries.select(id_col, vec_col).collect()
    if not rows:
        raise ValueError("brute_force_topk_arrow needs a non-empty query set")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in rows], dtype=np.float64)
    qn = np.sqrt((Q * Q).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nid = pdf[id_col].to_numpy(dtype=np.int64)
            cn = np.sqrt((C * C).sum(axis=1))
            sims = np.round((C @ Q.T) / np.outer(cn, qn), 6)  # b x q
            b, q = sims.shape
            yield pd.DataFrame(
                {
                    "qid": np.tile(qids, b),
                    "nid": np.repeat(nid, q),
                    "cos_sim": sims.ravel(),
                }
            )

    pairs = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="qid long, nid long, cos_sim double"
    ).where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )
