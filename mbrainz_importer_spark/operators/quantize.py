"""Embedding quantization for memory-bounded similarity search: int8
scalar quantization (faiss "SQ8") and product quantization (faiss "PQm")
with asymmetric-distance (ADC) scoring.

Why this exists at 100 TB: a float32 corpus of 10^11 × 256-d embeddings
is ~100 TB of vectors alone; SQ8 cuts residency 4×, PQ 16–64×, which is
the difference between an in-memory probe and a disk-bound scan. The
quantized representation is what the executors hold and score; exact
re-ranking (operators/similarity.py) runs only on the survivors.

Spark-first shape: encoding and scoring are pure column expressions —
transform/zip_with/aggregate over array columns, centroid tables as plan
literals (like ann.py's IVF centroids). No UDF anywhere; WholeStageCodegen
keeps the integer dot products JVM-side. Training (PQ codebooks) is
driver-side numpy on a bounded ordered sample, the same offline-training
contract as ann.train_centroids_sample.

Determinism/certification: SQ8 is fully deterministic (a closed-form grid)
and integer-valued, so the ORACLE-PAIRED gates hash integer dot products
bit-for-bit. PQ trained with k >= distinct subvectors is LOSSLESS
(every subvector is its own centroid), so ADC equals the exact integer
product — the same exact-regime certification trick as `sim_ivf_exact`;
the lossy regime's recall bound is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SQ_LEVELS = 255  # int8 grid: codes in [0, 255]


def sq8_train_bounds(df: DataFrame, vec_col: str, dim: int) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] over the corpus — the trained artifact of
    scalar quantization (faiss ScalarQuantizer train). One aggregation
    (2·dim scalar aggs, map-side combined); the 2·dim floats collect to
    the driver and ship back as plan literals."""
    # identical 2·dim map-side-combined scalar aggs, but handed to the
    # JVM as TWO expression strings instead of ~6·dim py4j calls (the
    # r13 plan-construction fix; see operators/litexpr.py). array() of
    # aggregates is itself an aggregate expression, so the plan is the
    # same one-pass HashAggregate.
    c = f"`{vec_col}`"
    lo_e = F.expr("array(" + ",".join(f"min({c}[{i}])" for i in range(dim)) + ")")
    hi_e = F.expr("array(" + ",".join(f"max({c}[{i}])" for i in range(dim)) + ")")
    row = df.agg(lo_e.alias("lo"), hi_e.alias("hi")).collect()[0]
    lo = [float(x) for x in row["lo"]]
    hi = [float(x) for x in row["hi"]]
    return lo, hi


def sq8_code(vec: Column, lo: list[float], hi: list[float]) -> Column:
    """Quantize an array<float> to array<int> codes on the per-dim grid:
    round((x - lo_d) * 255 / (hi_d - lo_d)), clamped to [0, 255];
    degenerate dims (hi == lo) code to 0. Pure projection.

    Built as ONE transform over two literal grid arrays instead of dim
    per-element expression branches: the values are bit-identical (the
    per-dim scale 255/(hi-lo) is the same Python-computed double either
    way, and the arithmetic order is unchanged), but construction costs
    ~4 py4j calls instead of ~8·dim (the r13 plan-construction fix;
    oracle gates hash-certify the equality)."""
    from .litexpr import lit_doubles

    scale = [0.0 if h == l else SQ_LEVELS / (h - l) for l, h in zip(lo, hi)]
    lo_arr = lit_doubles(lo)
    sc_arr = lit_doubles(scale)
    return F.transform(
        F.slice(vec, 1, len(lo)),
        lambda x, i: F.when(
            F.element_at(sc_arr, i + 1) == 0.0, F.lit(0)
        ).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(SQ_LEVELS),
                    F.round(
                        (x.cast("double") - F.element_at(lo_arr, i + 1))
                        * F.element_at(sc_arr, i + 1)
                    ).cast("int"),
                ),
            )
        ),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer inner product of two int-code arrays (bigint —
    255²·dim stays far inside 64 bits for any sane dim)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("bigint") * y.cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def sq8_ip_topk(
    queries: DataFrame,
    corpus: DataFrame,
    lo: list[float],
    hi: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Quantized inner-product top-k (faiss "Flat,SQ8" / METRIC_INNER_
    PRODUCT): both sides encode on the shared grid, score is the exact
    integer dot of codes, rank (dot_q DESC, nid ASC) per query. The
    query side broadcasts (queries are few); the corpus side is a narrow
    scan of codes — 4× less traffic than floats, and at scale the codes
    ARE the stored columns (encode once, materialize). Composes with IVF
    cell restriction for sublinear probes; this is the in-cell scorer."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("qid"), sq8_code(F.col(vec_col), lo, hi).alias("qc")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), sq8_code(F.col(vec_col), lo, hi).alias("nc")
    )
    scored = q.join(c, F.col("qid") != F.col("nid")).select(
        "qid", "nid", int_dot(F.col("qc"), F.col("nc")).alias("dot_q")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("dot_q").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "dot_q", F.col("rank").cast("bigint").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _split(vec, m: int, dim: int) -> list:
    """m contiguous subvector slices of an array column (faiss layout)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [F.slice(vec, i * sub + 1, sub) for i in range(m)]


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int,
    k: int,
    sample_limit: int = 4096,
    max_iter: int = 8,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Per-subspace seeded KMeans (Lloyd's, numpy) on a bounded ordered
    sample — codebooks[i] is the k×(dim/m) centroid table of subspace i.
    Same offline-training contract as ann.train_centroids_sample: only
    <= sample_limit vectors reach the driver; the corpus never does.
    With k >= the number of distinct subvectors in the sample==corpus,
    every subvector becomes its own centroid and encoding is lossless."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(sample_limit).collect()
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    rng = np.random.RandomState(seed)
    for i in range(m):
        S = X[:, i * sub : (i + 1) * sub]
        uniq = np.unique(S, axis=0)
        kk = min(k, len(uniq))
        centers = uniq[rng.choice(len(uniq), size=kk, replace=False)].copy()
        for _ in range(max_iter):
            d2 = ((S[:, None, :] - centers[None, :, :]) ** 2).sum(axis=-1)
            assign = d2.argmin(axis=1)
            for j in range(kk):
                members = S[assign == j]
                if len(members):
                    centers[j] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in centers])
    return books


def _lit_matrix(rows: list[list[float]]) -> Column:
    from .litexpr import lit_double_matrix

    return lit_double_matrix(rows)


def pq_codes(
    vec: Column, dim: int, codebooks: list[list[list[float]]]
) -> Column:
    """array<int> PQ code of one vector column — each subvector's
    nearest-centroid index (L2, ties to the lowest index). Pure column
    expression so callers (pq_encode, the IVF×PQ index writer in
    operators/ann.py) can encode inside a wider projection without a
    join."""
    m = len(codebooks)
    subs = _split(vec, m, dim)
    code_cols = []
    for i, book in enumerate(codebooks):
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            subs[i],
                            _lit_matrix([book[j]])[0],
                            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d2"),
                    F.lit(j).alias("idx"),
                )
                for j in range(len(book))
            ]
        )
        code_cols.append(F.array_sort(cands)[0]["idx"])
    return F.array(*code_cols)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, codes array<int>) — `pq_codes` as a projection. Codebooks
    travel as plan literals; the assignment is array_sort over
    (distance, index) structs, all JVM-side. At scale this runs ONCE
    and the codes materialize as the stored index (m bytes per vector
    at k<=256)."""
    return df.select(
        F.col(id_col).alias("id"),
        pq_codes(F.col(vec_col), dim, codebooks).alias("codes"),
    )


def pq_adc_ip(
    query_vec: Column, codes: Column, dim: int, codebooks: list[list[list[float]]]
) -> Column:
    """Asymmetric-distance inner product: Σ_i dot(q_sub_i, codebook_i[
    code_i]) — the query stays unquantized (ADC), the corpus is codes
    only. The per-subspace centroid lookup is element_at into a literal
    k×sub matrix; everything stays in codegen."""
    m = len(codebooks)
    subs = _split(query_vec, m, dim)
    total = F.lit(0.0)
    for i, book in enumerate(codebooks):
        cent = F.element_at(_lit_matrix(book), codes[i] + 1)
        total = total + F.aggregate(
            F.zip_with(subs[i], cent, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return total


def pq_recon_norm(codes: Column, codebooks: list[list[list[float]]]) -> Column:
    """Norm of the vector a PQ code RECONSTRUCTS to: sqrt(Σ_i
    ||codebook_i[code_i]||²) — exact because subspaces are orthogonal
    coordinate blocks. The per-centroid squared norms are m k-float
    literal arrays (precomputed here, not per row), so the lookup is one
    element_at per subspace. This is what turns ADC inner product into
    an ADC cosine estimate (ip / recon_norm; the query norm is constant
    per query and cancels in per-query ranking) — without it, IP
    candidate generation misranks any corpus whose vector norms vary."""
    from .litexpr import lit_doubles

    total = F.lit(0.0)
    for i, book in enumerate(codebooks):
        n2 = lit_doubles([sum(x * x for x in c) for c in book])
        total = total + F.element_at(n2, codes[i] + 1)
    return F.sqrt(total)


def pq_ip_topk(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k by ADC inner product per query over a PQ-coded corpus:
    (qid, nid, score) ranked score DESC, nid ASC. Queries broadcast;
    the corpus side reads m ints per vector."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    )
    scored = q.join(
        corpus_codes.select(F.col("id").alias("nid"), "codes"),
        F.col("qid") != F.col("nid"),
    ).select(
        "qid", "nid", pq_adc_ip(F.col("qv"), F.col("codes"), dim, codebooks).alias("score")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "score", F.col("rank").cast("bigint").alias("rank"))
    )
