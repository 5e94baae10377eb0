"""Driver-gate queries for corpus-curation operators (operators/curation.py):
PII redaction, span-level dedup, sequence packing, decontamination, and
deterministic sharding. Every oracle reproduces the operator bit-for-bit
in DuckDB (regexp_replace with 'g', list slicing, window sums, md5-hex
numeric projection via try_cast('0x..')).

The synthetic documents table has no natural PII, so the PII gate
deterministically augments 2/3 of the docs with synthetic emails / IPs /
SSNs / phone numbers ON BOTH ENGINES before redacting — the redaction
regexes then have real work to do and the flags vary per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..tables import load

_PII_SUFFIX_SQL = (
    "' reach user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789 tel 555-867-5309'"
)

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_SQL_TOKS = r"regexp_split_to_array(lower(trim(text)), '\s+')"


def _augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    suffix = F.concat(
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10.0."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".7 ssn 123-45-6789 tel 555-867-5309"),
    )
    return docs.select(
        "doc_id",
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) != 0, F.concat(F.col("text"), suffix))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented_docs(spark, sf_dir)
    return (
        C.with_pii_redaction(aug)
        .select(
            "doc_id",
            F.col("text_redacted").alias("clean_text"),
            "has_email",
            "has_ip",
            "has_ssn",
            "has_phone",
        )
        .orderBy("doc_id")
    )


def dedup_span_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return C.dedup_spans(docs, "doc_id", "text", span_tokens=3).orderBy("doc_id")


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return C.pack_sequences(docs, "doc_id", "text", capacity=64).orderBy("doc_id")


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.pmod(F.col("doc_id"), F.lit(17)) == 0)
    corpus = docs.where(F.pmod(F.col("doc_id"), F.lit(17)) != 0)
    return C.ngram_contamination(corpus, bench, "doc_id", "text", n=3).orderBy("doc_id")


def unigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return C.unigram_logprob_scores(docs, "doc_id", "text").orderBy("doc_id")


def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self bigram LM: per-doc mean -log2 P(w_i | w_{i-1}) — one
    context order above unigram_lm_scores, same certification recipe."""
    docs = load(spark, sf_dir, "documents")
    return C.bigram_logprob_scores(docs, "doc_id", "text").orderBy("doc_id")



def interpolated_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer smoothed LM (0.75 bigram + 0.25 unigram) — the
    smoothing rung between the bigram and unigram faces."""
    docs = load(spark, sf_dir, "documents")
    return C.interpolated_logprob_scores(docs, 0.75, "doc_id", "text").orderBy("doc_id")


def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return C.assign_shards(docs, "doc_id", n_shards=8).orderBy("doc_id")


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling: keep all of src0, half of src1, a quarter
    of src2, none of src3 or any unlisted source — md5-deterministic."""
    docs = load(spark, sf_dir, "documents")
    return (
        C.weighted_mixture_sample(docs, _MIX_WEIGHTS)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling at alpha=0.5 (p_i ∝ sqrt(n_i)): per-source
    keep rates sqrt(n_min/n_i) derived from the corpus itself; certified
    by per-source survivor counts (sqrt/division are correctly rounded,
    so the kept SET is bit-identical to the oracle's)."""
    docs = load(spark, sf_dir, "documents")
    return (
        C.temperature_mixture_sample(docs, alpha=0.5)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("source")
    )


def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: corpus token counts ranked (count DESC,
    token ASC) into contiguous deterministic ids, truncated to 50."""
    docs = load(spark, sf_dir, "documents")
    return C.build_vocab(docs, "text", min_count=2, max_size=50).orderBy("token_id")


def bpe_merge_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE-training iteration: adjacent character-pair counts
    across all corpus words, top-50 merge candidates, deterministic
    (count DESC, pair ASC) ranking."""
    docs = load(spark, sf_dir, "documents")
    return C.bpe_merge_candidates(docs, "text", top_k=50).orderBy("rank")


def bpe_segment_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE apply: merges learned corpus-wide (top-50 adjacent char
    pairs, the bpe_merge_candidates output) segment the words of a doc
    subset into subword pieces via the merge-set closure. The 50-pair
    merge table is the one bounded driver collect (it IS the trained
    artifact, like IVF centroids)."""
    docs = load(spark, sf_dir, "documents")
    merges = [
        r["pair"] for r in C.bpe_merge_candidates(docs, "text", top_k=50).collect()
    ]
    subset = docs.where(F.col("doc_id") < 300)
    return C.apply_bpe_merges(subset, merges).orderBy(
        "doc_id", "word_pos", "piece_pos"
    )


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, dim, value)."""
    from ..operators.similarity import label_centroids

    emb = load(spark, sf_dir, "embeddings")
    return label_centroids(emb, "label", "embedding").orderBy("label", "dim")


def seek_datoms_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d/seek-datoms: AVET scan starting at (':nation/n_name', 'E') —
    continues through later values of that attribute AND every later
    attribute (lexicographic resume point, not a filter)."""
    from ..plans.eav import build_datoms, seek_datoms

    datoms = build_datoms({"nation": (load(spark, sf_dir, "nation"), "n_nationkey")})
    return seek_datoms(datoms, "avet", (":nation/n_name", "E"))


QUERIES = {
    "pii_redaction": pii_redaction,
    "dedup_span_level": dedup_span_level,
    "sequence_packing": sequence_packing,
    "decontaminate_ngrams": decontaminate_ngrams,
    "training_shards": training_shards,
    "unigram_lm_scores": unigram_lm_scores,
    "bigram_lm_scores": bigram_lm_scores,
    "interpolated_lm_scores": interpolated_lm_scores,
    "mixture_sample": mixture_sample,
    "mixture_temperature": mixture_temperature,
    "vocab_top_tokens": vocab_top_tokens,
    "bpe_merge_candidates": bpe_merge_candidates_q,
    "bpe_segment_texts": bpe_segment_texts,
    "embedding_label_centroids": embedding_label_centroids,
    "seek_datoms_scan": seek_datoms_scan,
}

ORACLES = {
    "pii_redaction": f"""
        WITH aug AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 <> 0 THEN text || {_PII_SUFFIX_SQL}
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                   '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_IP}', '<IP>', 'g'),
                   '{_SSN}', '<SSN>', 'g'),
                   '{_PHONE}', '<PHONE>', 'g') AS clean_text,
               regexp_matches(text, '{_EMAIL}') AS has_email,
               regexp_matches(text, '{_IP}') AS has_ip,
               regexp_matches(text, '{_SSN}') AS has_ssn,
               regexp_matches(text, '{_PHONE}') AS has_phone
        FROM aug
        ORDER BY doc_id
    """,
    "dedup_span_level": f"""
        WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
        spans AS (
            SELECT doc_id AS doc, CAST(u.i AS INT) AS pos,
                   array_to_string(t[(u.i*3+1):(u.i*3+3)], ' ') AS span
            FROM toks, UNNEST(range(0, CAST(ceil(len(t)/3.0) AS BIGINT))) AS u(i)
            WHERE len(t) > 0
        ),
        firsts AS (SELECT span, min(doc) AS d0 FROM spans GROUP BY span),
        firsts2 AS (
            SELECT s.span, f.d0, min(s.pos) AS p0
            FROM spans s JOIN firsts f ON s.span = f.span AND s.doc = f.d0
            GROUP BY s.span, f.d0
        ),
        kept AS (
            SELECT s.doc, s.pos, s.span
            FROM spans s
            JOIN firsts2 f ON s.span = f.span AND s.doc = f.d0 AND s.pos = f.p0
        ),
        totals AS (SELECT doc, count(*) AS spans_total FROM spans GROUP BY doc)
        SELECT k.doc AS doc_id,
               string_agg(k.span, ' ' ORDER BY k.pos) AS text_deduped,
               count(*) AS spans_kept,
               any_value(t.spans_total) AS spans_total
        FROM kept k JOIN totals t ON k.doc = t.doc
        GROUP BY k.doc
        ORDER BY doc_id
    """,
    "sequence_packing": f"""
        WITH toks AS (SELECT doc_id, len({_SQL_TOKS}) AS n FROM documents),
        cum AS (
            SELECT doc_id, n,
                   SUM(n) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM toks
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(c - n AS BIGINT) AS start_offset,
               CASE WHEN n <= 0 THEN NULL
                    ELSE CAST(floor((c - n) / 64.0) AS BIGINT) END AS first_pack,
               CASE WHEN n <= 0 THEN NULL
                    ELSE CAST(floor((c - 1) / 64.0) AS BIGINT) END AS last_pack,
               CASE WHEN n <= 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor((c - 1) / 64.0) - floor((c - n) / 64.0) + 1 AS BIGINT)
                    END AS n_packs_spanned
        FROM cum
        ORDER BY doc_id
    """,
    "decontaminate_ngrams": f"""
        WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
        sh AS (
            SELECT DISTINCT doc_id AS doc, u.sh
            FROM toks,
                 UNNEST(list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(sh)
            WHERE len(t) >= 3
        ),
        bench AS (SELECT DISTINCT sh FROM sh WHERE doc % 17 = 0),
        corp AS (SELECT * FROM sh WHERE doc % 17 <> 0),
        per_doc AS (SELECT doc, count(*) AS n_shingles FROM corp GROUP BY doc),
        hits AS (
            SELECT c.doc, count(*) AS n_contaminated
            FROM corp c JOIN bench b ON c.sh = b.sh
            GROUP BY c.doc
        )
        SELECT h.doc AS doc_id, p.n_shingles, h.n_contaminated,
               round(h.n_contaminated / p.n_shingles, 6) AS contamination_frac
        FROM hits h JOIN per_doc p ON h.doc = p.doc
        ORDER BY doc_id
    """,
    "mixture_sample": """
        SELECT doc_id, source
        FROM documents
        WHERE CAST(try_cast('0x' || substr(md5('mixture-v1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS DOUBLE) / 1152921504606846976.0
              < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                            WHEN 'src2' THEN 0.25 ELSE 0.0 END
        ORDER BY doc_id
    """,
    "mixture_temperature": """
        WITH counts AS (
            SELECT source, count(*) AS n FROM documents GROUP BY source
        ), mn AS (
            SELECT MIN(n) AS nmin FROM counts
        ), rates AS (
            SELECT source, sqrt(CAST(nmin AS DOUBLE) / n) AS rate
            FROM counts, mn
        )
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE CAST(try_cast('0x' || substr(md5('mixture-t-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS DOUBLE) / 1152921504606846976.0 < r.rate
        GROUP BY d.source
        ORDER BY d.source
    """,
    "vocab_top_tokens": f"""
        WITH counts AS (
            SELECT u.token, count(*) AS count
            FROM (SELECT {_SQL_TOKS} AS t FROM documents), UNNEST(t) AS u(token)
            GROUP BY u.token
            HAVING count(*) >= 2
        )
        SELECT token,
               CAST(row_number() OVER (ORDER BY count DESC, token) - 1 AS BIGINT)
                   AS token_id,
               count
        FROM counts
        QUALIFY token_id < 50
        ORDER BY token_id
    """,
    "bpe_merge_candidates": f"""
        WITH words AS (
            SELECT w FROM (
                SELECT u.w AS w
                FROM (SELECT {_SQL_TOKS} AS t FROM documents), UNNEST(t) AS u(w)
            ) WHERE length(w) >= 2
        ),
        pairs AS (
            SELECT u.pair FROM (
                SELECT list_transform(range(1, length(w)),
                                      i -> substr(w, CAST(i AS INT), 2)) AS ps
                FROM words
            ), UNNEST(ps) AS u(pair)
        ),
        counts AS (SELECT pair, count(*) AS count FROM pairs GROUP BY pair)
        SELECT pair, count,
               CAST(row_number() OVER (ORDER BY count DESC, pair) AS BIGINT) AS rank
        FROM counts
        QUALIFY rank <= 50
        ORDER BY rank
    """,
    "bpe_segment_texts": f"""
        WITH allwords AS (
            SELECT w FROM (
                SELECT u.w AS w
                FROM (SELECT {_SQL_TOKS} AS t FROM documents), UNNEST(t) AS u(w)
            ) WHERE length(w) >= 2
        ),
        prs AS (
            SELECT u.pair FROM (
                SELECT list_transform(range(1, length(w)),
                                      i -> substr(w, CAST(i AS INT), 2)) AS ps
                FROM allwords
            ), UNNEST(ps) AS u(pair)
        ),
        cnt AS (SELECT pair, count(*) AS c FROM prs GROUP BY pair),
        merges AS (
            SELECT pair, row_number() OVER (ORDER BY c DESC, pair) AS rank FROM cnt
            QUALIFY rank <= 50
        ),
        mlist AS (SELECT list(pair) AS ms FROM merges),
        toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents WHERE doc_id < 300),
        words AS (
            SELECT doc_id, CAST(u.i - 1 AS INT) AS word_pos, t[u.i] AS w
            FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
            WHERE length(t[u.i]) >= 1
        ),
        seg AS (
            SELECT doc_id, word_pos, w,
                   list_filter(range(1, length(w)),
                       i -> NOT list_contains(ms, substr(w, CAST(i AS INT), 2))
                   ) AS b
            FROM words, mlist
        ),
        pieces AS (
            SELECT doc_id, word_pos,
                   list_transform(range(1, len(b) + 2), j -> substr(w,
                       CAST(CASE WHEN j = 1 THEN 1 ELSE b[j - 1] + 1 END AS INT),
                       CAST(CASE WHEN j = len(b) + 1 THEN length(w)
                                 ELSE b[j] END
                            - CASE WHEN j = 1 THEN 1 ELSE b[j - 1] + 1 END
                            + 1 AS INT))
                   ) AS ps
            FROM seg
        )
        SELECT doc_id, word_pos, CAST(u.i - 1 AS INT) AS piece_pos, ps[u.i] AS piece
        FROM pieces, UNNEST(range(1, len(ps) + 1)) AS u(i)
        ORDER BY doc_id, word_pos, piece_pos
    """,
    "embedding_label_centroids": """
        SELECT label,
               CAST(u.s.i - 1 AS INT) AS dim,
               round(avg(CAST(u.s.v AS DOUBLE)), 6) AS centroid_val
        FROM (
            SELECT label,
                   list_transform(range(1, len(embedding) + 1),
                                  i -> {'i': i, 'v': embedding[i]}) AS ps
            FROM embeddings
        ), UNNEST(ps) AS u(s)
        GROUP BY label, dim
        ORDER BY label, dim
    """,
    "seek_datoms_scan": r"""
        WITH datoms AS (
            SELECT CONCAT('nation:', CAST(n_nationkey AS VARCHAR)) AS e,
                   ':nation/n_nationkey' AS a,
                   CAST(n_nationkey AS VARCHAR) AS v,
                   CAST(n_nationkey AS DOUBLE) AS v_num
            FROM nation
            UNION ALL
            SELECT CONCAT('nation:', CAST(n_nationkey AS VARCHAR)),
                   ':nation/n_name', n_name, NULL
            FROM nation
            UNION ALL
            SELECT CONCAT('nation:', CAST(n_nationkey AS VARCHAR)),
                   ':nation/n_regionkey',
                   CAST(n_regionkey AS VARCHAR),
                   CAST(n_regionkey AS DOUBLE)
            FROM nation
        )
        SELECT e, a, v, v_num
        FROM datoms
        WHERE a > ':nation/n_name' OR (a = ':nation/n_name' AND v >= 'E')
        ORDER BY a, v, e
    """,
    "unigram_lm_scores": f"""
        WITH toks AS (
            SELECT doc_id AS doc, u.tok
            FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
                 UNNEST(t) AS u(tok)
        ),
        totals AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
        corpus AS (SELECT CAST(sum(tf) AS DOUBLE) AS N FROM totals)
        SELECT t.doc AS doc_id,
               count(*) AS n_tokens,
               round(avg(-log2(CAST(tf AS DOUBLE) / N)), 6) AS mean_neg_log2p
        FROM toks t JOIN totals USING (tok), corpus
        GROUP BY t.doc
        ORDER BY doc_id
    """,
    "bigram_lm_scores": f"""
        WITH toks AS (
            SELECT doc_id AS doc, {_SQL_TOKS} AS t FROM documents
        ),
        stream AS (
            SELECT doc, t[u.i] || ' ' || t[u.i + 1] AS bg
            FROM toks, UNNEST(
                CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END
            ) AS u(i)
        ),
        bcnt AS (SELECT bg, count(*) AS bc FROM stream GROUP BY bg),
        ctx AS (
            SELECT split_part(bg, ' ', 1) AS ctx, SUM(bc) AS cc
            FROM bcnt GROUP BY 1
        ),
        agg AS (
            SELECT s.doc,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   round(avg(-log2(CAST(b.bc AS DOUBLE) / c.cc)), 6)
                       AS mean_neg_log2p
            FROM stream s
              JOIN bcnt b USING (bg)
              JOIN ctx c ON split_part(s.bg, ' ', 1) = c.ctx
            GROUP BY s.doc
        )
        SELECT t.doc AS doc_id,
               CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               a.mean_neg_log2p
        FROM toks t LEFT JOIN agg a USING (doc)
        ORDER BY doc_id
    """,
    "training_shards": """
        SELECT doc_id,
               CAST(try_cast('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 8 AS INT) AS shard,
               try_cast('0x' || substr(md5('shard-v1:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS shuffle_key
        FROM documents
        ORDER BY doc_id
    """,
}

ORACLES["interpolated_lm_scores"] = rf"""
    WITH toks AS (
        SELECT doc_id AS doc, {_SQL_TOKS} AS t FROM documents
    ),
    stream AS (
        SELECT doc, t[u.i] || ' ' || t[u.i + 1] AS bg, t[u.i + 1] AS w
        FROM toks, UNNEST(
            CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END
        ) AS u(i)
    ),
    bcnt AS (SELECT bg, count(*) AS bc FROM stream GROUP BY bg),
    ctx AS (
        SELECT split_part(bg, ' ', 1) AS ctx, SUM(bc) AS cc
        FROM bcnt GROUP BY 1
    ),
    uni AS (
        SELECT u.w AS w, count(*) AS tf
        FROM toks, UNNEST(t) AS u(w) GROUP BY u.w
    ),
    ntok AS (SELECT CAST(SUM(tf) AS DOUBLE) AS N FROM uni),
    agg AS (
        SELECT s.doc,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(-log2(
                   0.75 * (CAST(b.bc AS DOUBLE) / c.cc)
                   + 0.25 * (CAST(un.tf AS DOUBLE) / (SELECT N FROM ntok))
               )), 6) AS mean_neg_log2p
        FROM stream s
          JOIN bcnt b USING (bg)
          JOIN ctx c ON split_part(s.bg, ' ', 1) = c.ctx
          JOIN uni un ON s.w = un.w
        GROUP BY s.doc
    )
    SELECT t.doc AS doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           a.mean_neg_log2p
    FROM toks t LEFT JOIN agg a USING (doc)
    ORDER BY doc_id
"""
