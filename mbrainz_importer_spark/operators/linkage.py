"""Entity resolution (record linkage): blocking -> pairwise verify ->
transitive resolution.

The reference resolves entities only by EXACT identity — unique-identity
upsert during import (`cognitect/xform/transform.clj` lookup-refs,
`operators/upsert.py` here). A curation pipeline feeding a trainer needs
the fuzzy generalization: the same real-world entity arrives under
near-identical surface forms ("cold gear" / "old gear") and must
collapse to one canonical record before counting, sampling, or joining.
This module is the deterministic (Fellegi-Sunter-without-weights)
variant: candidate generation by BLOCKING, verification by edit
distance, resolution by connected components.

Scale design (the 100 TB contract):
  - Never all-pairs. Candidates come from an equi-join on a blocking
    key, so pair count is sum over blocks of |block|^2, not |corpus|^2.
    A bad blocking key is the failure mode, so `max_block` DROPS
    oversized blocks whole (the same recall-for-survival trade as
    `minhash_lsh_pairs(max_bucket=...)`) — a block of B members emits
    B(B-1)/2 pairs, and one degenerate key ("", "unknown") otherwise
    owns the job.
  - Resolve over DISTINCT surface forms, not rows. The corpus fans in
    to its distinct keys first (the `collapse_identical` discipline
    from dedup/semdedup): verification cost is bounded by the
    vocabulary of forms, and the full corpus only pays one hash join
    to map rows onto canonical forms at the end.
  - Verification is `F.levenshtein` — JVM-side, codegen, no Python.
  - Resolution reuses `connected_components` (pointer jumping,
    O(log diameter) rounds) from operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components


def candidate_pairs(
    forms: DataFrame,
    key_col: str,
    block: Column,
    max_block: int | None = None,
) -> DataFrame:
    """Within-block candidate pairs over a frame of DISTINCT surface
    forms: (key_a, key_b) with key_a < key_b, both sharing the blocking
    key. `max_block` drops blocks with more members than the cap
    (documented recall trade; mirror in an oracle as HAVING COUNT(*)
    <= cap)."""
    keyed = forms.select(F.col(key_col), block.alias("__blk")).distinct()
    if max_block is not None:
        small = (
            keyed.groupBy("__blk")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= F.lit(max_block))
            .select("__blk")
        )
        # no broadcast hint: the qualifying-block set scales with the
        # blocking vocabulary, so a forced broadcast can OOM at corpus
        # scale — left_semi lets AQE pick broadcast only when it fits
        keyed = keyed.join(small, "__blk", "left_semi")
    a = keyed.select(F.col("__blk"), F.col(key_col).alias("key_a"))
    b = keyed.select(F.col("__blk"), F.col(key_col).alias("key_b"))
    return (
        a.join(b, "__blk")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )


def fuzzy_matches(
    forms: DataFrame,
    key_col: str,
    block: Column,
    compare: Column,
    max_edit: int,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy matcher: candidate pairs whose `compare` projections
    sit within `max_edit` Levenshtein distance. Returns
    (key_a, key_b, edit_dist). `compare` is evaluated per side BEFORE
    the join so the distance runs on short projections (e.g. one name
    token), not whole records."""
    keyed = forms.select(
        F.col(key_col), block.alias("__blk"), compare.alias("__cmp")
    ).distinct()
    if max_block is not None:
        small = (
            keyed.groupBy("__blk")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= F.lit(max_block))
            .select("__blk")
        )
        # see candidate_pairs: AQE-sized semi join, never a forced broadcast
        keyed = keyed.join(small, "__blk", "left_semi")
    a = keyed.select(
        F.col("__blk"), F.col(key_col).alias("key_a"), F.col("__cmp").alias("__cmp_a")
    )
    b = keyed.select(
        F.col("__blk"), F.col(key_col).alias("key_b"), F.col("__cmp").alias("__cmp_b")
    )
    dist = F.levenshtein(F.col("__cmp_a"), F.col("__cmp_b"))
    return (
        a.join(b, "__blk")
        .where(F.col("key_a") < F.col("key_b"))
        .where(dist <= F.lit(max_edit))
        .select("key_a", "key_b", dist.cast("int").alias("edit_dist"))
    )


def resolve_entities(
    records: DataFrame,
    matches: DataFrame,
    key_col: str,
) -> DataFrame:
    """Map every record onto its resolved canonical form: connected
    components over the match graph (label = MIN key, lexicographic for
    strings), unmatched forms canonical by themselves. Returns `records`
    plus (canonical, is_canonical_form). One hash join against the
    component table — the only contact the full corpus has with the
    resolution machinery."""
    cc = connected_components(matches, src="key_a", dst="key_b")
    canon = F.coalesce(F.col("label"), F.col(key_col))
    return (
        records.join(cc, records[key_col] == cc["node"], "left")
        .select(
            *[records[c] for c in records.columns],
            canon.alias("canonical"),
            (canon == F.col(key_col)).alias("is_canonical_form"),
        )
    )
