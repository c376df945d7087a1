"""Canonicalization — MinHash-blocked candidate pairs + iterative connected
components, resolved to a merge map.

The reference's analog is canonicalization-by-key (``NamespaceCreator.scala:
20-33``: groupBy name → one canonical node per group) plus the binding/alias
table resolution (``BindingTableCompat``); our domain needs *fuzzy* grouping:
near-duplicate canonical entity names (same entity_type, '_'-token Jaccard
≥ 0.5) are one entity. That is inherently a global, iterative computation —
the one place this engine runs a driver-controlled DataFrame loop (SURVEY.md
§4.2 item 3): large-star/small-star-style min-label propagation with
checkpointing to cut lineage, deterministic because the component
representative is the MIN canonical name (order-free tie-breaking).

Two blocking strategies produce candidate pairs; both are verified with the
exact Jaccard predicate before CC, so precision is exact:

- ``candidate_pairs_token_block`` — exact recall: self-join on
  (entity_type, token). Fine when per-token document frequency is bounded;
  a DF cap guards the quadratic blowup of stop-tokens at scale.
- ``candidate_pairs_lsh`` — the 100 TB path: k=32 MinHash, 16 bands × 2 rows;
  miss probability at the 0.5 threshold ≈ (1-0.25)^16 ≈ 1%, ≈ 0.08% at the
  observed twin similarity 2/3. Banding keys are md5-derived (cross-engine
  checkable), grouped map-side, no quadratic term outside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import minhash_signature

MERGE_JACCARD = 0.5
MINHASH_K = 32
LSH_BANDS = 16  # rows per band = MINHASH_K / LSH_BANDS = 2


def canonical_entities(alias_dict: DataFrame) -> DataFrame:
    """Distinct (canonical_name, entity_type, name_tokens array)."""
    return (
        alias_dict.select("canonical_name", "entity_type")
        .distinct()
        .withColumn("name_tokens", F.array_distinct(F.split("canonical_name", "_")))
    )


def _pairs_from_block(blocked: DataFrame) -> DataFrame:
    """Self-join a blocked frame (block_key, canonical_name, name_tokens) into
    ordered candidate pairs (a < b) with both token arrays carried along."""
    left = blocked.select(
        "block_key",
        F.col("canonical_name").alias("a"),
        F.col("name_tokens").alias("a_tokens"),
    )
    right = blocked.select(
        "block_key",
        F.col("canonical_name").alias("b"),
        F.col("name_tokens").alias("b_tokens"),
    )
    return (
        left.join(right, "block_key")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "a_tokens", "b_tokens")
        .dropDuplicates(["a", "b"])
    )


def candidate_pairs_token_block(
    alias_dict: DataFrame, max_token_df: int = 10000
) -> DataFrame:
    """Exact-recall blocking: entities sharing (entity_type, name-token).
    Tokens with document frequency > max_token_df are excluded from blocking
    (they cannot be the *only* shared token of a high-Jaccard pair in
    practice; the cap bounds the quadratic block size at scale)."""
    ents = canonical_entities(alias_dict)
    toks = ents.select(
        "canonical_name",
        "entity_type",
        "name_tokens",
        F.explode("name_tokens").alias("tok"),
    )
    df_counts = toks.groupBy("entity_type", "tok").agg(
        F.count("*").alias("token_df")
    )
    blocked = (
        toks.join(df_counts, ["entity_type", "tok"])
        .where(F.col("token_df") <= max_token_df)
        .withColumn("block_key", F.concat_ws("|", "entity_type", "tok"))
        .select("block_key", "canonical_name", "name_tokens")
    )
    return _pairs_from_block(blocked)


def candidate_pairs_lsh(alias_dict: DataFrame) -> DataFrame:
    """MinHash-LSH blocking: band signatures over name tokens; entities
    sharing (entity_type, band_idx, band_signature) become candidates."""
    rows_per_band = MINHASH_K // LSH_BANDS
    ents = canonical_entities(alias_dict).withColumn(
        "sig", minhash_signature("name_tokens", MINHASH_K)
    )
    bands = ents.select(
        "canonical_name",
        "entity_type",
        "name_tokens",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
                f"slice(sig, b * {rows_per_band} + 1, {rows_per_band}))"
            )
        ).alias("band_idx", "band_sig"),
    )
    blocked = bands.withColumn(
        "block_key",
        F.concat_ws(
            "|",
            "entity_type",
            F.col("band_idx").cast("string"),
            F.col("band_sig").cast("string"),
        ),
    ).select("block_key", "canonical_name", "name_tokens")
    return _pairs_from_block(blocked)


def verified_pairs(candidates: DataFrame, threshold: float = MERGE_JACCARD) -> DataFrame:
    """Exact token-Jaccard verification of candidate pairs → (a, b)."""
    inter = F.size(F.array_intersect("a_tokens", "b_tokens")).cast("double")
    union = F.size(F.array_union("a_tokens", "b_tokens")).cast("double")
    return candidates.where(inter / union >= F.lit(threshold)).select("a", "b")


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Min-label propagation CC. nodes: (name); edges: (a, b) undirected.
    Returns (name, component) with component = min name in the component.

    Driver-controlled loop of join+groupBy per hop; ``localCheckpoint`` every
    iteration cuts lineage (SURVEY.md §4.2: checkpoint cadence). Iterations
    needed = graph diameter; alias-merge components are tiny (pairs/paths),
    so convergence is 1-3 rounds. Deterministic: min() is order-free.
    """
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.dropDuplicates(["a", "b"]).localCheckpoint(eager=True)
    labels = nodes.select(F.col("name"), F.col("name").alias("component"))
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.a == labels.name)
            .groupBy(F.col("b").alias("name2"))
            .agg(F.min("component").alias("neigh_min"))
        )
        # the improved-this-round flag rides along instead of a second
        # old-vs-new comparison join: the checkpoint materializes it, so
        # the convergence probe is a limit-1 scan of the checkpoint leaf.
        new_labels = (
            labels.join(neigh, labels.name == neigh.name2, "left")
            .select(
                "name",
                F.least(
                    F.col("component"), F.coalesce("neigh_min", F.col("component"))
                ).alias("component"),
                (F.col("neigh_min") < F.col("component")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels


def lsh_missed_pairs(alias_dict: DataFrame) -> DataFrame:
    """Recall check for the LSH default: verified merge pairs that exact
    token blocking produces but MinHash-LSH blocking misses, as (a, b).
    Empty output = LSH has full recall on this dictionary. Run once per new
    dictionary version (entity-scale work, trivially cheap next to the token
    stream)."""
    exact = verified_pairs(candidate_pairs_token_block(alias_dict))
    lsh = verified_pairs(candidate_pairs_lsh(alias_dict))
    return exact.join(lsh, ["a", "b"], "left_anti")


def merge_map(alias_dict: DataFrame, use_lsh: bool = True) -> DataFrame:
    """(canonical_name, merged_name) for every canonical in the dictionary
    (identity rows included) — the canonicalization output contract,
    matching the frozen ``expected_components`` oracle.

    The DEFAULT blocking is MinHash-LSH (the 100 TB path). Token blocking
    degrades two ways on stop-token-heavy dictionaries: uncapped it admits
    O(df²) pairs per shared token, and its df-cap escape hatch LOSES true
    pairs whose only shared token was capped ('svc' vs 'svc_0', J=1/2).
    LSH collision probability depends on pair similarity, not token df, so
    neither failure mode applies (test_lsh_beats_token_blocking_on_stop_
    tokens). Both paths feed the same exact-Jaccard verify, so precision is
    identical; LSH recall at the 0.5 threshold is ≥ 99% in theory and
    exhaustively identical to token blocking on the shipped dictionary
    (test_merge_map_token_vs_lsh, kg_merge_map vs kg_merge_map_tokenblock
    driver rows).

    RECALL BOUND (public contract): LSH blocking is probabilistic — a true
    pair at exactly the 0.5 Jaccard threshold is missed with probability
    (1 - 0.5^2)^16 ≈ 1%, dropping fast as similarity rises. For a NEW
    dictionary, run :func:`lsh_missed_pairs` once (verified pairs token
    blocking finds that LSH does not; empty = full recall on that
    dictionary) before flipping production to the LSH default."""
    pairs = (
        candidate_pairs_lsh(alias_dict)
        if use_lsh
        else candidate_pairs_token_block(alias_dict)
    )
    good = verified_pairs(pairs)
    nodes = canonical_entities(alias_dict).select(
        F.col("canonical_name").alias("name")
    )
    cc = connected_components(nodes, good)
    return cc.select(
        F.col("name").alias("canonical_name"), F.col("component").alias("merged_name")
    )
