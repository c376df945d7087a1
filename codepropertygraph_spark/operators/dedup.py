"""Deduplication operators for large-scale training-data pipelines.

Four families over the ``documents`` table, all built from JVM-side
expressions (no Python in the hot path) with md5-derived hashing so every
value is independently computable by the DuckDB oracle:

- **exact**:     hash-groupBy on the full text (one shuffle of (hash, id)).
- **MinHash+LSH**: word-shingles → k minhashes → banded signatures →
  bucket-join candidates → exact-Jaccard verify. The 100 TB path: candidate
  generation is a groupBy on band keys (no quadratic term outside buckets);
  the verify join carries shingle arrays only for candidates.
- **SimHash**:   per-token md5 bit votes aggregated per doc → compact
  bit-signature; near-dups share signatures (hamming-adjacent buckets at
  scale).
- **n-gram Jaccard**: exact all-pairs within blocks — the small-scale ground
  truth the probabilistic variants are tested against.

The reference's closest analog is identity-based DiffGraph node dedup
(``DiffGraph.scala:220-226``) and canonicalization-by-key
(``NamespaceCreator.scala:20-33``); these operators generalize that to
near-duplicate text identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MINHASH_K = 8
LSH_BANDS = 4  # rows per band = 2
SHINGLE_N = 3
SIMHASH_BITS = 16


def _shingles_expr(toks_col: str = "toks", n: int = SHINGLE_N) -> str:
    """Spark SQL: distinct word n-gram shingles of an array<string> column.
    Guarded for short docs (Spark's sequence() runs DESCENDING if end <
    start, so the guard is required, not cosmetic)."""
    parts = ", ' ', ".join(
        f"element_at({toks_col}, i + {j})" for j in range(n)
    ).join(["concat(", ")"])
    return (
        f"if(size({toks_col}) >= {n}, "
        f"array_distinct(transform(sequence(1, size({toks_col}) - {n - 1}), i -> {parts})), "
        f"array_distinct({toks_col}))"
    )


def with_shingles(documents: DataFrame) -> DataFrame:
    return documents.withColumn("toks", F.split("text", " ")).withColumn(
        "sh", F.expr(_shingles_expr())
    )


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """(text_hash, n_docs, keeper): exact-dup groups; keeper = min doc_id
    (deterministic survivor, the reference's sort-before-pick discipline)."""
    return documents.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper")
    )


def minhash_bands(documents: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_sig): LSH band signatures. Map-only stage."""
    rows_per_band = MINHASH_K // LSH_BANDS
    h = (
        "cast(conv(substr(md5(concat('s', cast(j as string), '|', t)), 1, 15), 16, 10) as bigint)"
    )
    sig = f"transform(sequence(0, {MINHASH_K - 1}), j -> array_min(transform(sh, t -> {h})))"
    d = with_shingles(documents).withColumn("sig", F.expr(sig))
    bands = F.expr(
        f"transform(sequence(0, {LSH_BANDS - 1}), b -> "
        f"concat_ws('-', slice(sig, b * {rows_per_band} + 1, {rows_per_band})))"
    )
    return d.select(
        "doc_id", F.posexplode(bands).alias("band_idx", "band_sig")
    ).select("doc_id", F.col("band_idx").cast("long").alias("band_idx"), "band_sig")


def minhash_pairs(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """(a, b, jacc): near-dup pairs — LSH-blocked candidates verified with
    exact shingle Jaccard ≥ threshold. jacc rounded to 6dp for stability."""
    bands = minhash_bands(documents)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band_idx", "band_sig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # one materialization for the two verify-join sides (the jaccard_prefix
    # discipline; the banding side recomputes its own signatures map-side)
    sh = (
        with_shingles(documents)
        .select("doc_id", "sh")
        .localCheckpoint(eager=True)
    )
    pair_sh = (
        cand.join(sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a")
        .join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    jacc = inter / union.cast("double")
    return (
        pair_sh.withColumn("jacc", F.round(jacc, 6))
        .where(F.col("jacc") >= threshold)
        .select("a", "b", "jacc")
    )


def conversation_documents(transcripts: DataFrame) -> DataFrame:
    """Render each conversation as ONE document row (doc_id=conv_id,
    text=turn texts joined in the stable (turn_idx, ts) order) so the whole
    document dedup family — exact, MinHash/LSH, SimHash, clusters —
    applies unchanged to the transcripts payload: retrieval-cached
    assistants and retried agent runs produce near-identical CONVERSATIONS,
    and training on them double-counts exactly like duplicated documents.

    Scale shape: one two-phase aggregate per conversation —
    ``sort_array(collect_list(struct(order, text)))`` is the repo's stable
    array-side ordering (per-group state bounded by conversation length,
    the same bound every per-conversation pass already carries); the
    downstream dedup operators then see a corpus whose row count is the
    CONVERSATION count, typically 100-1000x smaller than the turn table.
    """
    from . import ordering

    ot = ordering.ordered_turns(transcripts)
    return ot.groupBy("conv_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("turn_order", "text"))),
                lambda s: s["text"],
            ),
        ).alias("text")
    ).select(F.col("conv_id").alias("doc_id"), "text")


def conversation_near_dup_pairs(
    transcripts: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """(a, b, jacc): near-duplicate CONVERSATION pairs — the transcript-
    payload instantiation of minhash_pairs over conversation_documents
    (LSH-banded candidates, exact shingle-Jaccard verification)."""
    return minhash_pairs(conversation_documents(transcripts), threshold)


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact all-pairs shingle Jaccard ≥ threshold — the ground truth for the
    probabilistic variants (cross join; small-scale / per-block use only)."""
    sh = with_shingles(documents).select("doc_id", "sh")
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.sh").alias("sh_a"),
            F.col("y.sh").alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.withColumn("jacc", F.round(inter / union.cast("double"), 6))
        .where(F.col("jacc") >= threshold)
        .select("a", "b", "jacc")
    )


def near_dup_clusters(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """(doc_id, cluster_rep): connected components over the verified
    near-dup pair graph — the cluster table a dedup policy consumes (keep
    one representative per cluster). Reuses the canonicalization CC solver
    (min-label propagation, deterministic representative = min doc_id);
    singleton documents map to themselves."""
    from .canonicalize import connected_components

    pairs = minhash_pairs(documents, threshold).select(
        F.col("a").cast("string").alias("a"), F.col("b").cast("string").alias("b")
    )
    nodes = documents.select(F.col("doc_id").cast("string").alias("name"))
    # zero-pad for lexicographic == numeric ordering of the min label
    pad = lambda c: F.lpad(c, 20, "0")  # noqa: E731
    cc = connected_components(
        nodes.select(pad(F.col("name")).alias("name")),
        pairs.select(pad(F.col("a")).alias("a"), pad(F.col("b")).alias("b")),
    )
    return cc.select(
        F.col("name").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_rep"),
    )


def simhash(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): per-token md5 bit votes → sign → packed signature.
    Explode + two-phase groupBy (partial agg map-side); everything JVM-side.
    """
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


_PAIR_COS = (
    "round((aggregate(zip_with(x_emb, y_emb, (p, q) -> cast(p as double) * cast(q as double)), cast(0 as double), (acc, v) -> acc + v)) / "
    "((sqrt(aggregate(transform(x_emb, p -> cast(p as double) * cast(p as double)), cast(0 as double), (acc, v) -> acc + v))) * "
    "(sqrt(aggregate(transform(y_emb, p -> cast(p as double) * cast(p as double)), cast(0 as double), (acc, v) -> acc + v)))), 6)"
)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.45, hamming: int = 1
) -> DataFrame:
    """(a, b, cos): embedding-cosine near-dup pairs over a BUCKETED candidate
    set — the 100 TB shape: sign-bit LSH buckets (``similarity.lsh_buckets``,
    map-only, md5-derived hyperplanes so the DuckDB oracle can reproduce
    them), candidates = pairs whose buckets are within hamming ≤ ``hamming``
    (multi-probe via one-side bucket-flip expansion → pure equi-join, no
    inequality cross join), then the exact double-precision cosine verify
    inside the candidate set.

    Approximate by construction (a pair differing in ≥ 2 bucket bits is
    never considered); recall vs the exact kernel is MEASURED in
    tests/test_data_ops.py::test_embedding_near_dup_bucketed_recall.
    """
    from .similarity import lsh_buckets, probe_buckets_expr

    b = lsh_buckets(embeddings)
    probes = b.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("y_emb"),
        F.explode(F.expr(probe_buckets_expr("bucket", hamming=hamming))).alias(
            "probe"
        ),
    )
    orig = b.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("x_emb"),
        F.col("bucket"),
    )
    cand = (
        orig.join(probes, (F.col("bucket") == F.col("probe")) & (F.col("a") < F.col("b")))
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn("cos", F.expr(_PAIR_COS))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.45
) -> DataFrame:
    """(a, b, cos): exact all-pairs kernel — the ground truth the bucketed
    operator's recall is measured against. O(n²): small-scale / per-block
    use only (at 100 TB this is the verify kernel INSIDE buckets, never the
    global plan)."""
    e = embeddings.select("vec_id", "embedding")
    pairs = (
        e.alias("x")
        .join(e.alias("y"), F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("a"),
            F.col("y.vec_id").alias("b"),
            F.col("x.embedding").alias("x_emb"),
            F.col("y.embedding").alias("y_emb"),
        )
    )
    return (
        pairs.withColumn("cos", F.expr(_PAIR_COS))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def decontaminate(
    documents: DataFrame, benchmark: DataFrame, n: int = SHINGLE_N
) -> DataFrame:
    """Benchmark decontamination: count each corpus document's distinct
    word n-gram shingles that also appear in a benchmark set (eval-suite
    leakage check; the standard pre-training hygiene pass next to dedup).

    Returns (doc_id, n_shared_shingles, contaminated).

    100 TB shape: the benchmark side is eval-sized, so its distinct
    shingle set is aggregated once and BROADCAST; the corpus side explodes
    shingles map-only and probes the broadcast — the only shuffle is the
    doc-sized hit-count aggregation. No corpus-vs-corpus term anywhere.
    """
    bsh = (
        with_shingles(benchmark)
        .select(F.explode("sh").alias("shingle"))
        .dropDuplicates(["shingle"])
    )
    csh = with_shingles(documents).select(
        "doc_id", F.explode("sh").alias("shingle")
    )
    hits = (
        csh.join(F.broadcast(bsh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias(
                "n_shared_shingles"
            ),
            (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def jaccard_prefix_pairs(
    documents: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """EXACT Jaccard ≥ threshold similarity self-join via prefix filtering
    (the AllPairs/PPJoin candidate scheme) — same output as
    ``ngram_jaccard_pairs`` with no all-pairs term, making exact near-dup
    detection feasible at corpus scale (MinHash trades recall for speed;
    this trades nothing).

    The filter: order every document's distinct shingles by ascending
    GLOBAL frequency (rarest first, ties by shingle text); a doc with
    ``s`` shingles emits only its first ``s - ceil(t*s) + 1`` as candidate
    keys. Two docs with Jaccard ≥ t must share at least one key from BOTH
    prefixes (if all prefix tokens of one were missing from the other, the
    overlap is too small to reach t), so the equi-join on prefix tokens
    loses nothing — and the frequent "stop shingles" that would blow up a
    naive token-bucket join sort to the END of every ordering, so they
    almost never enter a prefix: candidate buckets stay small BY
    CONSTRUCTION, the opposite of the skew a plain shingle-bucket join
    invites. Candidates are then verified with exact Jaccard on the
    shingle arrays (one broadcast-or-shuffle join each side).

    100 TB: one frequency agg + one per-doc sort (bounded by doc length) +
    a bucket join whose buckets are rare-token-sized + candidate-count
    verify joins.
    """
    # the shingle frame feeds THREE consumers (the token explode and both
    # verify-join sides); one eager materialization beats re-running the
    # split+transform+distinct map per consumer (measured ~30% of the
    # operator at sf0.1).
    sh = (
        with_shingles(documents)
        .select("doc_id", "sh")
        .localCheckpoint(eager=True)
    )
    tok = sh.select(
        "doc_id", F.size("sh").alias("s_len"), F.explode("sh").alias("shingle")
    )
    freq = tok.groupBy("shingle").agg(F.count("*").alias("gf"))
    ranked = (
        tok.join(freq, "shingle")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("gf", "shingle")
            ),
        )
        .where(
            # ceil of the EXACT product: in double, 0.8*10 is
            # 8.000000000000000444 and a bare ceil inflates to 9, emitting a
            # one-short prefix that can miss qualifying pairs at exact
            # threshold boundaries; rounding to 9 dp first restores the
            # AllPairs bound s - ceil(t*s) + 1 for every rational threshold.
            F.col("rk")
            <= F.col("s_len")
            - F.ceil(F.round(F.lit(threshold) * F.col("s_len"), 9))
            + 1
        )
        .select("doc_id", "shingle")
    )
    cand = (
        ranked.alias("x")
        .join(ranked.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    pair_sh = cand.join(
        sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a")), "a"
    ).join(sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b")), "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    )
    return (
        pair_sh.withColumn("jacc", F.round(inter / union.cast("double"), 6))
        .where(F.col("jacc") >= threshold)
        .select("a", "b", "jacc")
    )


def duplicate_spans(documents: DataFrame, k: int = 5) -> DataFrame:
    """Exact duplicate-substring detection: for every document, the merged
    token spans covered by some k-token window that occurs MORE THAN ONCE
    anywhere in the corpus — the substring-level dedup signal (train-set
    boilerplate, repeated headers/licenses) that document-level dedup
    can't see.

    Returns (doc_id, n_tokens, n_dup_tokens, n_spans): total tokens, how
    many sit inside a duplicated run, and how many maximal runs there are.

    Shape for scale: rolling k-token windows are generated JVM-side per
    document (transform over sequence — map-only, output ~n_tokens rows),
    duplicated window hashes come from ONE two-phase count agg, and span
    merging is the gaps-and-islands window per doc (each partition bounded
    by document length). Window hashes are md5 so the whole computation is
    engine-reproducible; no token text survives the shuffle — only
    (doc_id, position, hash).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    d = documents.withColumn("toks", F.split("text", " ")).withColumn(
        "ws",
        F.expr(
            f"if(size(toks) >= {k}, "
            f"transform(sequence(1, size(toks) - {k - 1}), i -> "
            f"named_struct('s', i, 'wh', md5(concat_ws(' ', slice(toks, i, {k}))))), "
            f"array())"
        ),
    )
    w = d.select("doc_id", F.explode("ws").alias("w")).select(
        "doc_id",
        F.col("w.s").cast("long").alias("s"),
        (F.col("w.s") + (k - 1)).cast("long").alias("e"),
        F.col("w.wh").alias("wh"),
    )
    dup = (
        w.groupBy("wh").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    )
    dw = w.join(dup.select("wh"), "wh").select("doc_id", "s", "e")
    win = Window.partitionBy("doc_id").orderBy("s")
    # e is strictly increasing in s (fixed k), so lag(e) == running max
    pe = F.lag("e").over(win)
    g = dw.withColumn(
        "gid",
        F.sum(
            F.when(pe.isNull() | (F.col("s") > pe + 1), 1).otherwise(0)
        ).over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    islands = g.groupBy("doc_id", "gid").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.sum(F.col("ee") - F.col("ss") + 1).cast("long").alias("n_dup_tokens"),
        F.count("*").cast("long").alias("n_spans"),
    )
    return (
        documents.select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias(
                "n_dup_tokens"
            ),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )
