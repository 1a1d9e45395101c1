"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine near-dup —
all expressed as DataFrame plans (JVM-side functions, one shuffle per
logical step), no Python in the hot path.

Scale notes (10^9+ docs):
- Exact dedup is one hash-aggregate shuffle on a 64-bit digest (never on
  the raw text — group keys stay small).
- MinHash: shingles explode -> one groupBy(doc) computes all K permutation
  minima as K agg columns (map-side partial aggregation keeps the shuffle
  proportional to docs, not shingles). Band keys then bucket-join
  candidates; only same-bucket pairs are compared, which is the whole
  point of LSH at scale.
- SimHash: 64 bit-count aggregates per doc, then banded Hamming join.
- Near-dup joins always emit (a < b) canonical pairs to halve the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


# ---------------------------------------------------------------------------
# tokenization / shingling (shared)
# ---------------------------------------------------------------------------

def words_col(text: Column) -> Column:
    """Whitespace tokenization with empty-token hygiene.

    ``array_remove(split, '')`` rather than ``filter(split, w -> w != '')``:
    identical result (split emits no nulls, and after trim the only empty
    token is the one a fully-blank text produces), but array_remove stays
    in whole-stage codegen while a lambda filter falls back to interpreted
    per-element evaluation — measured ~20% faster over the tokenization
    (equality pinned by tests/test_dedup.py)."""
    return F.array_remove(F.split(F.trim(text), r"\s+"), "")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string> (JVM-side, zip-form).

    Built as ``arrays_zip(slice(ws,1,m), ..., slice(ws,k,m))`` + one
    concat per element rather than a transform over indices that slices
    ``ws`` per element: a lambda body referencing the tokenization
    expression re-evaluates the full split once PER SHINGLE (quadratic on
    long documents — the same trap lm._bigrams_col documents). The zip
    form evaluates the split O(k) times per row; output strings are
    identical (element i is ws[i..i+k-1] joined by single spaces either
    way)."""
    ws = words_col(text)
    n = F.size(ws)
    m = n - F.lit(k - 1)
    zipped = F.arrays_zip(
        *[F.slice(ws, j + 1, m).alias(f"w{j}") for j in range(k)]
    )
    joined = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(k)])
    )
    return F.when(n >= k, joined).otherwise(F.array(F.concat_ws(" ", ws)))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", key: Column | None = None
) -> DataFrame:
    """Exact duplicate grouping by content digest (hash-groupBy).

    Returns one row per distinct key: representative id (min), dup count.
    Grouping happens on ``xxhash64`` of the key, so the shuffle carries
    8-byte keys even for multi-KB documents.
    """
    key = key if key is not None else F.col("text")
    keyed = df.select(
        F.col(id_col), F.xxhash64(key).alias("content_hash")
    )
    return (
        keyed.groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
    )


def drop_exact_dups(df: DataFrame, id_col: str = "doc_id",
                    key: Column | None = None) -> DataFrame:
    """Keep only the representative row of each exact-duplicate group
    (window dedup — J5/D4 'last/first wins' shape)."""
    key = key if key is not None else F.col("text")
    w = W.partitionBy(F.xxhash64(key)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature: ``num_perm`` columns h0..h{K-1}.

    Permutation j is ``xxhash64(shingle, j)`` (independent 64-bit hash per
    seed); the signature is the per-doc minimum of each. One explode + one
    groupBy — partial (map-side) min aggregation means the shuffle is
    O(docs * K), independent of shingle count. (r6 note: an array_min
    over transform() formulation removes the shuffle but loses
    whole-stage codegen — higher-order functions evaluate interpreted —
    and measured ~40% slower; the explode stays.)
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles_col(F.col(text_col), k_shingle)).alias("sh"))
    )
    aggs = [
        F.min(F.xxhash64("sh", F.lit(j))).alias(f"h{j}") for j in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. Returns distinct (a, b) with a < b.

    Band key = xxhash64 over the band's signature slice; the self-join is
    an equi-join on (band, band_key) — co-partitioned, no cross product.
    The bucket frame is localCheckpoint-ed (eager) before the self-join:
    without it each join side re-derives the full signature subtree
    (scan + K hashes per shingle, twice — r5's plan did exactly that);
    with it signatures are computed once and the join reads the
    materialized O(docs * bands) small rows. Same pattern as
    cluster_pairs / ivf_train.
    """
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [f"h{b * rows + r}" for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols, F.lit(b)).alias("bkey"))
        )
    buckets = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bkey").localCheckpoint(eager=True)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bkey") == F.col(f"b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
        )
        .distinct()
    )


def drop_near_dup_candidates(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Greedy near-dup removal from candidate pairs: for every (a, b) pair
    (a < b by construction) the larger id drops — each duplicate cluster
    keeps its smallest id without an iterative connected-components pass
    (the standard web-dedup compromise: transitive chains collapse toward
    the minimum over repeated LSH bands in practice). One broadcast-able
    distinct + anti-join."""
    losers = pairs.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def minhash_dedup_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    sigs = minhash_signatures(df, id_col, text_col, k_shingle, num_perm)
    return lsh_candidate_pairs(sigs, id_col, num_perm, bands)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pair similarity — the LSH verifier)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct word k-shingles for all pairs sharing at
    least one shingle. Shingle-inverted-index self-join: candidate pairs
    are generated per shingle (co-partitioned equi-join), intersection
    counts per pair, union by inclusion-exclusion.

    At web scale this runs AFTER LSH banding (on candidates); standalone it
    is quadratic in the worst case — callers bound the input.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), k_shingle))).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "n_inter", "n_a", "n_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc: per-token 64-bit hash votes +1/-1 per bit;
    the sign of each bit-sum forms the fingerprint.

    Expressed as ``nbits`` conditional-sum aggregates over exploded tokens
    (all JVM-side; map-side partial aggregation applies).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("tok"),
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(nbits):
        fp = fp + F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_candidates(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming.

    Pigeonhole banding: split 64 bits into ``bands`` chunks; any pair
    within distance ``max_hamming < bands`` agrees exactly on >= 1 chunk,
    so candidates come from equi-joins on chunk values (no cross product),
    then exact popcount filtering.
    """
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    chunks = fingerprints.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("ck"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", "c.band", "c.ck")
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a"),
            F.col(f"b.{id_col}").alias("b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_sim_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side
    (zip_with product + aggregate sum — no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine >= threshold — the EXACT baseline.

    Full pairwise (range self-join a<b): O(N^2) distance evals, fine for
    verification corpora only. The scale path is
    ``similarity.bucketed_near_dups`` (banded hyperplane LSH -> (band,
    bucket) equi-join -> cosine filter), which returns a subset of these
    pairs with recall ~1 at the default 8x4 bands.
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = v.alias("a")
    b = v.alias("b")
    cos = cosine_sim_col(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> connected components -> canonical docs
# ---------------------------------------------------------------------------

def cluster_pairs(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Transitive closure of a near-duplicate pair graph: connected
    components by iterative min-label propagation, returning
    ``(doc_id, cluster_id)`` where ``cluster_id`` is the smallest doc id
    in the component — the canonical representative every dedup pipeline
    keys on (pairs alone under-dedup: A~B and B~C does NOT emit A~C).

    Plan shape per round: labels ⋈ edges (one shuffle on id) ->
    min-aggregate (map-side partial) -> convergence check (a single
    COUNT row to the driver — bounded). Rounds needed = component
    DIAMETER, and LSH near-dup components are band-clique-ish (tiny
    diameter), so 3-5 rounds cover real corpora; ``max_rounds`` caps
    adversarial chains. Each round re-derives labels from the previous
    frame only (no growing lineage: localCheckpoint every round breaks
    the plan chain so round N's DAG is O(1), not O(N) — the standard
    iterative-algorithm hygiene on Spark, same as ivf_train).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_transitive(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Full-corpus cluster assignment + canonical flag: every doc gets
    its ``cluster_id`` (itself when it appears in no near-dup pair) and
    ``is_canonical`` (true for the one smallest-id doc per cluster —
    the row a dedup pipeline KEEPS). One broadcast-or-shuffle left join
    of the corpus against the (far smaller) clustered-pairs frame."""
    labels = cluster_pairs(pairs, a_col, b_col, max_rounds)
    return docs.select(F.col(id_col).alias("doc_id")).join(
        labels, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    ).withColumn(
        "is_canonical", (F.col("doc_id") == F.col("cluster_id"))
    )


# ---------------------------------------------------------------------------
# paragraph-level dedup (CCNet/Dolma-style boilerplate removal)
# ---------------------------------------------------------------------------

def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_dup_docs: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """Drop paragraphs that recur (normalized-exact) across >=
    min_dup_docs distinct documents — the boilerplate-removal stage
    (nav bars, cookie banners, footers) webtext pipelines run at
    paragraph granularity where document-level dedup can't reach.

    Plan shape at scale: posexplode paragraphs -> count distinct docs
    per md5(normalized paragraph) (one hash-agg shuffle on 32-byte
    keys, map-side partial agg) -> join back (paragraph traffic, not
    documents) -> re-assemble surviving paragraphs in original order
    with one groupBy(doc). Returns (id, clean_text, n_paras_kept,
    n_paras_dropped); empty docs keep a row with clean_text = ''.
    """
    norm = lambda c: F.md5(F.trim(F.lower(c)))  # noqa: E731
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("pkey", norm(F.col("para")))
    counts = paras.groupBy("pkey").agg(
        F.count_distinct("id").alias("n_docs")
    )
    flagged = paras.join(counts, "pkey").withColumn(
        "drop", F.col("n_docs") >= min_dup_docs
    )
    return flagged.groupBy(F.col("id").alias(id_col)).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "drop", "para"))
                    ),
                    lambda s: ~s["drop"],
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.sum(F.when(F.col("drop"), 0).otherwise(1)).cast("long").alias("n_paras_kept"),
        F.sum(F.when(F.col("drop"), 1).otherwise(0)).cast("long").alias("n_paras_dropped"),
    )


# ---------------------------------------------------------------------------
# exact duplicated-span removal (ExactSubstr-style, Lee et al. 2021)
# ---------------------------------------------------------------------------

def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 13,
    min_count: int = 2,
) -> DataFrame:
    """Remove every k-token span whose exact content occurs >= min_count
    times corpus-wide — the token-granular ExactSubstr dedup of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2021), re-expressed as rolling-window hashing instead of a
    suffix array: same removal semantics for fixed k, but every stage is
    a Spark-native shuffle (the suffix array is a single-machine
    construction that cannot shard at 10^12 docs; windowed hashing is
    embarrassingly parallel).

    Plan shape at scale: transform+posexplode k-token windows ->
    md5 window keys (window traffic = n_tokens rows/doc, 32-byte keys)
    -> one hash-agg shuffle counting occurrences (map-side partial agg)
    -> join flagged keys back (only duplicated spans travel) -> one
    groupBy(doc) re-assembly. Removal keeps tokens covered by NO
    duplicated window; overlapping spans union naturally through the
    coverage test. All pure Column ops (higher-order functions) — the
    exists() coverage check is O(tokens x flagged-spans-in-doc) per doc,
    fine because flagged spans per doc are few; docs that are pure
    boilerplate degrade to an empty clean_text, which downstream length
    gates drop.

    Returns (id, n_tokens, n_dup_spans, n_removed, clean_text) where
    clean_text is the surviving tokens joined by single spaces
    (tokenization is whitespace-normalizing by design, same contract as
    words_col).
    """
    id_, ws = F.col(id_col), words_col(F.col(text_col))
    docs = df.select(id_.alias("id"), ws.alias("ws"))
    n = F.size("ws")

    wkeys = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.md5(F.concat_ws(" ", F.slice("ws", i + 1, k))),
    )
    # Both consumers (corpus-wide key counts AND per-doc flagged starts)
    # read `wins`; localCheckpoint materializes the window keys once
    # instead of re-tokenizing + re-hashing the whole corpus per consumer
    # (the r5 plan computed the scan->posexplode->md5 subtree twice).
    wins = docs.filter(n >= k).select(
        "id", F.posexplode(wkeys).alias("start", "wkey")
    ).localCheckpoint(eager=True)
    dup_keys = (
        wins.groupBy("wkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("wkey")
    )
    starts = (
        wins.join(dup_keys, "wkey")
        .groupBy("id")
        .agg(F.array_sort(F.collect_set("start")).alias("starts"))
    )

    covered = lambda j: F.exists(  # noqa: E731
        F.col("starts"), lambda s: (s <= j) & (j < s + k)
    )
    kept = F.filter(
        F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda j: ~covered(j),
    )
    return (
        docs.join(starts, "id", "left")
        .withColumn(
            "starts",
            F.coalesce(F.col("starts"), F.array().cast("array<int>")),
        )
        .select(
            F.col("id").alias(id_col),
            n.cast("long").alias("n_tokens"),
            F.size("starts").cast("long").alias("n_dup_spans"),
            (n - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda j: F.element_at("ws", j + 1)), " "
            ).alias("clean_text"),
        )
    )
