"""Document deduplication operators (SURVEY.md §2-K).

The training-data-pipeline extension (BASELINE.json north star): exact
dedup via content hash, near-dup via MinHash-LSH banding, SimHash
fingerprints, and exact n-gram/token Jaccard verification of LSH
candidates. Scale design notes per operator; all shuffles key on content
hashes, which are uniform by construction (no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load


def normalized_text(col: str = "text"):
    """lowercase -> trim -> collapse internal whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


@register(
    "k_text_normalize",
    oracle="""
    SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
    FROM documents
    """,
)
def k_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-step every dedup shares)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", normalized_text().alias("norm"))


@register(
    "k_exact_dedup",
    oracle="""
    SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h,
           min(doc_id) AS keep, count(*) AS dups
    FROM documents
    GROUP BY 1
    """,
)
def k_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on md5(normalized text): one group per distinct
    content, keeper = min doc_id, multiplicity = dups.

    At 100 TB: group keys are 128-bit hashes (uniform -> no skew); the
    shuffle moves only (hash, doc_id), never the text itself.
    """
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return (
        d.groupBy(h.alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("dups"))
    )


@register(
    "k_jaccard_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS tset
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.tset, b.tset))), 6) AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tset, b.tset)) AS DOUBLE)
          / len(list_distinct(list_concat(a.tset, b.tset))) >= 0.6
    """,
)
def k_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard similarity >= 0.6 within a language —
    the ground-truth verifier for LSH candidates.

    Blocked on `lang` so the self-join is per-block O(n_b^2), not global
    O(n^2); at 100 TB the block key becomes (lang, length-band, LSH
    bucket) and this same pair-scorer runs on candidates only.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("tset")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tset"), F.col("b.tset")))
    union = F.size(F.array_union(F.col("a.tset"), F.col("b.tset")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.6)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def lsh_candidate_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_dist: float = 0.4,
    num_tables: int = 8,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (doc_a < doc_b, seeded).

    Tokenize -> HashingTF (binary=True: set semantics for Jaccard) ->
    MinHashLSH approxSimilarityJoin on Jaccard *distance* <= max_dist.
    Spark's MinHashLSH ORs `num_tables` single-hash tables: a true pair
    of similarity s is missed with probability (1-s)^num_tables, so the
    candidate recall is tunable per caller (8 tables -> 0.4^8 ~ 7e-4 miss
    at the 0.6-similarity edge threshold; 16 -> 4e-7)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = Tokenizer(inputCol="text", outputCol="tokens").transform(d)
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True
    ).transform(tokens)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42
    )
    model = lsh.fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, max_dist, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


@register("k_near_dedup_lsh")
def k_near_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH (seeded).

    Rows-only (LSH is probabilistic); `k_jaccard_pairs` is the exact
    verifier. At 100 TB this is THE dedup path: candidates are generated
    by band-bucket join instead of any O(n^2) comparison.
    """
    return lsh_candidate_pairs(spark, sf_dir)


@register("k_simhash")
def k_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints from token hashes (rows-only: the
    fingerprint depends on Spark's xxhash64, which has no DuckDB twin).

    Pure DataFrame ops: explode tokens -> xxhash64 -> per-bit +/-1 votes
    aggregated with sum(CASE) -> recombine bits. Near-dups then reduce to
    a cheap equi-join on fingerprint bands (Hamming-adjacent blocks), the
    same shuffle shape as exact dedup — no pairwise comparisons.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(normalized_text(), " "))).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    # shiftleft, not a Python literal: 1 << 63 overflows LongType as a
    # literal but wraps to the sign bit correctly as a JVM shift.
    def mask(b: int):
        return F.shiftleft(F.lit(1).cast("long"), b)

    votes = [
        F.sum(
            F.when(F.col("th").bitwiseAND(mask(b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig.bitwiseOR(F.when(F.col(f"b{b}") > 0, mask(b)).otherwise(F.lit(0).cast("long")))
    return per_doc.select("doc_id", sig.alias("simhash64"))


@register(
    "k_ngram_jaccard",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    sh AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, len(t)),
                                            i -> t[i] || ' ' || t[i+1])) AS g
        FROM toks
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
          / len(list_distinct(list_concat(a.g, b.g))) >= 0.3
    """,
)
def k_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram (2-shingle) Jaccard near-dup pairs — order-sensitive
    where token-set Jaccard (`k_jaccard_pairs`) is not: shared shingles
    require shared adjacency, the standard n-gram dedup family.

    Blocked on `lang` like the token verifier; at 100 TB the shingle sets
    feed MinHash (`k_near_dedup_lsh`) and this exact scorer runs only on
    LSH candidates. Shingling itself is a JVM higher-order function
    (`transform` over an index `sequence`) — no Python, no extra shuffle.
    """
    d = load(spark, sf_dir, "documents")
    t = F.split("text", " ")
    shingles = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat(element_at(split(text, ' '), i), ' ',"
            "             element_at(split(text, ' '), i + 1)))"
        )
    )
    sh = d.where(F.size(t) >= 2).select("doc_id", "lang", shingles.alias("g"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.g"), F.col("b.g")))
    union = F.size(F.array_union(F.col("a.g"), F.col("b.g")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jac >= 0.3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
