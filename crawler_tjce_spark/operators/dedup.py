"""Deduplication operators for the training-data pipeline.

All candidate generation is JVM-side (hash/array expressions + shuffles
on band keys); no per-row Python. Verification of candidate pairs uses
exact set arithmetic on shingle arrays (``array_intersect`` /
``array_union``), also JVM-side.

Scale notes (10^11-document corpora):
* exact/fingerprint dedup — one shuffle on an 8/16-byte key;
* MinHash LSH — cost is dominated by the band-key shuffle; band keys
  are 8-byte hashes so the shuffle is narrow. Bucket skew (a viral
  boilerplate string) is bounded by ``lsh_max_bucket``: oversized
  buckets are dropped and logged, the standard web-dedup practice.
* SimHash — 64 bit-vote aggregations are one map-side-combinable
  groupBy; banding on 16-bit chunks bounds the pair candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_tjce_spark.functions.text import shingles, ws_tokens


# ---------------------------------------------------------------------------
# Exact / fingerprint dedup
# ---------------------------------------------------------------------------

def normalize_text(col: Column | str) -> Column:
    """Whitespace-collapse + lowercase — the exact-dedup identity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized text (deterministic
    representative — matches a SQL ``GROUP BY`` oracle, unlike
    ``dropDuplicates`` whose survivor is partition-order dependent)."""
    norm = normalize_text(text_col).alias("_norm")
    keep = (
        df.select(norm, F.col(id_col))
        .groupBy("_norm")
        .agg(F.min(id_col).alias(id_col))
        .drop("_norm")
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """Per-document MinHash signature as ``num_hashes`` long columns.

    h_i(doc) = min over shingles s of xxhash64(s, i). The per-seed hash
    family reuses the built-in ``xxhash64`` by appending the seed index
    as an extra hashed column — one explode + one map-side-combinable
    groupBy; signature width costs columns, not passes.
    """
    ex = df.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("_sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("_sh"), F.lit(i))).alias(f"mh{i}") for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    lsh_max_bucket: int = 1000,
) -> DataFrame:
    """Band the signature, bucket-join, emit candidate pairs (a<b).

    Each band key = xxhash64 of that band's rows → narrow shuffle key.
    Buckets larger than ``lsh_max_bucket`` are dropped (skew guard; at
    web scale these are boilerplate clusters handled by exact dedup).
    """
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bkey")))
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    # skew guard: drop oversized buckets
    sizes = banded.groupBy("band", "bkey").agg(F.count(F.lit(1)).alias("_n"))
    banded = banded.join(
        sizes.filter(F.col("_n") <= lsh_max_bucket).drop("_n"), ["band", "bkey"], "left_semi"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(
    pairs: DataFrame, docs: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (adds ``jaccard``).

    Joins the (distinct) shingle arrays back to both sides; set ops are
    ``array_intersect``/``array_union`` sizes — JVM-side.
    """
    sh = docs.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_k)).alias("_sh")
    )
    return (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sh", "_sha"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sh", "_shb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb")).cast("double")
            / F.size(F.array_union("_sha", "_shb")),
        )
        .drop("_sha", "_shb")
    )


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with Jaccard ≥ threshold (MinHash→LSH→verify)."""
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_k)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    return jaccard_verify(cand, df, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for bounded candidate sets / oracle parity)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float, shingle_k: int = 3
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold.

    Candidate generation: documents sharing ≥1 shingle (explode +
    self-equi-join on the shingle hash — the sparse-similarity-join
    trick; never a cross join). Pairs sharing no shingle have J=0 and
    can't pass any positive threshold.

    Intersection sizes come from COUNTING the join matches per pair
    (each shared distinct shingle contributes exactly one joined row),
    so J = shared / (|A| + |B| − shared) with no per-pair array
    arithmetic — measured ~4× faster than ``array_intersect`` on the
    sf0.1 documents table, and the shuffle key stays an 8-byte hash.
    """
    # persist: the shingle expression (tokenize + slice + join per doc)
    # dominates cost and this plan consumes it three times (sizes + both
    # join sides) — measured 3× the whole query without the cache
    sh = (
        df.select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, shingle_k))).alias("_s"),
        )
        .withColumn("_s", F.xxhash64("_s"))
        .persist()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("_n", "_na"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("_n", "_nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("_shared").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document, fully JVM-side.

    Token hash = xxhash64(token); bit b votes +1 if set else −1; the
    sign of the vote sum sets the output bit. Implemented as one
    explode + 64 conditional-sum aggregates (map-side combinable).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.transform(ws_tokens(text_col), F.lower)).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(0)
        )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ max_hamming.

    Banding: split the 64-bit hash into 4×16-bit chunks; any pair within
    Hamming ≤3 must agree on ≥1 chunk (pigeonhole) → equi-join per chunk,
    then exact ``bit_count(xor)`` verify.
    """
    s = simhash(df, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("ckey"),
            )
            for i in range(4)
        ]
    )
    banded = s.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ckey").alias("ckey")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicate
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold over an embedding column.

    Exact all-pairs via self-join (correct baseline; the scale path
    prunes candidates with the LSH bucketing in ``similarity.py``).
    Dot products use ``zip_with``+``aggregate`` — JVM-side, no UDF.
    """
    n = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        F.sqrt(
            F.aggregate(
                F.col(vec_col),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("_norm"),
    )
    a, b = n.alias("a"), n.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a._v"), F.col("b._v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (dot / (F.col("a._norm") * F.col("b._norm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
