"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shape:
* exact dedup = hash groupBy (map-side combine; shuffle on digest)
* MinHash/LSH = shingle explode -> per-doc signature agg -> band bucket
  groupBy -> candidate pairs only within buckets (never all-pairs)
* SimHash = token explode -> per-bit majority agg -> bucket on hash
* n-gram Jaccard = inverted-index self-join on shared shingles (pairs
  with zero overlap are never materialized)

All hashes derive from md5 hex (engine-portable), so every operator is
DuckDB-oracle-checkable.  At 100 TB the shuffles key on digests/buckets,
which are uniform by construction — no skew; AQE coalesces the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE = (1 << 61) - 1

# deterministic (a, b) parameter table for the k minhash permutations.
# a, b < 2^28 so a*h + b with a 32-bit shingle hash stays < 2^61 (no signed
# overflow in either Spark or DuckDB BIGINT arithmetic).
def _minhash_params(k: int) -> list[tuple[int, int]]:
    params = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    mask = (1 << 28) - 1
    for i in range(k):
        params.append((((a * (i + 1)) & mask) | 1, (b * (i + 1) + i) & mask))
    return params


def shingle_hash(col: Column) -> Column:
    """Portable 32-bit hash of a shingle: first 8 md5 hex digits."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_dedup(documents: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest key per identical text (digest groupBy)."""
    return (documents
            .withColumn("digest", F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")))
            .groupBy("digest")
            .agg(F.min(key_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def _exploded_shingles(documents: DataFrame, text_col: str, key_col: str,
                       n: int) -> DataFrame:
    """(key, shingle) rows — distinct n-grams via sequence+transform (JVM)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    df = documents.select(F.col(key_col), norm.alias("__norm"))
    grams = F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(length(__norm) - {n - 1}, 1)), "
        f"i -> substr(__norm, i, {n}))"))
    return df.select(key_col, F.explode(grams).alias("shingle"))


def minhash_signatures(documents: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", n: int = 5,
                       num_hashes: int = 16) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of k affine permutations
    of the portable shingle hash."""
    ex = _exploded_shingles(documents, text_col, key_col, n)
    h = shingle_hash(F.col("shingle"))
    aggs = [F.min((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE)).alias(f"mh{i}")
            for i, (a, b) in enumerate(_minhash_params(num_hashes))]
    return ex.groupBy(key_col).agg(*aggs)


def minhash_lsh_buckets(documents: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id", n: int = 5,
                        num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """(band, bucket_digest, key) rows: docs sharing a bucket in any band are
    near-duplicate candidates."""
    sig = minhash_signatures(documents, text_col, key_col, n, num_hashes)
    rows_per_band = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)]
        out.append(sig.select(
            F.col(key_col), F.lit(b).alias("band"),
            F.md5(F.concat_ws("_", *cols)).alias("bucket")))
    df = out[0]
    for other in out[1:]:
        df = df.unionByName(other)
    return df


def minhash_candidate_pairs(documents: DataFrame, text_col: str = "text",
                            key_col: str = "doc_id", n: int = 5,
                            num_hashes: int = 16, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs = same bucket in >= 1 band (deduped)."""
    b = minhash_lsh_buckets(documents, text_col, key_col, n, num_hashes, bands)
    l = b.select(F.col("band"), F.col("bucket"), F.col(key_col).alias("id_a"))
    r = b.select(F.col("band"), F.col("bucket"), F.col(key_col).alias("id_b"))
    return (l.join(r, ["band", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def simhash(documents: DataFrame, text_col: str = "text",
            key_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Per-doc SimHash over tokens: bit b set iff the sum over tokens of
    (+1 if bit b of token-hash set else -1) is positive."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    ex = documents.select(F.col(key_col), F.explode(toks).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    ex = ex.withColumn("h", h)
    bit_sums = [
        F.sum(F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1).cast("long")) == 1,
                     1).otherwise(-1)).alias(f"s{b}")
        for b in range(bits)]
    agg = ex.groupBy(key_col).agg(*bit_sums)
    sh = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sh = term if sh is None else sh + term
    return agg.select(key_col, sh.alias("simhash"))


def ngram_jaccard_pairs(documents: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id", n: int = 5,
                        threshold: float = 0.5,
                        df_cap: int | None = 100_000) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle
    (inverted-index join; |A|,|B| precomputed, intersection counted once).

    df_cap bounds the document frequency of any shingle entering the
    self-join: a "stop shingle" shared by 10^6 docs would emit 10^12 pairs
    for that single key and detonate one reducer at 100 TB.  Shingles with
    df > df_cap are dropped from the INTERSECTION counting only (set sizes
    stay exact), so reported Jaccard is a lower bound for pairs sharing a
    hot shingle and exact otherwise.  With df_cap >= the corpus's true max
    df the output is bit-identical to the uncapped join.  df_cap=None
    disables the cap (exact, unsafe at scale)."""
    ex = _exploded_shingles(documents, text_col, key_col, n)
    sizes = ex.groupBy(key_col).agg(F.count(F.lit(1)).alias("sz"))
    exj = ex
    if df_cap is not None:
        keep = (ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= df_cap).select("shingle"))
        exj = ex.join(keep, "shingle", "semi")
    l = exj.select(F.col("shingle"), F.col(key_col).alias("id_a"))
    r = exj.select(F.col("shingle"), F.col(key_col).alias("id_b"))
    inter = (l.join(r, "shingle").where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    sz_a = sizes.select(F.col(key_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(key_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(F.broadcast(sz_a), "id_a").join(F.broadcast(sz_b), "id_b")
            .withColumn("jaccard", F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def verified_near_dup_pairs(documents: DataFrame, text_col: str = "text",
                            key_col: str = "doc_id", n: int = 5,
                            num_hashes: int = 16, bands: int = 4,
                            threshold: float = 0.8) -> DataFrame:
    """MinHash-LSH candidates verified by EXACT n-gram Jaccard — the
    production near-dup shape: the LSH band join bounds candidate
    generation (never all-pairs), then the exact similarity is computed
    ONLY for candidates, so false-positive bucket collisions (template-
    heavy corpora collide constantly) never cause a false drop.

    Output: (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    pairs = minhash_candidate_pairs(documents, text_col, key_col, n,
                                    num_hashes, bands)
    ex = _exploded_shingles(documents, text_col, key_col, n)
    sizes = ex.groupBy(key_col).agg(F.count(F.lit(1)).alias("sz"))
    ea = ex.select(F.col(key_col).alias("id_a"), "shingle")
    eb = ex.select(F.col(key_col).alias("id_b"), "shingle")
    inter = (pairs.join(ea, "id_a")                  # shingles of a, per pair
             .join(eb, ["id_b", "shingle"])          # kept iff also in b
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    sz_a = sizes.select(F.col(key_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(key_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(F.broadcast(sz_a), "id_a").join(F.broadcast(sz_b), "id_b")
            .withColumn("jaccard", F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
