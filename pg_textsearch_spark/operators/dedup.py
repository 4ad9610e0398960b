"""Deduplication operators for training-data pipelines.

The standard dedup families, each Spark-first (built-in expressions +
shuffle-conscious join shapes) with a DuckDB oracle-SQL twin for the
driver's correctness gate:

- ``exact_dedup``          — sha256 hash-groupBy (exact duplicate clusters)
- ``ngram_jaccard_pairs``  — word-n-gram shingle inverted-index self-join
                             (``max_shingle_df`` hot-key cap = the scale guard)
- ``minhash_signatures`` / ``minhash_candidate_pairs`` — MinHash + LSH banding
- ``simhash`` / ``simhash_pairs`` — 32-bit SimHash + pigeonhole-exact banded
                             hamming pair generation
- ``embedding_dup_pairs``  — cosine near-duplicate pairs (exact baseline);
  ``embedding_dup_pairs_blocked`` — sign-LSH banded candidate generation
- ``dedup_clusters``       — connected components over any pair graph
                             (min-label propagation; recursive-CTE twin)

Determinism: all hashing is the md5-derived 32-bit hash (``hash32_col``)
computable bit-identically in Spark and DuckDB — no engine-specific hash
functions, so the same signatures/buckets arise in both. At 100 TB scale the
pair-generating joins are bounded by bucketing (LSH bands / shingle postings
with frequency capping), never a cartesian product; the brute-force shapes
here are the small-scale oracle baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import WORD_RE, hash32_col, hash32_sql

# ------------------------------------------------------------------ exact

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate clusters by content sha256: one row per distinct
    content, keeper = min doc_id. The 100 TB shape: map-side partial agg on
    the hash then one shuffle keyed by sha256 — no text comparison ever."""
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    F.sha2(F.col(text_col), 256).alias("content_sha256"))
            .groupBy("content_sha256")
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count("*").alias("n_copies"))
            .orderBy("keeper_doc_id"))


def exact_dedup_oracle_sql(table: str = "documents", text_col: str = "text",
                           id_col: str = "doc_id") -> str:
    return f"""
SELECT sha256({text_col}) AS content_sha256,
       MIN({id_col}) AS keeper_doc_id,
       count(*)::BIGINT AS n_copies
FROM {table}
GROUP BY 1 ORDER BY keeper_doc_id
"""


# ----------------------------------------------------- shingles (shared)

NGRAM_N = 3


def _shingle_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, shingles ARRAY<STRING>) with distinct word-3-gram shingles.

    The word array is materialized in its own projection BEFORE the shingle
    transform: referencing the regexp_extract_all expression inside the
    lambda would re-evaluate the regex per element_at (3 x n_words regex
    scans per doc)."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("words"))
    w = F.col("words")
    # zip_with over shifted slices: each input array is evaluated once per
    # row. (A transform(sequence, i -> element_at(words, i+j)) formulation
    # re-evaluates the words expression per element once array_distinct
    # wraps it — ~20x slower at 5k docs.)
    w2 = F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0)))
    w3 = F.slice(w, 3, F.greatest(F.size(w) - 2, F.lit(0)))
    z12 = F.zip_with(w, w2, lambda x, y: F.concat(x, F.lit(" "), y))
    z123 = F.zip_with(z12, w3, lambda x, y: F.concat(x, F.lit(" "), y))
    shingles = F.array_distinct(
        F.slice(z123, 1, F.greatest(F.size(w) - (NGRAM_N - 1), F.lit(0))))
    # filter on the cheap words-size predicate, not on size(shingles): a
    # filter over the shingle column would inline (and so re-evaluate) the
    # whole shingle expression in the Filter node
    return (base.filter(F.size(w) >= NGRAM_N)
            .select("doc_id", shingles.alias("shingles")))


_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "range(1, GREATEST(len(words) - {nm1}, 0) + 1), "
    "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))"
).format(nm1=NGRAM_N - 1)


def _shingle_base_sql(table: str, text_col: str, id_col: str) -> str:
    return f"""
base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS words
  FROM {table}
),
shing AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM base WHERE len(words) >= {NGRAM_N}
)"""


# -------------------------------------------------- n-gram Jaccard pairs

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.2,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        max_shingle_df: int | None = None) -> DataFrame:
    """Near-dup pairs with word-3-gram Jaccard >= threshold via the
    inverted-index self-join: explode shingles, join docs sharing a shingle
    (the only shuffle is keyed by shingle), count shared, Jaccard from the
    per-doc distinct counts.

    ``max_shingle_df`` is the 100 TB guard: shingles appearing in more than
    this many docs are dropped from the JOIN KEY (the hot-key cap — one
    shingle shared by 10^6 docs would otherwise emit 10^12 join rows, the
    same reason the BM25 index shards mega-terms). The hot set is tiny by
    definition, so the cap is a broadcast anti-join = a map-side filter.
    Shared counts (numerator) then undercount by the dropped shingles while
    denominators keep the full sizes, so capped Jaccard is a LOWER bound —
    recall loss only on pairs whose overlap is mostly ultra-common
    boilerplate. ``None`` (default) disables the cap: the exact oracle
    baseline."""
    sh = _shingle_frame(docs, text_col, id_col)
    sizes = sh.select("doc_id", F.size("shingles").cast("long").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        hot = (ex.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_shingle_df).select("shingle"))
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    pairs = (ex.alias("a").join(ex.alias("b"), "shingle")
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("shared")))
    out = (pairs
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                      .withColumnRenamed("n_sh", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                      .withColumnRenamed("n_sh", "n_b"), "doc_b")
           .select("doc_a", "doc_b",
                   F.round(F.col("shared") /
                           (F.col("n_a") + F.col("n_b") - F.col("shared")),
                           4).alias("jaccard"))
           .filter(F.col("jaccard") >= threshold)
           .orderBy("doc_a", "doc_b"))
    return out


def ngram_jaccard_pairs_oracle_sql(threshold: float = 0.2,
                                   table: str = "documents",
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   max_shingle_df: int | None = None) -> str:
    cap_cte = ""
    if max_shingle_df is not None:
        cap_cte = f"""
exall AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing),
hot AS (SELECT shingle FROM exall GROUP BY shingle
        HAVING count(*) > {max_shingle_df}),
ex AS (SELECT * FROM exall WHERE shingle NOT IN (SELECT shingle FROM hot)),"""
    else:
        cap_cte = "\nex AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing),"
    return f"""
WITH {_shingle_base_sql(table, text_col, id_col)},{cap_cte}
sizes AS (SELECT doc_id, len(shingles)::BIGINT AS n_sh FROM shing),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       ROUND(p.shared / (sa.n_sh + sb.n_sh - p.shared)::DOUBLE, 4) AS jaccard
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE ROUND(p.shared / (sa.n_sh + sb.n_sh - p.shared)::DOUBLE, 4) >= {threshold}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------- MinHash + LSH

NUM_HASHES = 8
BAND_SIZE = 2  # -> 4 bands


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature: mh_i = min over shingles of
    hash32(i || ':' || shingle). One explode + one groupBy — the signature
    computation is a map-side-combinable aggregation (shuffle carries 8
    ints per doc, not the shingles)."""
    sh = _shingle_frame(docs, text_col, id_col)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(hash32_col(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
        .alias(f"mh_{i}")
        for i in range(NUM_HASHES)
    ]
    return ex.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def _mh_sql_cols() -> str:
    cols = []
    for i in range(NUM_HASHES):
        expr = hash32_sql("'" + str(i) + ":' || shingle")
        cols.append("MIN(" + expr + ") AS mh_" + str(i))
    return ",\n         ".join(cols)


def minhash_signatures_oracle_sql(table: str = "documents",
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> str:
    return f"""
WITH {_shingle_base_sql(table, text_col, id_col)},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing)
SELECT doc_id,
         {_mh_sql_cols()}
FROM ex GROUP BY doc_id ORDER BY doc_id
"""


def _cap_band_buckets_sql(keys: list[str],
                          max_band_docs: int | None) -> str:
    """SQL twin of ``_cap_band_buckets``: rewrites ``bands`` from
    ``bands0``, dropping buckets above the cap (empty string when off —
    callers then name their band CTE ``bands`` directly)."""
    if max_band_docs is None:
        return ""
    on = " AND ".join(f"b.{k} = h.{k}" for k in keys)
    return f""",
hot AS (SELECT {", ".join(keys)} FROM bands0
        GROUP BY {", ".join(keys)} HAVING count(*) > {max_band_docs}),
bands AS (SELECT b.* FROM bands0 b LEFT JOIN hot h ON {on}
          WHERE h.{keys[0]} IS NULL)"""


def minhash_candidate_pairs_oracle_sql(table: str = "documents",
                                       text_col: str = "text",
                                       id_col: str = "doc_id",
                                       max_band_docs: int | None = None) -> str:
    n_bands = NUM_HASHES // BAND_SIZE
    band_rows = []
    for bnd in range(n_bands):
        parts = " || '_' || ".join(
            f"mh_{bnd * BAND_SIZE + j}::VARCHAR" for j in range(BAND_SIZE))
        band_rows.append(
            f"SELECT doc_id, {bnd} AS band, md5({parts}) AS bkey, "
            + ", ".join(f"mh_{i}" for i in range(NUM_HASHES))
            + " FROM sig")
    bands_sql = "\n  UNION ALL\n  ".join(band_rows)
    eq = " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(NUM_HASHES))
    bname = "bands0" if max_band_docs is not None else "bands"
    return f"""
WITH {_shingle_base_sql(table, text_col, id_col)},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM shing),
sig AS (
  SELECT doc_id,
         {_mh_sql_cols()}
  FROM ex GROUP BY doc_id
),
{bname} AS (
  {bands_sql}
){_cap_band_buckets_sql(["band", "bkey"], max_band_docs)}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(({eq}) / {float(NUM_HASHES)}, 4) AS est_jaccard
FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
WHERE a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


def _cap_band_buckets(bands: DataFrame, keys: list[str],
                      max_band_docs: int | None) -> DataFrame:
    """Hot-bucket guard shared by the LSH pair generators: drop band
    buckets holding more than ``max_band_docs`` members from the self-join.

    Crawl corpora carry 10^5-10^6-copy exact-duplicate clusters; every copy
    lands in the SAME band bucket, so an uncapped bucket self-join emits
    |bucket|^2 rows — 10^12 for one mega-cluster. A bucket that large is by
    construction an exact-duplicate (or boilerplate) cluster, which
    ``exact_dedup``/``dedup_clusters`` handle at O(n); dropping it bounds
    the join fanout to max_band_docs^2 per bucket. Members can still pair
    through their other (smaller) bands. The hot set has at most
    n/max_band_docs entries, so the guard is a broadcast anti-join — a
    map-side filter, same shape as ``max_shingle_df``."""
    if max_band_docs is None:
        return bands
    hot = (bands.groupBy(*keys).agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_band_docs).select(*keys))
    return bands.join(F.broadcast(hot), keys, "left_anti")


def minhash_candidate_pairs(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_band_docs: int | None = None) -> DataFrame:
    """LSH banding: band key = hash of BAND_SIZE consecutive signature
    entries; candidate pair = docs sharing any band bucket; est_jaccard =
    fraction of equal signature entries. The join is keyed by (band, key) —
    bucket sizes bound the fanout, the classic LSH scale shape.

    ``max_band_docs`` is the 100 TB hot-bucket guard (see
    ``_cap_band_buckets``): band buckets larger than the cap — exact-dup
    mega-clusters — are excluded from the join. ``None`` disables it (the
    exact oracle baseline)."""
    # materialize the signatures once: they feed 2 join sides x n_bands
    # band rows, and recomputing them re-runs the shingle explode + 8 md5
    # aggregations. localCheckpoint (not persist) so the cached blocks are
    # reclaimed by the ContextCleaner when the result DataFrame is dropped
    # — a plain persist() stays registered in the CacheManager forever in
    # long-lived sessions. eager=False piggybacks the materialization on the
    # caller's first action instead of paying a separate upfront job
    # (measured ~equal to persist, unlike eager=True's +4-6s at sf0.1).
    sig = minhash_signatures(docs, text_col, id_col).localCheckpoint(eager=False)
    band_structs = F.array(*[
        F.struct(
            F.lit(bnd).alias("band"),
            F.md5(F.concat_ws("_", *[
                F.col(f"mh_{bnd * BAND_SIZE + j}").cast("string")
                for j in range(BAND_SIZE)])).alias("bkey"))
        for bnd in range(NUM_HASHES // BAND_SIZE)])
    allb = (sig.select("doc_id",
                       *[F.col(f"mh_{i}") for i in range(NUM_HASHES)],
                       F.explode(band_structs).alias("bb"))
            .select("doc_id", *[F.col(f"mh_{i}") for i in range(NUM_HASHES)],
                    F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")))
    allb = _cap_band_buckets(allb, ["band", "bkey"], max_band_docs)
    a, b = allb.alias("a"), allb.alias("b")
    eq = sum(
        F.when(F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES))
    pairs = (a.join(b, ["band", "bkey"])
             .filter(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.round(eq / F.lit(float(NUM_HASHES)), 4)
                     .alias("est_jaccard"))
             .distinct()
             .orderBy("doc_a", "doc_b"))
    return pairs


# ------------------------------------------------------------- SimHash

SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash: per distinct token, 32-bit hash32; bit b of the
    fingerprint set iff Σ_tokens tf·(2·bit_b(h)−1) > 0. Implemented as
    explode(term) × posexplode(bits) → two map-side-combinable aggs."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    toks = (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(words).alias("w"))
            .groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
            .withColumn("h", hash32_col(F.col("w"))))
    bits = toks.select(
        "doc_id", "tf", "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"))
    per_bit = (bits
               .withColumn("v", F.col("tf") *
                           (F.expr("shiftright(h, bit) & 1") * 2 - 1))
               .groupBy("doc_id", "bit").agg(F.sum("v").alias("sv")))
    return (per_bit
            .groupBy("doc_id")
            .agg(F.sum(F.when(F.col("sv") > 0,
                              F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                       .otherwise(F.lit(0))).alias("simhash"))
            .orderBy("doc_id"))


def simhash_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, w, count(*)::BIGINT AS tf
  FROM (SELECT {id_col},
               unnest(regexp_extract_all(lower({text_col}), '{WORD_RE}')) AS w
        FROM {table})
  GROUP BY 1, 2
),
hashed AS (SELECT doc_id, tf, {hash32_sql('w')} AS h FROM toks),
bits AS (
  SELECT doc_id, b.bit,
         SUM(tf * (((h >> b.bit) & 1) * 2 - 1))::BIGINT AS sv
  FROM hashed, (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit) b
  GROUP BY 1, 2
)
SELECT doc_id,
       SUM(CASE WHEN sv > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


SIMHASH_BANDS = 4   # 4 bytes: hamming <= 3 pairs share >= 1 exact band


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_band_docs: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, generated WITHOUT an
    all-pairs comparison: split the 32-bit fingerprint into 4 exact-match
    bands of 8 bits (pigeonhole: any pair with hamming <= 3 differs in at
    most 3 bands, so shares at least one), self-join on (band, value) —
    the only shuffle key, bucket sizes bound the fanout — then verify the
    true distance with bit_count(xor). Returns (doc_a, doc_b, hamming).

    ``max_band_docs``: hot-bucket guard — band buckets larger than the cap
    (exact-dup mega-clusters, which would make the bucket join quadratic)
    are excluded; see ``_cap_band_buckets``. NOTE: with the cap on, the
    pigeonhole recall guarantee holds only for pairs outside dropped
    buckets."""
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("banding guarantees recall only for "
                         f"max_hamming < {SIMHASH_BANDS}")
    # localCheckpoint, not persist: GC-reclaimed when the result is dropped
    sig = simhash(docs, text_col, id_col).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright(F.col("simhash"), i * 8)
                     .bitwiseAND(F.lit(255)).alias("bval"))
            for i in range(SIMHASH_BANDS)])).alias("bb")) \
        .select("doc_id", "simhash", F.col("bb.band").alias("band"),
                F.col("bb.bval").alias("bval"))
    bands = _cap_band_buckets(bands, ["band", "bval"], max_band_docs)
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")).cast("long"))
    return (a.join(b, ["band", "bval"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
            .orderBy("doc_a", "doc_b"))


def simhash_pairs_oracle_sql(max_hamming: int = 3, table: str = "documents",
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             max_band_docs: int | None = None) -> str:
    inner = simhash_oracle_sql(table, text_col, id_col).strip()
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash >> {i * 8}) & 255 AS bval FROM sig"
        for i in range(SIMHASH_BANDS))
    bname = "bands0" if max_band_docs is not None else "bands"
    return f"""
WITH sig AS (
{inner}
),
{bname} AS (
  {band_rows}
){_cap_band_buckets_sql(["band", "bval"], max_band_docs)}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


# -------------------------------------------- embedding cosine near-dups

def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for a DataFrame (file bytes for parquet
    scans) — the planner's own broadcast-sizing statistic, costs no job.
    Falls back to 'too big' if the internal API ever moves, which only
    flips the caller to the always-correct repartitioned plan."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan()
                   .stats().sizeInBytes())
    except Exception:
        return 1 << 62

def embedding_dup_pairs(embs: DataFrame, threshold: float = 0.9,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Near-dup pairs by cosine similarity >= threshold. Small-scale oracle
    baseline is the full self-join; the scale path blocks candidates by LSH
    /IVF buckets first (see operators.similarity). Dot/norm are strict
    left-fold F.aggregate over doubles — bit-identical to the DuckDB oracle's
    list_sum fold."""
    v = F.col(vec_col).cast("array<double>")
    base = embs.select(F.col(id_col).alias("vec_id"), v.alias("v"),
                       _norm_col(v).alias("nrm"))
    # the `<` theta-join is a nested-loop join: broadcast one side, spread
    # the stream side across tasks (a single parquet file would otherwise
    # serialize the whole O(n^2) pass into one partition). Broadcast only
    # while the vector payload plausibly fits (driver memory / Spark's 8 GB
    # broadcast ceiling); beyond that fall back to the repartitioned
    # non-broadcast nested-loop plan.
    par = max(embs.sparkSession.sparkContext.defaultParallelism, 8)
    a = base.repartition(par, "vec_id").alias("a")
    # size the broadcast from Catalyst's own plan statistics (file-size
    # based for parquet sources) instead of a driver count()+first() pair —
    # zero extra jobs, and it's the same estimate Spark's planner uses for
    # its broadcast decisions
    if _plan_size_bytes(embs) <= 512 * 1024 * 1024:
        b = F.broadcast(base).alias("b")
    else:
        b = base.repartition(par).alias("b")
    cos = _dot_col(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cos, 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
            .orderBy("vec_a", "vec_b"))


EMB_BANDS = 8       # 64-dim vectors -> 8 bands of 8 sign bits
EMB_BAND_BITS = 8


def _sign_band_col(j: int, band_bits: int = EMB_BAND_BITS):
    """Band value j: pack the sign bits of dims [j*bits, (j+1)*bits) into an
    int. Pure comparisons + integer adds — bit-identical in DuckDB."""
    bits = [F.when(F.col("v").getItem(j * band_bits + i) >= 0,
                   F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(band_bits)]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _sign_band_sql(j: int, band_bits: int = EMB_BAND_BITS) -> str:
    return " + ".join(
        f"(CASE WHEN v[{j * band_bits + i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(band_bits))


def embedding_dup_pairs_blocked(embs: DataFrame, threshold: float = 0.9,
                                vec_col: str = "embedding",
                                id_col: str = "vec_id",
                                n_bands: int = EMB_BANDS,
                                band_bits: int = EMB_BAND_BITS,
                                max_band_docs: int | None = None) -> DataFrame:
    """Embedding near-dup pairs WITHOUT the n^2 theta-join — the 100 TB
    path. Random-hyperplane (sign-bit) LSH: each vector's signature is the
    sign pattern of its coordinates, split into ``n_bands`` exact-match
    bands of ``band_bits`` bits; candidate pairs share at least one band
    (the only shuffle key — bucket sizes bound the join fanout), then the
    exact cosine is verified. High-cosine pairs agree on most signs, so
    recall decays smoothly with the threshold; vs the exact baseline this
    is a candidate-generation recall trade-off, measured in
    tests/test_round2_features.py. Same output schema as
    ``embedding_dup_pairs`` so the two are directly comparable."""
    v = F.col(vec_col).cast("array<double>")
    base = embs.select(F.col(id_col).alias("vec_id"), v.alias("v"),
                       _norm_col(v).alias("nrm"))
    # band rows carry ONLY (vec_id, band, bval): the exploded table and
    # the collision shuffle stay narrow; vectors join back per UNIQUE
    # candidate pair, so the O(dim) cosine fold runs once per pair, not
    # once per band collision (a true near-dup collides in most bands)
    bands = base.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("band"),
                     _sign_band_col(j, band_bits).alias("bval"))
            for j in range(n_bands)])).alias("bb")) \
        .select("vec_id", F.col("bb.band").alias("band"),
                F.col("bb.bval").alias("bval"))
    bands = _cap_band_buckets(bands, ["band", "bval"], max_band_docs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, ["band", "bval"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"))
            .distinct())
    va = base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                     F.col("nrm").alias("na"))
    vb = base.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                     F.col("nrm").alias("nb"))
    cos = _dot_col(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (cand.join(va, "vec_a").join(vb, "vec_b")
            .select("vec_a", "vec_b", F.round(cos, 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
            .orderBy("vec_a", "vec_b"))


def embedding_dup_pairs_blocked_oracle_sql(threshold: float = 0.9,
                                           dim: int = 64,
                                           table: str = "embeddings",
                                           vec_col: str = "embedding",
                                           id_col: str = "vec_id",
                                           n_bands: int = EMB_BANDS,
                                           band_bits: int = EMB_BAND_BITS,
                                           max_band_docs: int | None = None) -> str:
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, v, nrm, {j} AS band, "
        f"{_sign_band_sql(j, band_bits)} AS bval FROM base"
        for j in range(n_bands))
    dot = DOT_SQL.format(dim=dim, a="a.v", b="b.v")
    bname = "bands0" if max_band_docs is not None else "bands"
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {table}
),
{bname} AS (
  {band_rows}
){_cap_band_buckets_sql(["band", "bval"], max_band_docs)}
SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({dot} / (a.nrm * b.nrm), 4) AS cos
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
WHERE ROUND({dot} / (a.nrm * b.nrm), 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


def _dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm_col(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


DOT_SQL = ("list_sum(list_transform(range(1, {dim} + 1), "
           "i -> ({a})[i] * ({b})[i]))")
NORM_SQL = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def embedding_dup_pairs_oracle_sql(threshold: float = 0.9, dim: int = 64,
                                   table: str = "embeddings",
                                   vec_col: str = "embedding",
                                   id_col: str = "vec_id") -> str:
    dot = DOT_SQL.format(dim=dim, a="a.v", b="b.v")
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {table}
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({dot} / (a.nrm * b.nrm), 4) AS cos
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE ROUND({dot} / (a.nrm * b.nrm), 4) >= {threshold}
ORDER BY vec_a, vec_b
"""


# ------------------------------------------------ near-dup clustering

def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   min_sim: float | None = None,
                   sim_col: str = "est_jaccard",
                   id_col: str = "doc_id",
                   max_iters: int = 20) -> DataFrame:
    """Connected components over a near-dup pair graph: every document gets
    ``cluster_id`` = the minimum doc_id of its component (singletons map to
    themselves). This is the keep-one-per-cluster step after any pair
    generator (minhash/simhash/embedding).

    Min-label propagation: per round, each node takes the minimum label
    among itself and its neighbors; converges in O(component diameter)
    rounds — near-dup components are clique-ish, so 2-3 rounds in
    practice. The loop is a bounded DRIVER control loop (one count() per
    round for the convergence test); per-round lineage is cut with
    localCheckpoint so plans stay flat at scale. Shuffles are keyed by
    doc_id throughout — no all-pairs anything."""
    if min_sim is not None:
        pairs = pairs.filter(F.col(sim_col) >= min_sim)
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.union(pairs.select(F.col("doc_b").alias("src"),
                                   F.col("doc_a").alias("dst"))).persist()
    labels = docs.select(F.col(id_col).alias("doc_id"),
                         F.col(id_col).cast("long").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    changed = None
    for _ in range(max_iters):
        prop = (edges.join(labels, edges.src == labels.doc_id)
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("label").alias("nbr_min")))
        new = (labels.join(prop, "doc_id", "left")
               .select("doc_id",
                       F.least(F.col("label"),
                               F.coalesce(F.col("nbr_min"), F.col("label")))
                       .alias("label")))
        new = new.localCheckpoint(eager=True)
        changed = (new.alias("n").join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    if changed:
        # a component with diameter > max_iters has NOT converged — its
        # labels are silently wrong relative to the connected-components
        # contract (and the recursive-CTE oracle). Fail loudly rather than
        # return a wrong clustering.
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing): the pair graph has a "
            "component with diameter > max_iters; raise max_iters")
    return (labels.select("doc_id", F.col("label").alias("cluster_id"))
            .orderBy("doc_id"))


def dedup_clusters_oracle_sql(pairs_sql: str, min_sim: float | None = None,
                              sim_col: str = "est_jaccard",
                              table: str = "documents",
                              id_col: str = "doc_id") -> str:
    """Recursive-CTE twin: cluster_id(d) = MIN over nodes reachable from d
    (symmetric edges + self), exactly the fixpoint of min-label
    propagation. ``pairs_sql``: any pair-generator oracle SQL with
    (doc_a, doc_b, {sim_col}) output."""
    simf = f"WHERE {sim_col} >= {min_sim}" if min_sim is not None else ""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS t FROM pairs {simf}
  UNION ALL
  SELECT doc_b AS s, doc_a AS t FROM pairs {simf}
),
reach AS (
  SELECT {id_col} AS d, {id_col} AS r FROM {table}
  UNION
  SELECT re.d, e.t FROM reach re JOIN edges e ON e.s = re.r
)
SELECT d AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY d
ORDER BY doc_id
"""
