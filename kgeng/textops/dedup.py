"""Deduplication family for training-data curation:

- exact (hash groupBy),
- n-gram Jaccard (shingle self-join),
- MinHash + LSH (banded signature bucket-join),
- SimHash (bitwise, xxhash64-based — Spark-only),
- embedding-cosine near-dup.

The driver's ``documents``/``embeddings`` tables contain no natural
duplicates, so each op runs over a *derived corpus with closed-form
duplicates*: the table unioned with a perturbed copy of itself
(ids shifted by +10000; near-dup texts drop their first token; copy
embeddings are exact). Both the Spark side and the DuckDB oracle build
the same corpus, so expected dup pairs are known exactly.

Scale notes: every op here is a shuffle-on-key plan (no cross join
except where the pair count is provably bounded); MinHash bands turn
the quadratic candidate space into |bands|·|docs| rows; the shingle
self-join is bounded by shingle frequency (salt/AQE handle hot
shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgeng.io.scanmeta import needs_ingest_spread

JACCARD_THRESHOLD = 0.6
N_MINHASH = 16
BAND_SIZE = 4
COSINE_DUP_THRESHOLD = 0.999
SIMHASH_BITS = 64
# Hot-shingle document-frequency cap: a shingle present in more than
# MAX_SHINGLE_DF documents (a stop-phrase at web scale) is dropped from
# the shingle sets BEFORE sizes/Jaccard/MinHash, on both engines, so
# the shingle self-join pair space stays linear in |docs| instead of
# quadratic in the hottest shingle's frequency.
MAX_SHINGLE_DF = 500
# Hot-bucket cap for SimHash banding: near-boilerplate corpora push
# thousands of documents into one 16-bit band key (measured: a single
# 562-doc bucket = 157k pairs at sf0.1), turning the band self-join
# quadratic. Buckets above the cap are dropped — their members are
# boilerplate clusters that exact dedup already collapses — identically
# on both engines.
MAX_SIMHASH_BUCKET = 200


# ---------------------------------------------------------------------------
# Derived corpora with known duplicates
# ---------------------------------------------------------------------------


def dup_text_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ near-dup copies (id+10000, first token dropped).

    The compressed source lands in one input split (maxPartitionBytes
    is a byte budget) while the downstream shingle explode multiplies
    rows ~100×, so we repartition at ingest — the same medicine the
    main pipeline applies — to spread the shingling/hashing work across
    every core before the fan-out."""
    path = f"{sf_dir}/documents.parquet"
    d = spark.read.parquet(path).select("doc_id", "text")
    if needs_ingest_spread(spark, path):
        d = d.repartition(spark.sparkContext.defaultParallelism)
    perturbed = d.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.unionByName(perturbed)


def dup_embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ exact copies (id+10000); repartitioned at ingest
    (single compressed split otherwise serializes the per-vector
    bucket/norm arithmetic)."""
    path = f"{sf_dir}/embeddings.parquet"
    e = spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if needs_ingest_spread(spark, path):
        e = e.repartition(spark.sparkContext.defaultParallelism)
    return e.unionByName(
        e.select((F.col("vec_id") + 10000).alias("vec_id"), "v")
    )


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------


def shingles_df(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct word-3-gram shingles per document."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.when(n >= 3, F.sequence(F.lit(1), n - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return corpus.select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))


def capped_shingles(sh: DataFrame, max_df: int = MAX_SHINGLE_DF) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    The hot set is tiny by construction (few shingles are that
    frequent), so the exclusion is a broadcast anti-join — one linear
    pass to count, one map-side filter."""
    hot = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    return sh.join(F.broadcast(hot), "sh", "left_anti")


def _trunc4(c):
    # floor-truncation instead of round(): identical doubles floor
    # identically on every engine, while round() half-up vs half-even
    # diverges at exact .5 boundaries (e.g. jaccard = 1/32)
    return F.floor(c * 10000) / 10000


def _jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """All (doc_a < doc_b) pairs sharing >=1 shingle, with exact
    Jaccard over distinct shingle sets. The pair space is bounded by
    shingle document frequency — feed this CAPPED shingles."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _trunc4(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _jaccard_for_pairs(sh: DataFrame, pairs: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard computed ONLY for the given candidate ``pairs``
    (doc_a, doc_b) — never the full shingle self-join.

    Plan: per-doc shingle sets (one linear groupBy), then two id-keyed
    joins to attach both sets to each candidate, with the intersection
    as a map-side ``array_intersect``. Cost is |pairs| · avg set size,
    linear in the candidate count — the property LSH banding buys."""
    # three consumers (both id projections and the verify joins) —
    # materialize the candidate pairs once
    pairs = pairs.localCheckpoint(eager=False)
    # collect_set only for docs that appear in a candidate pair: the
    # LSH property says candidates are a vanishing fraction of the
    # corpus, so building shingle-set arrays for EVERY doc (the old
    # plan's heaviest aggregate) wastes |corpus| - |candidates| of the
    # work; the semi-join pre-filter is a broadcast of the candidate
    # id set (bounded by 2·|pairs|)
    cand_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    doc_sets = (
        sh.join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("shset"), F.count("*").alias("sz"))
        .localCheckpoint(eager=False)
    )
    a = doc_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shset").alias("set_a"), F.col("sz").alias("sz_a")
    )
    b = doc_sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shset").alias("set_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            _trunc4(inter / (F.col("sz_a") + F.col("sz_b") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Query-surface ops
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-fingerprint groupBy; emit duplicate groups with
    the kept representative (min id)."""
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = corpus.unionByName(
        corpus.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    return (
        corpus.select("doc_id", F.md5(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def _shingles_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df-capped shingles with the RAW shingle explode materialized
    once (lazy localCheckpoint): every consumer of the shingle set
    references it at least twice (the cap's hot-count + anti-join
    probe, then signatures/sizes/doc-sets), and Spark re-executes the
    whole explode lineage per reference (the CLAUDE.md no-reuse trap —
    the before-plan of dedup_minhash_lsh carried 32 scans of
    documents.parquet). On a cluster the checkpoint is a persisted
    intermediate table, same as the pipeline's stage snapshots."""
    sh_raw = shingles_df(dup_text_corpus(spark, sf_dir)).localCheckpoint(eager=False)
    return capped_shingles(sh_raw)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs (threshold 0.6), over
    df-capped shingles so one stop-phrase can't make the self-join
    quadratic."""
    sh = _shingles_ckpt(spark, sf_dir)
    return _jaccard_pairs(sh, JACCARD_THRESHOLD)


def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment — the step after pair finding that a
    curation pipeline actually acts on: connect the verified Jaccard
    pairs into components (large-star/small-star, kgeng.canon.cc — the
    O(log n)-round distributed formulation) and emit, per clustered
    doc, its keeper (= component minimum id, the doc a dedup pass
    keeps) and the cluster size.

    This grades the iterative CC operator with a full value oracle: the
    DuckDB twin computes the same components by recursive-CTE
    min-label propagation over the same pair set. Docs in no pair are
    not emitted (singletons are kept trivially)."""
    from kgeng.canon.cc import connected_components

    sh = _shingles_ckpt(spark, sf_dir)
    pairs = _jaccard_pairs(sh, JACCARD_THRESHOLD).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("keep_id"),
        "cluster_size",
    )


# MinHash permutation family over a 28-bit base hash: one md5 per
# shingle (not one per seed — 16x fewer digest calls), then 16 integer
# permutations h_s = (A_s·x + B_s) mod P. P = 2^31 - 1 (prime);
# x < 2^28 and A_s < 2^31 keep A_s·x < 2^59, inside signed-64 range on
# BOTH engines — no overflow, bit-exact portability.
MINHASH_P = 2_147_483_647
MINHASH_A = [(2_654_435_761 * (s + 1)) % MINHASH_P for s in range(N_MINHASH)]
MINHASH_B = [(40_503 * (s + 17) + 1) % MINHASH_P for s in range(N_MINHASH)]


def minhash_wide(sh: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): portable MinHash — base hash x = first
    7 hex digits of md5(shingle), permuted per seed with fixed integer
    constants (see MINHASH_A/B), so any engine with md5 + 64-bit ints
    reproduces the signatures exactly.

    Plan note: one groupBy with ``n_hashes`` min-aggregates instead of
    exploding seeds (which would multiply the shuffle by 16×) — the
    map-side partial min collapses each partition to |docs| rows
    before the exchange.
    """
    x = F.conv(F.substring(F.md5(F.col("sh")), 1, 7), 16, 10).cast("long")
    based = sh.select("doc_id", x.alias("x"))
    aggs = [
        F.min((F.lit(MINHASH_A[s]) * F.col("x") + F.lit(MINHASH_B[s])) % F.lit(MINHASH_P)).alias(
            f"mh{s}"
        )
        for s in range(n_hashes)
    ]
    return based.groupBy("doc_id").agg(*aggs)


def minhash_bands(sh: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, band, band_key): the banded signature table, computed
    DIRECTLY from the wide signature row. The old shape exploded the
    signature to |docs|·n_hashes (doc, seed, mh) rows and re-grouped
    them by (doc, band) with a sort + collect_list — a full extra
    exchange + sort-aggregate whose output is statically known from
    the wide row: band b holds exactly seeds b·BAND_SIZE..+(BAND_SIZE-1),
    each present exactly once, and ``array_sort`` over struct(seed, mh)
    orders by those distinct seeds — so the sorted mh list IS
    (mh_{4b}, …, mh_{4b+3}) and the band key md5 is a per-row
    expression. Byte-identical band_key by construction; ONE shuffle
    (the signature agg) instead of two."""
    wide = minhash_wide(sh, n_hashes)
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * BAND_SIZE + i}").cast("string")
                        for i in range(BAND_SIZE)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(n_hashes // BAND_SIZE)
    ]
    return wide.select("doc_id", F.explode(F.array(*structs)).alias("p")).select(
        "doc_id", F.col("p.band").alias("band"), F.col("p.band_key").alias("band_key")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: 16 hashes, 4 bands of 4 rows;
    candidates share >=1 band; verified with exact Jaccard >= 0.6.

    The band join touches |docs|·4 rows — never the quadratic pair
    space — and verification runs exact Jaccard ONLY over the band
    candidates (``_jaccard_for_pairs``), which is the property that
    survives a 100× scale-up.
    """
    sh = _shingles_ckpt(spark, sf_dir)
    # the band table feeds BOTH sides of the candidate self-join —
    # materialize it once (|docs|·4 rows) instead of re-running the
    # signature aggregation per side
    bands = minhash_bands(sh).localCheckpoint(eager=False)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cands = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _jaccard_for_pairs(sh, cands, JACCARD_THRESHOLD)


def simhash_table(corpus: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, sim_bits): 64-bit SimHash as a '0'/'1' string.

    The token-hash family is PORTABLE: bit i of a token's hash is bit
    ``i % 4`` of hex digit ``i // 4`` of ``md5(token)`` — any engine
    with md5 reproduces the signature character-for-character (an
    earlier version used xxhash64, which has no DuckDB twin, leaving
    the op un-oracled). Per-bit majority vote = 64 conditional sums in
    one groupBy, all whole-stage codegen; the string form avoids
    signed-64-bit overflow traps on both engines.
    """
    tok = corpus.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("t")
    ).withColumn("h", F.md5("t"))
    # two 8-hex-char halves parsed once, digits derived by bit ops —
    # identical digit values to a per-char parse (the DuckDB twin
    # parses per-char; only this side is hot), 8x fewer conv calls
    hi = F.conv(F.substring(F.col("h"), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.col("h"), 9, 8), 16, 10).cast("long")
    halved = tok.select("doc_id", hi.alias("hhi"), lo.alias("hlo"))

    def digit(j: int):
        if j < 8:
            return F.shiftright(F.col("hhi"), 4 * (7 - j)).bitwiseAND(F.lit(15))
        return F.shiftright(F.col("hlo"), 4 * (15 - j)).bitwiseAND(F.lit(15))

    digs = halved.select(
        "doc_id", *[digit(j).cast("int").alias(f"d{j}") for j in range(bits // 4)]
    )
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"d{i // 4}"), i % 4).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = digs.groupBy("doc_id").agg(*bit_sums)
    sim_bits = F.concat(
        *[F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)]
    )
    return agg.select("doc_id", sim_bits.alias("sim_bits"))


def _hamming_vals(va, vb):
    """Hamming distance between two signatures held as arrays of
    per-band ints: Σ popcount(xor) — 4 bit ops per pair instead of 64
    string comparisons (measured 11.5s → sub-second on 500k pairs)."""
    return F.aggregate(
        F.zip_with(va, vb, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit band blocking, then Hamming
    distance <= 6 verification. The md5-derived signature makes the
    whole op DuckDB-oracleable (signature, bands, and Hamming all
    reproduce bit-for-bit)."""
    corpus = dup_text_corpus(spark, sf_dir)
    st = simhash_table(corpus)
    # per-band 16-bit integer values: Hamming becomes xor+popcount, and
    # the candidate distinct ships only (doc_a, doc_b) int pairs — the
    # signature payload is re-attached afterwards by doc-id join
    sim_vals = F.array(
        *[
            F.conv(F.expr(f"substring(sim_bits, {i * 16 + 1}, 16)"), 2, 10).cast("long")
            for i in range(4)
        ]
    )
    # the signature table feeds four consumers (the hot-bucket count,
    # both band-join sides, and the two value re-attach joins) and its
    # lineage is the full token-explode + 64-bit-sum aggregation —
    # materialize it ONCE (|docs| rows; the before-plan re-executed it
    # per reference: 24 scans of documents.parquet, 50 exchanges)
    st = st.select(
        "doc_id", "sim_bits", sim_vals.alias("sim_vals")
    ).localCheckpoint(eager=False)
    # band table likewise feeds the hot count plus both join sides —
    # cheap to rebuild from the materialized st, but three references
    # would still triple the explode; one more |docs|·4-row checkpoint
    bands = st.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("band"),
        "sim_bits",
    ).withColumn("key", F.expr("substring(sim_bits, band * 16 + 1, 16)")).drop(
        "sim_bits"
    ).localCheckpoint(eager=False)
    hot = (
        bands.groupBy("band", "key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > MAX_SIMHASH_BUCKET)
        .select("band", "key")
    )
    bands = bands.join(F.broadcast(hot), ["band", "key"], "left_anti")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    va = st.select(F.col("doc_id").alias("doc_a"), F.col("sim_vals").alias("va"))
    vb = st.select(F.col("doc_id").alias("doc_b"), F.col("sim_vals").alias("vb"))
    return (
        cands.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("hamming", _hamming_vals(F.col("va"), F.col("vb")))
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.999 over the derived
    corpus (each vector + its exact copy), via random-hyperplane LSH
    blocking — candidates share a 12-bit bucket (exact copies always
    do), then exact cosine verifies. The bucket equi-join keeps the
    pair space |bucket|², never the |corpus|² cross product the old
    plan shipped; the DuckDB oracle mirrors the bucket family
    bit-for-bit, so the graded comparison covers the blocking step
    too. Bit-count sizing (scale note): 12 bits is
    ``similarity.lsh_bits_for``'s rule at n≈130k; at larger corpora
    the constant grows with log(n) to keep bucket occupancy flat —
    see BENCH.md §4."""
    from kgeng.textops.similarity import _lsh_bucket

    e = dup_embedding_corpus(spark, sf_dir)
    norm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x))
    # both self-join sides reference the bucketed table; materialize it
    # once so the 12-hyperplane projection sweep runs one pass, not two
    en = e.select(
        "vec_id", "v", norm.alias("nrm"), _lsh_bucket(F.col("v")).alias("bucket")
    ).localCheckpoint(eager=False)
    a = en.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"), "bucket"
    )
    b = en.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"), "bucket"
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _trunc4(dot / (F.col("na") * F.col("nb"))))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("id_a", "id_b", "cosine")
    )
