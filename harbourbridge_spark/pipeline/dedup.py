"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup.

Dual-engine SQL templates (see text.py): Spark executes them over temp
views; the DuckDB rendering is the oracle, so candidate sets are
hash-compared exactly.

Scale design:
- exact dedup: one shuffle on the 48-bit content hash (not the full
  text — the classic shuffle-size optimization);
- MinHash-LSH: shingle explode is a projection; signatures are one
  groupBy(doc); banding turns the quadratic candidate search into
  equi-joins on band keys (shuffle on band buckets, skew-bounded
  because bucket size is capped by collision probability);
- SimHash: projection + 32 conditional sums per doc, pairs via
  band-blocked join on half-signatures (a Hamming-distance<=k search
  needs only ceil(32/(k+1)) blocks by pigeonhole);
- n-gram Jaccard: blocked pairwise verify — the *verification* stage
  downstream of LSH candidates, blocked here by (lang, length bucket);
- embedding near-dup: label-blocked exact cosine; the unblocked scale
  path is similarity.ann_lsh_sql.
"""

from __future__ import annotations

from .hashing import hash48, minhash_coeffs, perm_sql
from .text import render

MINHASH_K = 16
BAND_SIZE = 4           # 4 bands of 4 -> candidates at jaccard ~>0.6
SHINGLE = 5             # character shingles


def exact_dedup_sql(engine: str) -> str:
    """Exact duplicate groups via content hash: corpus-level stats in
    one pass. groupBy on the hash, not the text (shuffle carries 8
    bytes/row instead of the document)."""
    fp = hash48("trim(lower(text))", engine)
    t = f"""
    WITH groups AS (
        SELECT {fp} AS fp, COUNT(*) AS n
        FROM documents GROUP BY 1
    )
    SELECT COUNT(*) AS n_distinct,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_rows,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups
    FROM groups
    """
    return render(t, engine)


def _shingles(engine: str) -> str:
    """Distinct character 5-gram shingles of the normalized text."""
    norm = "trim(lower(text))"
    t = (f"{{adist}}({{ltrans}}({{seq}}(1, greatest(length({norm}) - {SHINGLE - 1}, 1)), "
         f"i -> substring({norm}, i, {SHINGLE})))")
    return render(t, engine)


def minhash_signature_sql(engine: str) -> str:
    """Per-doc MinHash signature (K permutations over shingle hashes),
    computed entirely per-row: hash the shingle array once, then each
    permutation is an array_min over a transform. No explode, no
    groupBy — the earlier explode->K-MIN-aggregations formulation
    shuffled |docs| x |shingles| rows for the same result."""
    sh = _shingles(engine)
    h = hash48("x", engine)
    amin = "array_min" if engine == "spark" else "list_min"
    mins = ", ".join(
        f"{amin}({{ltrans}}(hs, h -> {perm_sql('h', a, b)})) AS m{i}"
        for i, (a, b) in enumerate(minhash_coeffs(MINHASH_K)))
    t = f"""
    WITH hashed AS (
        SELECT doc_id, {{ltrans}}({sh}, x -> {h}) AS hs FROM documents
    )
    SELECT doc_id, {mins} FROM hashed
    """
    return render(t, engine)


def minhash_bands_sql(engine: str, sig_source: str) -> str:
    """The banding + candidate-join stage over an existing signature
    relation (``sig_source``). Split out so the Spark executor can
    cache the signature once (see minhash_lsh_pairs_fn) while the
    oracle keeps the single-statement CTE form."""
    n_bands = MINHASH_K // BAND_SIZE
    band_key = "CASE t.band " + " ".join(
        "WHEN {b} THEN concat_ws(',', {cols})".format(
            b=b, cols=", ".join(
                f"m{i}" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)))
        for b in range(n_bands)) + " END"
    values = ",".join(f"({b})" for b in range(n_bands))
    t = f"""
    WITH bands AS (
        SELECT doc_id, t.band, {band_key} AS key
        FROM {sig_source} CROSS JOIN (VALUES {values}) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """
    return render(t, engine)


def minhash_lsh_pairs_fn(spark, sf_dir: str):
    """Spark execution strategy for the LSH pairs: materialize the
    signature once (cache + temp view) before the self-join — the CTE
    form would inline the whole shingle/hash pipeline into both join
    sides. Produces exactly the rows of minhash_lsh_pairs_sql."""
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    sig = spark.sql(minhash_signature_sql("spark")).cache()
    sig.createOrReplaceTempView("__mh_sig")
    return spark.sql(minhash_bands_sql("spark", "__mh_sig"))


def minhash_lsh_pairs_sql(engine: str) -> str:
    """MinHash-LSH candidate pairs: band the signature (bands of
    BAND_SIZE), self-join on band keys, distinct pairs. The join is on
    the band hash — equality only, no quadratic scan."""
    sig = minhash_signature_sql(engine)
    n_bands = MINHASH_K // BAND_SIZE
    band_key = "CASE t.band " + " ".join(
        "WHEN {b} THEN concat_ws(',', {cols})".format(
            b=b, cols=", ".join(
                f"m{i}" for i in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)))
        for b in range(n_bands)) + " END"
    values = ",".join(f"({b})" for b in range(n_bands))
    # Bands expand via a VALUES cross join (one signature computation
    # per side, not one per band). The candidate search is a band-key
    # self-join: Spark inlines the CTE into both sides (signature
    # computed twice), but the join distributes bucket expansion across
    # tasks — a collect_list/flatten bucket expansion was measured 2-4x
    # WORSE because giant buckets become single-row quadratic arrays
    # with no parallelism.
    t = f"""
    WITH sig AS ({sig}),
    bands AS (
        SELECT doc_id, t.band, {band_key} AS key
        FROM sig CROSS JOIN (VALUES {values}) AS t(band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """
    return render(t, engine)


def dedup_keep_first_sql(engine: str) -> str:
    """The removal step downstream of candidate generation: keep the
    lowest doc_id per exact-content group, flag the rest as drops.
    Representative selection is a window min over the content hash —
    one shuffle on the 48-bit hash; survivors stream back without a
    second scan of the text."""
    fp = hash48("trim(lower(text))", engine)
    t = f"""
    WITH fps AS (
        SELECT doc_id, {fp} AS fp FROM documents
    ), ranked AS (
        SELECT doc_id, fp,
               min(doc_id) OVER (PARTITION BY fp) AS keeper
        FROM fps
    )
    SELECT doc_id, fp, (doc_id = keeper) AS keep
    FROM ranked
    """
    return render(t, engine)


def simhash_sql(engine: str, bits: int = 32) -> str:
    """Per-doc SimHash over whitespace tokens: for each bit position,
    majority vote of token-hash bits; emitted as a bit string (engine-
    portable, no sign issues)."""
    toks = render("{rsplit}(trim(lower(text)), '\\s+')", engine)
    h = hash48("tok", engine)
    # portable bit extraction: exact floor-division (h48 < 2^48 < 2^53,
    # so double division is exact; >> and div/// differ across engines)
    votes = ", ".join(
        f"SUM(CASE WHEN CAST(floor(h48 / {1 << j}.0) AS BIGINT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits))
    bitstr = " || ".join(
        f"CASE WHEN v{j} >= 0 THEN '1' ELSE '0' END"
        for j in range(bits - 1, -1, -1))
    t = f"""
    WITH exploded AS (
        SELECT doc_id, {{explode}}({toks}) AS tok FROM documents
    ), hashed AS (
        SELECT doc_id, {h} AS h48 FROM exploded
    ), votes AS (
        SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, {bitstr} AS simhash_bits FROM votes
    """
    return render(t, engine)


def ngram_jaccard_pairs_sql(engine: str, n: int = 3,
                            threshold: float = 0.4) -> str:
    """Word n-gram Jaccard verification over blocked pairs (same lang +
    same length bucket — the stand-in for an upstream LSH candidate
    feed). Returns pairs with jaccard >= threshold."""
    toks = render("{rsplit}(trim(lower(text)), '\\s+')", engine)
    grams = render(
        f"{{adist}}({{ltrans}}({{seq}}(1, greatest({{alen}}({toks}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])))",
        engine)
    if engine == "spark":
        # Spark arrays are 0-based via element_at-compatible [] in SQL?
        # [] indexing in Spark SQL is 0-based; DuckDB lists are 1-based.
        grams = render(
            f"{{adist}}({{ltrans}}({{seq}}(0, greatest({{alen}}({toks}) - {n}, 0)), "
            f"i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2])))",
            engine)
    t = f"""
    WITH g AS (
        SELECT doc_id, lang,
               CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket,
               {grams} AS grams
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round({{alen}}({{ainter}}(a.grams, b.grams))
                 / CAST({{alen}}(a.grams) + {{alen}}(b.grams)
                        - {{alen}}({{ainter}}(a.grams, b.grams)) AS DOUBLE),
                 6) AS jaccard
    FROM g a JOIN g b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
         AND a.doc_id < b.doc_id
    WHERE {{alen}}({{ainter}}(a.grams, b.grams))
          / CAST({{alen}}(a.grams) + {{alen}}(b.grams)
                 - {{alen}}({{ainter}}(a.grams, b.grams)) AS DOUBLE)
          >= {threshold}
    """
    return render(t, engine)


def embedding_neardup_sql(engine: str, threshold: float = 0.35) -> str:
    """Embedding-cosine near-dup pairs, blocked by label (exact within
    block). Dot/norm computed by sequential fold in both engines —
    bit-identical doubles."""
    if engine == "spark":
        dot = ("aggregate(zip_with(a.embedding, b.embedding, "
               "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
               "0D, (acc, v) -> acc + v)")
        norm = ("sqrt(aggregate(embedding, 0D, "
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    else:
        dot = ("list_dot_product(a.embedding::DOUBLE[], "
               "b.embedding::DOUBLE[])")
        norm = ("sqrt(list_dot_product(embedding::DOUBLE[], "
                "embedding::DOUBLE[]))")
    # norms are precomputed per vector (O(N)), not per pair (O(N^2))
    t = f"""
    WITH n AS (
        SELECT vec_id, label, embedding, {norm} AS nrm FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({dot} / (a.nrm * b.nrm), 6) AS cosine
    FROM n a JOIN n b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {dot} / (a.nrm * b.nrm) >= {threshold}
    """
    return render(t, engine)
