"""Text-analysis operators: tokenization, quality scoring, language ID,
fingerprinting (SURVEY §7.2 M8; pipeline requirements).

Every operator is defined once as a SQL template instantiated for both
engines (Spark executes it over temp views; the DuckDB rendering IS the
oracle), so the correctness gate checks the exact same logic. All
expressions are engine-portable: shared lambda syntax, explicit
regexp groups, true division, and the portable hash from hashing.py.

Scale notes: all per-document expressions are embarrassingly parallel
projections (no shuffle); the aggregate variants shuffle once on a
low-cardinality key. No Python UDFs anywhere.
"""

from __future__ import annotations

from ..confscope import scoped_parser_mode
from ..scan import read_cached, read_spread

from pyspark.sql import DataFrame, SparkSession

from .hashing import hash48

# dialect shims: name -> (spark, duckdb)
_SHIMS = {
    "adist": ("array_distinct", "list_distinct"),
    "alen": ("size", "len"),
    "asort": ("array_sort", "list_sort"),
    "seq": ("sequence", "generate_series"),
    "ltrans": ("transform", "list_transform"),
    "lfilter": ("filter", "list_filter"),
    "ainter": ("array_intersect", "list_intersect"),
    "explode": ("explode", "unnest"),
    "rsplit": ("split", "regexp_split_to_array"),
    "ajoin": ("array_join", "array_to_string"),
    "collect": ("collect_list", "list"),
    # 1-based element access OUTSIDE lambdas (inside a transform
    # lambda Spark's bracket indexing is 0-based — see the
    # decontaminate_sql sequence-shift idiom instead)
    "elem": ("element_at", "list_extract"),
    # normalized document text.  Spark's trim strips ASCII 0x20 only,
    # DuckDB's trim strips Unicode whitespace (U+00A0 included), so a
    # shared template using bare trim() diverges on nbsp-adjacent text
    # (NOTES_DEV "Cross-engine trim hazard").  The DuckDB side uses an
    # explicit space-only regexp, pinning both engines to SPARK's
    # semantics — verified char-exact on space/tab/nbsp/newline/mixed.
    "ntext": ("trim(lower(text))",
              "regexp_replace(lower(text), '^ +| +$', '', 'g')"),
}


def render(template: str, engine: str, **extra: str) -> str:
    """Instantiate a dual-engine SQL template."""
    idx = 0 if engine == "spark" else 1
    subs = {k: v[idx] for k, v in _SHIMS.items()}
    subs.update(extra)
    # engine-specific helpers usable inside templates
    subs["engine"] = engine
    return template.format(**subs)


def sumlen(arr_expr: str, engine: str) -> str:
    """Sum of element lengths of a string array."""
    if engine == "spark":
        return (f"aggregate({arr_expr}, 0L, (acc, x) -> acc + length(x))")
    return f"CAST(list_sum(list_transform({arr_expr}, x -> length(x))) AS BIGINT)"


def norm_text(engine: str) -> str:
    """The engine-correct normalized-text expression (see the ntext
    shim: Spark-semantics strip of 0x20 runs, lowercased)."""
    return render("{ntext}", engine)


# whitespace tokenization of normalized text
TOKENS = "{rsplit}({ntext}, '\\s+')"

# BPE-ish token pattern: letter runs, single digits, single punctuation
BPE_PATTERN = "'[a-z]+|[0-9]|[^a-z0-9\\s]'"

EN_STOP = "('the','a','an','of','and','to','in','is','on','for','with','that')"
ES_STOP = "('el','la','de','y','en','que','los','se','del','las','un','por')"
DE_STOP = "('der','die','das','und','in','den','von','zu','mit','auf','ist','des')"
ZH_STOP = "('de','le','he','shi','zai','you','wo','ta','men','zhe','ge','bu')"


def text_quality_sql(engine: str) -> str:
    """Per-document quality scoring: token count (whitespace + BPE-ish),
    punctuation ratio, stopword ratio, length score -> composite score.
    One projection, no shuffle. The expensive array expressions are
    computed exactly once in a base subquery (Spark doesn't CSE
    higher-order functions across a flat projection: measured 3.7x)."""
    toks = render(TOKENS, engine)
    t = f"""
    WITH base AS (
        SELECT doc_id, lang, text,
               {toks} AS toks,
               {{alen}}(regexp_extract_all(lower(text), {BPE_PATTERN}, 0))
                   AS n_bpe,
               {{alen}}(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0))
                   AS n_punct
        FROM documents
    ), m AS (
        SELECT doc_id, lang, n_bpe,
               {{alen}}(toks) AS n_toks,
               {sumlen('toks', engine)} AS toks_len,
               {{alen}}({{lfilter}}(toks, x -> x IN {EN_STOP})) AS n_stop,
               n_punct / CAST(length(text) AS DOUBLE) AS praw
        FROM base
    )
    SELECT doc_id, lang,
           n_toks AS n_tokens,
           n_bpe AS n_bpe_tokens,
           round(toks_len / CAST(n_toks AS DOUBLE), 6) AS avg_token_len,
           round(praw, 6) AS punct_ratio,
           round(n_stop / CAST(n_toks AS DOUBLE), 6) AS stopword_ratio,
           round(least(n_toks / 50.0, 1.0) * 0.5
                 + least(n_stop / CAST(n_toks AS DOUBLE) * 5.0, 1.0) * 0.3
                 + (1.0 - least(praw * 10.0, 1.0)) * 0.2,
                 6) AS quality_score
    FROM m
    """
    return render(t, engine)


def lang_id_sql(engine: str) -> str:
    """Language-ID heuristic: stopword-list vote across 4 languages,
    returned as a (labelled lang x predicted lang) confusion matrix.
    One projection + one small-key shuffle."""
    toks = render(TOKENS, engine)
    votes = {
        "en": EN_STOP, "es": ES_STOP, "de": DE_STOP, "zh": ZH_STOP,
    }
    score_cols = ", ".join(
        f"{{alen}}({{lfilter}}(toks, x -> x IN {stop})) AS s_{lang}"
        for lang, stop in votes.items())
    t = f"""
    WITH base AS (
        SELECT doc_id, lang, {toks} AS toks FROM documents
    ), scored AS (
        SELECT doc_id, lang, {score_cols} FROM base
    ), pred AS (
        SELECT doc_id, lang,
               CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                    WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                    WHEN s_de >= s_zh THEN 'de'
                    ELSE 'zh' END AS pred_lang
        FROM scored
    )
    SELECT lang, pred_lang, COUNT(*) AS n_docs
    FROM pred GROUP BY lang, pred_lang
    """
    return render(t, engine)


def fingerprint_sql(engine: str) -> str:
    """Document fingerprints: content hash of normalized text and an
    order-insensitive vocabulary hash (same value for shuffled word
    order) — the exact-dedup keys."""
    toks = render(TOKENS, engine)
    content = hash48(norm_text(engine), engine)
    vocab_src = render(f"{{ajoin}}({{asort}}({{adist}}({toks})), ' ')", engine)
    vocab = hash48(vocab_src, engine)
    t = f"""
    SELECT doc_id,
           {content} AS content_fp,
           {vocab} AS vocab_fp
    FROM documents
    """
    return render(t, engine)


def token_count_sql(engine: str) -> str:
    """Corpus token accounting per (lang, source): whitespace tokens and
    BPE-ish tokens; the per-partition pre-aggregation pattern."""
    toks = render(TOKENS, engine)
    t = f"""
    WITH base AS (
        SELECT lang, source,
               CAST({{alen}}({toks}) AS BIGINT) AS n_ws,
               CAST({{alen}}(regexp_extract_all(lower(text), {BPE_PATTERN}, 0))
                   AS BIGINT) AS n_bpe,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM base
    GROUP BY lang, source
    """
    return render(t, engine)


def vocab_topk_sql(engine: str, k: int = 10) -> str:
    """Top-k vocabulary per language by token frequency (ties broken
    lexicographically): explode -> count -> window rank. The shuffle
    carries (lang, token) pairs; the rank is per low-cardinality lang."""
    toks = render(TOKENS, engine)
    t = f"""
    WITH exploded AS (
        SELECT lang, {{explode}}({toks}) AS tok FROM documents
    ), counts AS (
        SELECT lang, tok, COUNT(*) AS n
        FROM exploded GROUP BY lang, tok
    ), ranked AS (
        SELECT lang, tok, n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n DESC, tok) AS rk
        FROM counts
    )
    SELECT lang, tok, n, rk FROM ranked WHERE rk <= {k}
    """
    return render(t, engine)


def chunk_documents_sql(engine: str, size: int = 64,
                        overlap: int = 16) -> str:
    """Document chunking for training pipelines: fixed-size token
    windows with overlap. Token split bound once per row; chunk ids
    explode from an integer sequence; each chunk is an array slice —
    all JVM/vectorized, no UDFs. Work and output are linear in total
    token count (each token lands in <= size/stride chunks)."""
    stride = size - overlap
    toks = render(TOKENS, engine)
    if engine == "spark":
        n_chunks = f"greatest(1, (size(t) - {overlap} + {stride} - 1) div {stride})"
        chunk = f"slice(t, chunk_id * {stride} + 1, {size})"
    else:
        n_chunks = f"greatest(1, (len(t) - {overlap} + {stride} - 1) // {stride})"
        chunk = (f"list_slice(t, chunk_id * {stride} + 1, "
                 f"chunk_id * {stride} + {size})")
    t = f"""
    WITH toks AS (
        SELECT doc_id, {toks} AS t FROM documents
    ), ids AS (
        SELECT doc_id, t,
               {{explode}}({{seq}}(0, {n_chunks} - 1)) AS chunk_id
        FROM toks
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST({{alen}}({chunk}) AS BIGINT) AS n_chunk_tokens,
           {{ajoin}}({chunk}, ' ') AS chunk_text
    FROM ids
    """
    return render(t, engine)


# crafted PII corpus for the redaction golden (emails/phones do not
# occur in the synthetic documents, so the oracle runs on VALUES)
_PII_CASES = [
    "contact me at alice.smith@example.com for details",
    "two mails: a@b.io and c.d+tag@sub.domain.org here",
    "call +1-555-123-4567 after 5pm",
    "mixed bob@corp.net or +44 20 7946 0958 anytime",
    "no pii in this row at all",
]


def redact_pii_sql(engine: str) -> str:
    """PII scrubbing (emails, phone numbers) as pure regexp
    projections — the pre-training redaction pass. The golden VALUES
    corpus checks Java-regex vs RE2 parity of the patterns (the risk
    area); counts come from regexp_extract_all lengths."""
    email = r"'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+'"
    phone = r"'\+[0-9][0-9()\- ]+[0-9]'"
    values = ", ".join(f"({i}, '{s}')" for i, s in enumerate(_PII_CASES))
    if engine == "spark":
        red = (f"regexp_replace(regexp_replace(text, {email}, '<EMAIL>'), "
               f"{phone}, '<PHONE>')")
    else:
        # DuckDB regexp_replace is first-match unless 'g'
        red = (f"regexp_replace(regexp_replace(text, {email}, '<EMAIL>', "
               f"'g'), {phone}, '<PHONE>', 'g')")
    t = f"""
    SELECT row_id,
           {red} AS redacted,
           CAST({{alen}}(regexp_extract_all(text, {email}, 0)) AS BIGINT)
               AS n_emails,
           CAST({{alen}}(regexp_extract_all(text, {phone}, 0)) AS BIGINT)
               AS n_phones
    FROM (VALUES {values}) AS t(row_id, text)
    """
    return render(t, engine)


def run(spark: SparkSession, sf_dir: str, sql_fn) -> DataFrame:
    """Execute a dual-engine template on Spark over the fixture views."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # plain read (r16 A/B): the templates run() serves are single-pass
    # JVM projections/windows a single codegen task finishes faster
    # than the spread exchange costs (scan.py rationale)
    read_cached(spark, f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.sql(sql_fn("spark"))


def surprisal_sql(engine: str) -> str:
    """Per-document token surprisal against the corpus unigram model —
    the perplexity-proxy quality signal a pretraining pipeline uses to
    flag gibberish (high surprisal) and boilerplate (low surprisal).

    Engine-exactness: log() differs in final ulps across engines, so
    surprisal is quantized to INTEGER rarity buckets computed with
    pure integer comparisons — bucket k means the token's corpus
    frequency is in (total/2^(k+1), total/2^k] (k = floor(log2) of
    inverse frequency, never touching floating point). Bucket sums
    and the oov numerator are integers, so every output is an exact
    rational — bit-identical across engines."""
    toks = render(TOKENS, engine)
    ladder = " ".join(
        f"WHEN n * {1 << k} >= t THEN {k}"
        for k in range(31))
    t = f"""
    WITH toks AS (
        SELECT doc_id, {{explode}}(tok_arr) AS tok
        FROM (SELECT doc_id, {toks} AS tok_arr FROM documents) _t
    ), vocab AS (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS t FROM vocab
    ), scored AS (
        SELECT toks.doc_id,
               CASE {ladder} ELSE 31 END AS rarity,
               CASE WHEN vocab.n <= 2 THEN 1 ELSE 0 END AS is_rare
        FROM toks JOIN vocab ON vocab.tok = toks.tok CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(rarity) AS BIGINT) AS rarity_sum,
           CAST(CAST(SUM(rarity) AS BIGINT) AS DOUBLE) / COUNT(*)
               AS mean_rarity,
           CAST(MAX(rarity) AS BIGINT) AS max_rarity,
           CAST(CAST(SUM(is_rare) AS BIGINT) AS DOUBLE) / COUNT(*)
               AS oov_rate
    FROM scored GROUP BY doc_id
    """
    return render(t, engine)


def boilerplate_grams_sql(engine: str, n_docs_min: int = 3) -> str:
    """Boilerplate phrase detection: word 5-grams shared by at least
    ``n_docs_min`` documents — the cross-document repetition signal
    used to strip templated headers/footers from a pretraining corpus.
    The groupBy key here is the readable phrase (output-friendly); the
    100 TB variant would group on the 48-bit gram hash first and
    recover phrases for the tiny surviving set via a semi-join, like
    dedup's hashed-gram path."""
    toks = render(TOKENS, engine)
    g5 = render(
        "{adist}({ltrans}({seq}(1, greatest({alen}(tk) - 4, 1)), "
        "i -> concat_ws(' ', tk[i{o0}], tk[i{o1}], tk[i{o2}], "
        "tk[i{o3}], tk[i{o4}])))",
        engine,
        **({"o0": "-1", "o1": "", "o2": "+1", "o3": "+2", "o4": "+3"}
           if engine == "spark"
           else {"o0": "", "o1": "+1", "o2": "+2", "o3": "+3", "o4": "+4"}))
    t = f"""
    WITH grams AS (
        SELECT doc_id, {{explode}}(g) AS gram
        FROM (SELECT doc_id, {g5} AS g
              FROM (SELECT doc_id, {toks} AS tk FROM documents) _k) _g
    )
    SELECT gram, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) >= {n_docs_min}
    """
    return render(t, engine)


def boilerplate_grams_fn(spark, sf_dir: str):
    """Spark execution strategy for boilerplate grams: identical output
    to boilerplate_grams_sql (the oracle keeps the array template),
    but grams are formed with posexplode + window LEADs instead of
    per-row array building — measured 3x faster at sf0.1: the fused
    build-array-then-explode plan pays the gram construction inside
    the Generate stage, while the window plan streams tokens through
    one (doc_id, pos) sort and never materializes gram arrays.
    Short-doc (<5 tokens) single-gram semantics of the template are
    preserved via the pos=0 fallback row."""
    with scoped_parser_mode(spark, "true"):
        docs = read_spread(spark, f"{sf_dir}/documents.parquet")
        docs.createOrReplaceTempView("documents")
        toks = render(TOKENS, "spark")
        # two r6 plan cuts vs the template-shaped form (1.27s -> 0.90s at
        # sf0.1, equal output):
        # - no ntok window: `t4 IS NOT NULL OR pos = 0` is equivalent to
        #   the template's short-doc fallback, since pos=0 with >=5 tokens
        #   implies t4 IS NOT NULL — saves a whole window aggregate;
        # - per_doc is DISTINCT (doc_id, gram), so COUNT(*) equals
        #   COUNT(DISTINCT doc_id) and the final agg is a cheap partial-
        #   aggregated count instead of a two-phase distinct.
        return spark.sql(f"""
        WITH toks AS (
            SELECT doc_id, posexplode({toks}) AS (pos, tok) FROM documents
        ), g AS (
            SELECT doc_id, pos,
                   concat_ws(' ', tok, lead(tok, 1) OVER w,
                             lead(tok, 2) OVER w, lead(tok, 3) OVER w,
                             lead(tok, 4) OVER w) AS gram,
                   lead(tok, 4) OVER w AS t4
            FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ), per_doc AS (
            SELECT DISTINCT doc_id, gram FROM g
            WHERE t4 IS NOT NULL OR pos = 0
        )
        SELECT gram, COUNT(*) AS n_occurrences, COUNT(*) AS n_docs
        FROM per_doc GROUP BY gram
        HAVING COUNT(*) >= 3
        """)


def quality_classifier_sql(engine: str) -> str:
    """Hashed-feature linear text classifier (the fasttext-style model
    shape every production corpus filter uses: CCNet/RefinedWeb-class
    quality gates are linear models over hashed word n-grams). Features
    are word unigrams + bigrams; each maps through the hashing trick
    straight to an integer weight in [-1000, 1000] derived from the
    portable hash48 — standing in for trained weights, which a real
    deployment would broadcast as a lookup table of the same shape.
    The score is a mean of integer weights (exact in both engines; the
    only floats are the final division and the logistic squash, both
    computed once per document from identical exact inputs and rounded
    to 6 places).

    Scale shape: a pure per-document projection — token split, two
    array folds, no explode, no shuffle, no UDF; Catalyst keeps the
    whole thing in one codegen stage, so scoring 100 TB is a single
    linear scan. The `keep` decision compares the INTEGER weight sum
    to zero — no float enters the decision."""
    toks = render(TOKENS, engine)
    uni_w = f"(({hash48('x', engine)} % 2001) - 1000)"
    # bigram text via index-shifted transform (Spark lambdas index
    # 0-based, DuckDB 1-based — the decontaminate_sql idiom)
    if engine == "spark":
        bi = ("aggregate({ltrans}({seq}(0, n - 2), "
              "i -> concat_ws(' ', tk[i], tk[i+1])), 0L, "
              f"(acc, x) -> acc + {uni_w})")
        uni = f"aggregate(tk, 0L, (acc, x) -> acc + {uni_w})"
    else:
        bi = ("CAST(list_sum(list_transform("
              "{ltrans}({seq}(1, n - 1), "
              "i -> concat_ws(' ', tk[i], tk[i+1])), "
              f"x -> {uni_w})) AS BIGINT)")
        uni = (f"CAST(list_sum(list_transform(tk, x -> {uni_w})) "
               "AS BIGINT)")
    t = f"""
    WITH tk AS (
        SELECT doc_id, tk, {{alen}}(tk) AS n
        FROM (SELECT doc_id, {toks} AS tk FROM documents
              WHERE text IS NOT NULL) _t
    ), s AS (
        SELECT doc_id,
               CAST({uni} AS BIGINT)
                   + CASE WHEN n >= 2 THEN {bi} ELSE 0 END AS wsum,
               n + CASE WHEN n >= 2 THEN n - 1 ELSE 0 END AS n_feats
        FROM tk
    )
    SELECT doc_id,
           round(CAST(wsum AS DOUBLE) / (1000.0 * n_feats), 6)
               AS clf_score,
           round(1.0 / (1.0 + exp(-4.0 * CAST(wsum AS DOUBLE)
                                  / (1000.0 * n_feats))), 6) AS p_keep,
           wsum >= 0 AS keep
    FROM s
    """
    return render(t, engine)


def bigram_surprisal_sql(engine: str) -> str:
    """Per-document CONDITIONAL surprisal against the corpus bigram
    model — the next-word-predictability quality signal one rung above
    surprisal_sql's unigram rarity: templated/boilerplate text scores
    near bucket 0 (every next word is the usual one), scrambled or
    machine-garbled text scores high even when its unigrams are
    common.  Conditional bucket k means P(w2 | w1) lies in
    (2^-(k+1), 2^-k], computed as floor(log2(n(w1)/n(w1,w2))) via the
    same pure-integer comparison ladder as surprisal_sql — log() ulp
    drift across engines never enters.  novel_rate counts bigrams
    seen <= 2 times corpus-wide (the creativity/typo signal).

    Scale shape: ONE tokenize pass, a position explode (0/1-based
    index shift is the only engine difference), bigram counts as one
    (w1, w2) shuffle with map-side partials, a broadcast-sized
    unigram join; at 100 TB the pair key would be hashed first like
    boilerplate_grams' hashed-gram path."""
    toks = render(TOKENS, engine)
    lo, hi = ("0", "size(tk) - 2") if engine == "spark" \
        else ("1", "len(tk) - 1")
    ladder = " ".join(f"WHEN b.nb * {1 << k} >= v.n THEN {k}"
                      for k in range(31))
    t = f"""
    WITH docs2 AS (
        SELECT doc_id, tk
        FROM (SELECT doc_id, {toks} AS tk FROM documents) _t
        WHERE {{alen}}(tk) >= 2
    ), pos AS (
        SELECT doc_id, tk, {{explode}}(ia) AS i
        FROM (SELECT doc_id, tk, {{seq}}({lo}, {hi}) AS ia
              FROM docs2) _p
    ), occ AS (
        SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2 FROM pos
    ), vocab AS (
        SELECT tok, COUNT(*) AS n
        FROM (SELECT {{explode}}(tka) AS tok
              FROM (SELECT {toks} AS tka FROM documents) _v) _w
        GROUP BY tok
    ), big AS (
        SELECT w1, w2, COUNT(*) AS nb FROM occ GROUP BY w1, w2
    ), scored AS (
        SELECT o.doc_id,
               CASE {ladder} ELSE 31 END AS cond_rarity,
               CASE WHEN b.nb <= 2 THEN 1 ELSE 0 END AS is_novel
        FROM occ o
        JOIN big b ON b.w1 = o.w1 AND b.w2 = o.w2
        JOIN vocab v ON v.tok = o.w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(cond_rarity) AS BIGINT) AS cond_sum,
           CAST(CAST(SUM(cond_rarity) AS BIGINT) AS DOUBLE)
               / COUNT(*) AS mean_cond_rarity,
           CAST(MAX(cond_rarity) AS BIGINT) AS max_cond_rarity,
           CAST(CAST(SUM(is_novel) AS BIGINT) AS DOUBLE) / COUNT(*)
               AS novel_rate
    FROM scored GROUP BY doc_id
    """
    return render(t, engine)
