"""Published web-corpus cleaning operators: CCNet line-level dedup,
Gopher quality rules, C4 line/page filters.

Every major LLM web corpus applies these three named recipes between
crawl ingestion and model training:

- **CCNet paragraph dedup** (Wenzek et al., LREC 2020): hash every
  line/paragraph, count occurrences CORPUS-WIDE, drop repeated lines
  (boilerplate nav/footer text is the dominant duplicate class).
  Implemented keep-first: the minimum (doc_id, line_pos) occurrence
  of each line hash survives.  100 TB shape: deliberately NOT a
  window — a groupBy-MIN(packed doc_id,lpos) argmin per line hash
  (map-side partial aggregation absorbs the hot boilerplate key)
  plus an equi-join back (AQE skew-join on the probe side); a
  ``ROW_NUMBER() OVER (PARTITION BY line_hash)`` would funnel every
  copy of a hot nav line into ONE window partition.  Keys are two
  disjoint 60-bit md5 slices (120 effective bits): line cardinality
  at 100 TB is 10^10-10^11, where a 48-bit key expects 10^5-10^7
  birthday collisions, each silently deleting an innocent line (see
  SCALE.md collision budget).  Re-assembly is a per-doc aggregation
  — no quadratic term, and nothing longer than a line ever shuffles.
- **Gopher rules** (Rae et al. 2021, §A1.1): word-count bounds
  [50, 100k], mean-word-length bounds [3, 10], symbol-to-word ratio
  (# / ellipsis) <= 0.1, <= 90% bullet-starting lines, <= 30%
  ellipsis-ending lines, >= 80% words containing an alphabetic
  char, >= 2 hits from the paper's stopword list.  Every rule is an
  INTEGER comparison column (n_bullet*10 <= n_lines*9 instead of a
  fraction) so verdicts are engine-exact with zero float boundaries;
  keep = AND of the rules.  Single pass, no shuffle beyond the
  per-doc line aggregation.
- **C4 filters** (Raffel et al. 2020, §2.2): keep lines ending in
  terminal punctuation with >= 3 words, drop lines mentioning
  javascript, drop whole pages containing a curly brace, 'lorem
  ipsum', or fewer than 5 surviving sentences.

The synthetic documents are single-line token streams, so the
operators run over a deterministic multi-line PAGE synthesized
in-template from each document (the html_extract convention): body
lines of 6 tokens (terminal '.' withheld on a (doc_id + pos) % 4
schedule), a per-doc bullet line on doc_id % 5, a corpus-wide
duplicate nav line in EVERY doc (the CCNet target), a
javascript/cookie line on doc_id % 7, and a curly-brace line on
doc_id % 11 (the C4 page killer).  Every hazard each filter exists
for appears on a known schedule, so the DuckDB oracle reconstructs
all outputs exactly.

All operators are dual-engine SQL templates (text.py conventions):
pure projections + one line-hash shuffle; no Python anywhere.
"""

from __future__ import annotations

from ..scan import read_cached
from .hashing import hash60
from .text import TOKENS, render, sumlen

# Gopher §A1.1 stopword list (the paper names exactly these)
_GOPHER_STOPS = "('the','be','to','of','and','that','have','with')"


def _page_lines_fragment(engine: str) -> str:
    """Shared fixture CTE fragment (UNRENDERED — shims resolve in the
    caller's single render pass): documents -> page_lines(doc_id,
    lpos, line)."""
    toks = TOKENS                       # unrendered template piece
    if engine == "spark":
        n_lines = "greatest(1, (size(t) + 5) div 6)"
        chunk = "slice(t, line_id * 6 + 1, 6)"
    else:
        n_lines = "greatest(1, (len(t) + 5) // 6)"
        chunk = "list_slice(t, line_id * 6 + 1, line_id * 6 + 6)"
    return f"""
    toks AS (
        SELECT doc_id, {toks} AS t FROM documents
    ), body AS (
        SELECT doc_id, t,
               {{explode}}({{seq}}(0, {n_lines} - 1)) AS line_id
        FROM toks
    ), page_lines AS (
        SELECT doc_id, CAST(line_id + 1 AS BIGINT) AS lpos,
               {{ajoin}}({chunk}, ' ') ||
                   CASE WHEN (doc_id + line_id + 1) % 4 = 0
                        THEN '' ELSE '.' END AS line
        FROM body
        UNION ALL
        SELECT doc_id, CAST(0 AS BIGINT) AS lpos,
               '- promo item ' || doc_id AS line
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id, CAST(100000 AS BIGINT) AS lpos,
               'all rights reserved site nav' AS line
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(100001 AS BIGINT) AS lpos,
               'please enable javascript and accept our cookie policy.'
                   AS line
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, CAST(100002 AS BIGINT) AS lpos,
               'function() {{{{ return 0 }}}}' AS line
        FROM documents WHERE doc_id % 11 = 0
    )
    """


def _agg_lines(engine: str) -> str:
    """Kept lines -> one newline-joined string per doc, ordered by
    lpos (engine-specific: Spark sorts a struct array, DuckDB uses
    ordered string_agg)."""
    if engine == "spark":
        return ("array_join(transform(array_sort(collect_list("
                "struct(lpos, line))), x -> x.line), char(10))")
    return "string_agg(line, chr(10) ORDER BY lpos)"


def line_dedup_sql(engine: str) -> str:
    """CCNet paragraph-level dedup: corpus-wide line-hash keep-first,
    reassemble.  Per doc: total lines, removed count, deduplicated
    text.

    Scale shape — deliberately NOT a window: ``ROW_NUMBER() OVER
    (PARTITION BY line_hash)`` puts every copy of a hot boilerplate
    line (the nav/footer text CCNet exists to kill — a billion
    occurrences at 100 TB) into ONE window partition.  Keep-first is
    instead an integer argmin: pack (doc_id, lpos) into one BIGINT
    (lpos < 2^20 by construction), take MIN per hash (map-side
    partial aggregation — the hot key combines on every mapper), and
    equi-join the 1-row-per-hash minima back (AQE skew-join handles
    the probe side).

    Fingerprint width: TWO disjoint 60-bit md5 slices (chars 1-15
    and 16-30), 120 effective bits.  48 bits is fine at document
    cardinality but 10^10-10^11 distinct LINES put the 48-bit
    birthday term at 10^5-10^7 false merges; 120 bits makes the
    expected count zero at any real corpus size (SCALE.md)."""
    lh = hash60("line", engine)
    lh2 = hash60("line", engine, start=16)
    t = f"""
    WITH {_page_lines_fragment(engine)},
    keyed AS (
        SELECT doc_id, lpos, line, {lh} AS lh, {lh2} AS lh2,
               doc_id * 1048576 + lpos AS pk
        FROM page_lines
    ), firsts AS (
        SELECT lh, lh2, MIN(pk) AS minpk FROM keyed GROUP BY lh, lh2
    ), counts AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM page_lines GROUP BY doc_id
    ), rebuilt AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               {_agg_lines(engine)} AS text_clean
        FROM (SELECT k.doc_id, k.lpos, k.line
              FROM keyed k JOIN firsts f
                ON k.lh = f.lh AND k.lh2 = f.lh2
               AND k.pk = f.minpk) _k
        GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_lines,
           CAST(c.n_lines - COALESCE(r.n_kept, 0) AS BIGINT)
               AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM counts c LEFT JOIN rebuilt r ON c.doc_id = r.doc_id
    """
    return render(t, engine)


def line_dedup_fn(spark, sf_dir: str):
    """Spark execution strategy for line_dedup_ccnet — OUTPUT-identical
    to line_dedup_sql('spark'); DuckDB keeps the single-statement
    template as the oracle.

    r16 (optimization round, guide §2.4): Spark INLINES
    multi-referenced CTEs, so the template evaluated the synthesized
    page_lines fragment (tokenize + explode + two per-line md5 slices)
    TWICE — once under `keyed` for the argmin/join chain and once
    under `counts` for the per-doc totals — and then paid a third
    aggregation plus an outer join to stitch them.  The fn
    materializes KEYED once (localCheckpoint: doc_id, lpos, line, both
    hash slices, packed pk) and computes totals, removals, and the
    reassembled text in ONE aggregation over a single keyed↔firsts
    left join.  Value identity: firsts is unique per (lh, lh2) and the
    join adds pk = minpk, so no keyed row ever duplicates; kept ==
    match, n_removed = COUNT(*) - COUNT(minpk) (COUNT(col) skips
    NULLs), and collect_list skips the NULL structs of removed lines,
    so text_clean is byte-identical (array_sort on (lpos, line)
    structs = the template's ordering; zero kept lines yield
    array_join([]) = '' = the template's COALESCE).  Plan: the second
    fragment evaluation, the counts aggregation, and the final outer
    join are gone; firsts broadcasts back onto the checkpoint scan.

    100 TB shape unchanged: keep-first stays the groupBy-MIN argmin +
    equi-join (never a window); the checkpoint holds lines + three
    longs — nothing longer than a line materializes."""
    from ..confscope import scoped_parser_mode

    lh = hash60("line", "spark")
    lh2 = hash60("line", "spark", start=16)
    with scoped_parser_mode(spark, "true"):
        read_cached(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        keyed = spark.sql(render(f"""
            WITH {_page_lines_fragment('spark')}
            SELECT doc_id, lpos, line, {lh} AS lh, {lh2} AS lh2,
                   doc_id * 1048576 + lpos AS pk
            FROM page_lines
        """, "spark")).localCheckpoint()
        keyed.createOrReplaceTempView("__ld_keyed")
        return spark.sql("""
            WITH firsts AS (
                SELECT lh, lh2, MIN(pk) AS minpk FROM __ld_keyed
                GROUP BY lh, lh2
            )
            SELECT k.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) - COUNT(f.minpk) AS BIGINT)
                       AS n_removed,
                   array_join(transform(array_sort(collect_list(
                       CASE WHEN f.minpk IS NOT NULL
                            THEN struct(k.lpos, k.line) END)),
                       x -> x.line), char(10)) AS text_clean
            FROM __ld_keyed k LEFT JOIN firsts f
              ON k.lh = f.lh AND k.lh2 = f.lh2 AND k.pk = f.minpk
            GROUP BY k.doc_id
        """)


def gopher_rules_sql(engine: str) -> str:
    """Gopher §A1.1 quality rules, integer-exact; every rule its own
    0/1 column, keep = AND of all."""
    alpha_pred = ("x rlike '[a-z]'" if engine == "spark"
                  else "regexp_matches(x, '[a-z]')")
    t = f"""
    WITH {_page_lines_fragment(engine)},
    words AS (
        SELECT doc_id,
               CAST({{alen}}(t) AS BIGINT) AS n_words,
               CAST({sumlen('t', engine)} AS BIGINT) AS sum_len,
               CAST({{alen}}({{lfilter}}(t,
                    x -> {alpha_pred})) AS BIGINT) AS n_alpha,
               CAST({{alen}}({{lfilter}}(t,
                    x -> x IN {_GOPHER_STOPS})) AS BIGINT) AS n_stop,
               CAST({{alen}}({{lfilter}}(t,
                    x -> x = '#' OR x = '...')) AS BIGINT) AS n_sym
        FROM toks
    ), lines AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN line LIKE '-%' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bullet,
               CAST(SUM(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ellipsis
        FROM page_lines GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words, w.sum_len, w.n_alpha, w.n_stop,
           l.n_lines, l.n_bullet, l.n_ellipsis,
           CAST(CASE WHEN w.n_words >= 50 AND w.n_words <= 100000
                THEN 1 ELSE 0 END AS BIGINT) AS rule_word_count,
           CAST(CASE WHEN w.sum_len >= 3 * w.n_words
                      AND w.sum_len <= 10 * w.n_words
                THEN 1 ELSE 0 END AS BIGINT) AS rule_mean_word_len,
           CAST(CASE WHEN w.n_sym * 10 <= w.n_words
                THEN 1 ELSE 0 END AS BIGINT) AS rule_symbol_ratio,
           CAST(CASE WHEN l.n_bullet * 10 <= l.n_lines * 9
                THEN 1 ELSE 0 END AS BIGINT) AS rule_bullets,
           CAST(CASE WHEN l.n_ellipsis * 10 <= l.n_lines * 3
                THEN 1 ELSE 0 END AS BIGINT) AS rule_ellipsis,
           CAST(CASE WHEN w.n_alpha * 10 >= w.n_words * 8
                THEN 1 ELSE 0 END AS BIGINT) AS rule_alpha_words,
           CAST(CASE WHEN w.n_stop >= 2
                THEN 1 ELSE 0 END AS BIGINT) AS rule_stopwords,
           CAST(CASE WHEN w.n_words >= 50 AND w.n_words <= 100000
                      AND w.sum_len >= 3 * w.n_words
                      AND w.sum_len <= 10 * w.n_words
                      AND w.n_sym * 10 <= w.n_words
                      AND l.n_bullet * 10 <= l.n_lines * 9
                      AND l.n_ellipsis * 10 <= l.n_lines * 3
                      AND w.n_alpha * 10 >= w.n_words * 8
                      AND w.n_stop >= 2
                THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM words w JOIN lines l ON w.doc_id = l.doc_id
    """
    return render(t, engine)


def c4_clean_sql(engine: str) -> str:
    """C4 §2.2 line/page filters.  Returns per-rule counts, the page
    verdict, and the cleaned text (empty when the page is dropped)."""
    nwords = ("size(split(line, ' '))" if engine == "spark"
              else "len(regexp_split_to_array(line, ' '))")
    t = f"""
    WITH {_page_lines_fragment(engine)},
    judged AS (
        SELECT doc_id, lpos, line,
               CASE WHEN right(line, 1) IN ('.', '!', '?')
                     AND {nwords} >= 3
                     AND NOT line LIKE '%javascript%'
                    THEN 1 ELSE 0 END AS line_keep,
               CASE WHEN line LIKE '%{{{{%' THEN 1 ELSE 0 END
                   AS has_brace,
               CASE WHEN line LIKE '%lorem ipsum%' THEN 1 ELSE 0 END
                   AS has_lorem
        FROM page_lines
    ), pages AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(line_keep) AS BIGINT) AS n_kept,
               CAST(MAX(has_brace) AS BIGINT) AS has_brace,
               CAST(MAX(has_lorem) AS BIGINT) AS has_lorem
        FROM judged GROUP BY doc_id
    ), rebuilt AS (
        SELECT doc_id, {_agg_lines(engine)} AS text_clean
        FROM (SELECT doc_id, lpos, line FROM judged
              WHERE line_keep = 1) _k
        GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_lines, p.n_kept, p.has_brace, p.has_lorem,
           CAST(CASE WHEN p.n_kept >= 5 AND p.has_brace = 0
                      AND p.has_lorem = 0
                THEN 1 ELSE 0 END AS BIGINT) AS page_keep,
           CASE WHEN p.n_kept >= 5 AND p.has_brace = 0
                 AND p.has_lorem = 0
                THEN COALESCE(r.text_clean, '') ELSE '' END
               AS text_clean
    FROM pages p LEFT JOIN rebuilt r ON p.doc_id = r.doc_id
    """
    return render(t, engine)


def c4_clean_fn(spark, sf_dir: str):
    """Spark execution strategy for c4_clean — OUTPUT-identical to
    c4_clean_sql('spark'); DuckDB keeps the template as the oracle.

    r16 (optimization round, guide §2.4): the template references
    `judged` twice (pages + rebuilt), so Spark's CTE inlining ran the
    page_lines fragment (tokenize + explode) twice and then joined the
    two aggregates back per doc.  Every output column is computable in
    ONE aggregation over a single judged evaluation: the per-rule
    counts are plain aggregates, page_keep is a CASE over them, and
    the cleaned text collects only line_keep=1 structs (collect_list
    skips the NULL CASE branches; zero kept lines yield
    array_join([]) = '' — exactly the template's COALESCE/ELSE '').
    Plan: one fragment evaluation, one exchange, zero joins."""
    from ..confscope import scoped_parser_mode

    nwords = "size(split(line, ' '))"
    with scoped_parser_mode(spark, "true"):
        read_cached(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        return spark.sql(render(f"""
            WITH {_page_lines_fragment('spark')},
            judged AS (
                SELECT doc_id, lpos, line,
                       CASE WHEN right(line, 1) IN ('.', '!', '?')
                             AND {nwords} >= 3
                             AND NOT line LIKE '%javascript%'
                            THEN 1 ELSE 0 END AS line_keep,
                       CASE WHEN line LIKE '%{{{{%' THEN 1 ELSE 0 END
                           AS has_brace,
                       CASE WHEN line LIKE '%lorem ipsum%' THEN 1
                            ELSE 0 END AS has_lorem
                FROM page_lines
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(line_keep) AS BIGINT) AS n_kept,
                   CAST(MAX(has_brace) AS BIGINT) AS has_brace,
                   CAST(MAX(has_lorem) AS BIGINT) AS has_lorem,
                   CAST(CASE WHEN SUM(line_keep) >= 5
                              AND MAX(has_brace) = 0
                              AND MAX(has_lorem) = 0
                        THEN 1 ELSE 0 END AS BIGINT) AS page_keep,
                   CASE WHEN SUM(line_keep) >= 5
                         AND MAX(has_brace) = 0
                         AND MAX(has_lorem) = 0
                        THEN array_join(transform(array_sort(
                                 collect_list(CASE WHEN line_keep = 1
                                     THEN struct(lpos, line) END)),
                                 x -> x.line), char(10))
                        ELSE '' END AS text_clean
            FROM judged GROUP BY doc_id
        """, "spark"))


# registration happens through queries._register_template (the
# text.py convention): the Spark side executes sql_fn("spark") over
# temp views, the DuckDB rendering IS the oracle — except where a
# dedicated Spark strategy fn exists above (line_dedup_fn,
# c4_clean_fn), in which case the fn is the Spark side and the
# template remains the oracle.


def ccnet_ppl_buckets_sql(engine: str) -> str:
    """CCNet's head/middle/tail perplexity split (Wenzek et al.,
    LREC 2020 §3.3) — the recipe's OUTPUT shape: every document is
    assigned a per-language quality tercile by LM perplexity, and
    downstream training recipes consume "head" (and sometimes
    "middle") only.  The perplexity proxy is the house integer
    surprisal (corpus-unigram rarity ladder — pure integer
    comparisons, no log(); the surprisal_sql convention), scaled to
    the total-ordered integer key q = (rarity_sum * 1e6) div
    n_tokens, so every comparison in the split is BIGINT-exact and
    engine-identical.

    Cutoff derivation follows CCNet's actual deployment shape:
    tercile boundaries are computed ONCE on a deterministic
    multiplicative-hash SAMPLE (25% here; the fraction is the scale
    knob) and then applied as stateless thresholds to the full
    corpus — the full corpus is never sorted.  The per-language
    window runs over the sample only, ordered by (q, doc_id) so
    ties break identically everywhere.  Languages with an empty
    sample degrade to 'tail' (left join + COALESCE(-1)).

    100 TB shape: ONE token-hash shuffle (the vocab groupBy, shared
    with the surprisal family), one per-doc aggregation, a window
    over the bounded sample, then a broadcast of the ~|languages|
    cutoff rows onto a stateless CASE — no corpus sort, no corpus
    window.  A weekly snapshot persists the cutoffs and skips the
    sample pass entirely."""
    toks = render(TOKENS, engine)
    ladder = " ".join(f"WHEN n * {1 << k} >= t THEN {k}"
                      for k in range(31))
    idiv = "div" if engine == "spark" else "//"
    # Knuth multiplicative hash (curation.py sampling convention),
    # rendered overflow-free via hash_mod_expr (ADVICE r13: reduce
    # mod 2^20 BEFORE the multiply; naive doc_id * K overflows BIGINT
    # for doc_id > ~3.4e9 under Spark's ANSI default)
    from .curation import hash_mod_expr
    mod = 1 << 20
    t = f"""
    WITH toks AS (
        SELECT doc_id, lang, {{explode}}(tok_arr) AS tok
        FROM (SELECT doc_id, lang, {toks} AS tok_arr
              FROM documents) _t
    ), vocab AS (
        SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS t FROM vocab
    ), keyed AS (
        SELECT doc_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               (CAST(SUM(CASE {ladder} ELSE 31 END) AS BIGINT)
                * 1000000) {idiv} COUNT(*) AS q
        FROM toks JOIN vocab ON vocab.tok = toks.tok CROSS JOIN tot
        GROUP BY doc_id, lang
    ), ranked AS (
        SELECT lang, q,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY q, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS cnt
        FROM keyed
        WHERE {hash_mod_expr('doc_id')} < {mod // 4}
    ), cuts AS (
        SELECT lang,
               MAX(CASE WHEN rn * 3 <= cnt THEN q END) AS c1,
               MAX(CASE WHEN rn * 3 <= 2 * cnt THEN q END) AS c2
        FROM ranked GROUP BY lang
    )
    SELECT k.doc_id, k.lang, k.n_tokens, k.q AS rarity_q6,
           CASE WHEN k.q <= COALESCE(c.c1, -1) THEN 'head'
                WHEN k.q <= COALESCE(c.c2, -1) THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM keyed k LEFT JOIN cuts c ON c.lang = k.lang
    """
    return render(t, engine)
