"""Byte-pair-encoding tokenizer: merge-table TRAINING and APPLY.

The repo's `token_counts` entry counts BPE-ish regex tokens; a real
training-data pipeline learns an actual merge table (Sennrich et al.
2016, ACL — public algorithm) and tokenizes with it.  Both passes are
dual-engine SQL templates (the text.py convention; DuckDB rendering IS
the oracle), with the iterative merge loop UNROLLED like the k-means
entry (`similarity.py` Lloyd-iteration CTEs): N_MERGES rounds, each a
(pair-count, argmax, replace) CTE triple.

Representation: a word is a '|'-delimited symbol string, one trailing
delimiter per symbol — 'hello' -> 'h|e|l|l|o|</w>|' (the classic
end-of-word marker is its own symbol).  Applying merge (x, y) is then
ONE literal `replace(s, 'x|y|', 'xy|')`: both engines' replace() scans
left-to-right over non-overlapping occurrences without rescanning
replacements, which is EXACTLY BPE's greedy merge order — no fold, no
lambda, no Python.  (Symbols must not contain '|'; the whitespace
tokenizer guarantees that for this corpus, noted in the entry doc.)

Train: the word VOCABULARY (distinct word -> count) is the working
set, not the corpus — the classic Sennrich trick, so each round's
pair count is weighted by word frequency and touches only |vocab|
rows.  Argmax is ORDER BY count DESC, left, right LIMIT 1 —
deterministic cross-engine tie-break.  Each round's winning pair
feeds the next round's replace() through scalar subqueries (the
TPC-H q11 idiom).

Apply: a document's words run the SAME N_MERGES replaces in learned
rank order (classic BPE apply), then n_bpe_tokens = symbol count.

Scale: the only corpus-sized shuffle is the word-count groupBy (one
hash shuffle, map-side partials); every round after that operates on
the vocabulary relation, and each argmax broadcasts ONE row.  At
100 TB the vocab relation is still millions of rows, not trillions —
the same compression a production BPE trainer (HuggingFace
tokenizers' word-count pre-pass) relies on.  Spark re-executes the
CTE chain per scalar subquery (bounded: N_MERGES² tiny vocab aggs);
a long-lived trainer would checkpoint the vocab once — noted, not
needed at bench scale.
"""

from __future__ import annotations

from ..confscope import scoped_parser_mode
from ..scan import read_spread

from .text import render

N_MERGES = 8

_EOW = "</w>"


def _chars_delim(engine: str, expr: str) -> str:
    """word -> 'c|h|a|r|s|' (one trailing delimiter per symbol)."""
    if engine == "spark":
        return f"regexp_replace({expr}, '(.)', '$1|')"
    return f"regexp_replace({expr}, '(.)', '\\1|', 'g')"


def _vocab_cte(engine: str) -> str:
    """words (word->count) + v0 (delimited symbol string, count)."""
    return f"""
    WITH words AS {{mat}} (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT {{explode}}({{rsplit}}({{ntext}}, '\\s+')) AS w
            FROM documents WHERE text IS NOT NULL
        ) _w
        WHERE length(w) > 0
        GROUP BY w
    ), v0 AS {{mat}} (
        SELECT {_chars_delim(engine, 'w')} || '{_EOW}|' AS s, cnt
        FROM words
    )"""


def _round_ctes(r: int) -> str:
    """One merge round: pair counts over v{r-1}, argmax m{r}, merged
    vocabulary v{r}."""
    return f"""
    , p{r} AS {{mat}} (
        SELECT l, r2, SUM(cnt) AS c
        FROM (
            SELECT {{elem}}(sy, i) AS l, {{elem}}(sy, i + 1) AS r2,
                   cnt
            FROM (
                SELECT sy, cnt,
                       {{explode}}({{seq}}(1, {{alen}}(sy) - 2)) AS i
                FROM (SELECT {{rsplit}}(s, '\\|') AS sy, cnt
                      FROM v{r - 1}) _s{r}
                WHERE {{alen}}(sy) >= 3
            ) _e{r}
        ) _p{r}
        GROUP BY l, r2
    ), m{r} AS {{mat}} (
        SELECT l, r2, c FROM p{r} ORDER BY c DESC, l, r2 LIMIT 1
    ), v{r} AS {{mat}} (
        -- COALESCE guard: on a tiny corpus that exhausts its pairs
        -- before round {r}, m{r} is EMPTY and the scalar subqueries
        -- are NULL; replace(s, chr(1), chr(1)) is the identity, so
        -- exhausted rounds are no-ops instead of NULLing the vocab
        SELECT replace(s,
                   COALESCE((SELECT l || '|' || r2 || '|'
                             FROM m{r}), chr(1)),
                   COALESCE((SELECT l || r2 || '|' FROM m{r}),
                            chr(1))) AS s,
               cnt
        FROM v{r - 1}
    )"""


def bpe_train_sql(engine: str) -> str:
    """The learned merge table: (merge_rank, left_sym, right_sym,
    pair_count), N_MERGES rows in learned order."""
    t = _vocab_cte(engine)
    for r in range(1, N_MERGES + 1):
        t += _round_ctes(r)
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, l AS left_sym, "
        f"r2 AS right_sym, CAST(c AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, N_MERGES + 1))
    t += f"\n    SELECT * FROM ({rows}) _merges\n"
    return render(t, engine, mat="" if engine == "spark" else "MATERIALIZED")


def bpe_apply_sql(engine: str) -> str:
    """Tokenize every document with the learned merges: the same
    N_MERGES replaces in rank order over each word, then
    (doc_id, n_words, n_bpe_tokens, n_char_symbols) — the
    compression the merge table buys, per document."""
    t = _vocab_cte(engine)
    for r in range(1, N_MERGES + 1):
        t += _round_ctes(r)
    word_sym = _chars_delim(engine, "w") + f" || '{_EOW}|'"
    applied = word_sym
    for r in range(1, N_MERGES + 1):
        # same chr(1)-identity guard as v{r}: exhausted merge rounds
        # must be no-ops in the apply chain too
        applied = (f"replace({applied}, "
                   f"COALESCE((SELECT l || '|' || r2 || '|' "
                   f"FROM m{r}), chr(1)), "
                   f"COALESCE((SELECT l || r2 || '|' FROM m{r}), "
                   f"chr(1)))")
    t += f"""
    , docw AS {{mat}} (
        SELECT doc_id, w
        FROM (
            SELECT doc_id,
                   {{explode}}({{rsplit}}({{ntext}}, '\\s+')) AS w
            FROM documents WHERE text IS NOT NULL
        ) _d
        WHERE length(w) > 0
    ), seg AS {{mat}} (
        SELECT doc_id,
               {{alen}}({{rsplit}}({applied}, '\\|')) - 1
                   AS n_syms,
               length(w) + 1 AS n_chars_eow
        FROM docw
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars_eow) AS BIGINT) AS n_char_symbols
    FROM seg GROUP BY doc_id
    """
    return render(t, engine, mat="" if engine == "spark" else "MATERIALIZED")


# ---------------------------------------------------------------------------
# Spark execution strategy (the substring_spans_fn convention)
# ---------------------------------------------------------------------------
#
# Spark CANNOT run the unrolled template: every vocabulary CTE v{r}
# is referenced twice (by p{r+1} and v{r+1}), and Spark's optimizer
# inlines the chain — 2^N_MERGES logical-plan copies, an OOM at
# PLAN time (observed: driver heap exhausted during sql() analysis
# at N_MERGES=8).  DuckDB runs the identical template with
# MATERIALIZED CTEs.  The Spark strategy below executes the SAME
# algorithm imperatively: each round is one tiny vocab aggregation
# (argmax collected — ONE row, the k-means broadcast-centroid
# convention) and one literal replace chained lazily onto the
# checkpointed v0 vocabulary (depth <= N_MERGES native replaces —
# linear, nothing like the 2^N CTE inlining above), so plans stay
# small and the loop costs one job per round.  Tie-breaks, counts,
# and the replace semantics are identical by construction; the
# template-vs-fn equality test pins it.

_PAIR_ARGMAX_SQL = """
    SELECT l, r2, c FROM (
        SELECT l, r2, SUM(cnt) AS c
        FROM (
            SELECT {elem}(sy, i) AS l, {elem}(sy, i + 1) AS r2, cnt
            FROM (
                SELECT sy, cnt,
                       {explode}({seq}(1, {alen}(sy) - 2)) AS i
                FROM (SELECT {rsplit}(s, '\\|') AS sy, cnt
                      FROM bpe_vocab) _s
                WHERE {alen}(sy) >= 3
            ) _e
        ) _p
        GROUP BY l, r2
    ) _q ORDER BY c DESC, l, r2 LIMIT 1
"""


def _learn_merges(spark, sf_dir: str):
    """Run the N_MERGES rounds on Spark; returns
    [(rank, left, right, count)] and leaves the documents view
    registered."""
    from pyspark.sql import functions as F

    with scoped_parser_mode(spark, "true"):
        read_spread(spark, f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        vocab = spark.sql(render(
            _vocab_cte("spark") + " SELECT s, cnt FROM v0",
            "spark", mat="")).localCheckpoint()
        merges = []
        argmax = render(_PAIR_ARGMAX_SQL, "spark")
        for rank in range(1, N_MERGES + 1):
            vocab.createOrReplaceTempView("bpe_vocab")
            row = spark.sql(argmax).collect()
            if not row:
                break
            l, r2, c = row[0]
            merges.append((rank, l, r2, int(c)))
            # F.replace is literal (no regex/quoting hazards for corpus-
            # derived symbols).  No per-round localCheckpoint (r16):
            # lineage grows by ONE native replace per round (depth <=
            # N_MERGES = 8 on top of the v0 checkpoint — nothing like
            # the quadratic CTE nesting the imperative form exists to
            # avoid), and each round's argmax replays those replaces in
            # the same codegen stage it was already scanning the vocab
            # in.  The checkpoint was a full extra job per round purely
            # to materialize a tiny relation read once — dropping it
            # halves the loop's driver actions (measured ~2x on the
            # merge loop at sf0.1).
            vocab = vocab.select(
                F.replace("s", F.lit(f"{l}|{r2}|"),
                          F.lit(f"{l}{r2}|")).alias("s"),
                "cnt")
        return merges


def bpe_train_fn(spark, sf_dir: str):
    """Spark strategy for `bpe_train` (same output as the DuckDB
    template)."""
    merges = _learn_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "merge_rank long, left_sym string, "
                "right_sym string, pair_count long")


def bpe_apply_fn(spark, sf_dir: str):
    """Spark strategy for `bpe_apply`: learn the merges (each a
    1-row collect), then ONE corpus pass applying the ranked literal
    replace chain — no scalar subqueries, constant-size plan."""
    from pyspark.sql import functions as F

    merges = _learn_merges(spark, sf_dir)
    # own parser scope: this template carries a verbatim '\s+' —
    # previously it silently inherited the mode _learn_merges LEAKED
    # (the exact coupling class confscope.py exists to end; the
    # restore exposed it as a real latent bug)
    with scoped_parser_mode(spark, "true"):
        docw = spark.sql(render(f"""
            SELECT doc_id, w
            FROM (
                SELECT doc_id,
                       {{explode}}({{rsplit}}({{ntext}}, '\\s+')) AS w
                FROM documents WHERE text IS NOT NULL
            ) _d
            WHERE length(w) > 0
        """, "spark"))
    s = F.concat(F.regexp_replace("w", "(.)", "$1|"),
                 F.lit(_EOW + "|"))
    for _rank, l, r2, _c in merges:
        s = F.replace(s, F.lit(f"{l}|{r2}|"), F.lit(f"{l}{r2}|"))
    seg = docw.select(
        "doc_id",
        (F.size(F.split(s, "\\|")) - 1).alias("n_syms"),
        (F.length("w") + 1).alias("n_chars_eow"))
    return seg.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        F.sum("n_chars_eow").cast("long").alias("n_char_symbols"))
