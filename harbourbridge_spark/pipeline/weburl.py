"""URL/domain-level corpus curation (CCNet / RefinedWeb-style).

Web-scale training corpora are deduplicated and capped at the URL and
registered-domain level BEFORE any content-based pass: CCNet drops
exact normalized-URL duplicates, RefinedWeb additionally caps the
number of documents any single registered domain may contribute so
one crawl-friendly site cannot dominate the mixture.  Three operators,
each a dual-engine SQL template (the text.py convention — the DuckDB
rendering IS the oracle):

- `url_canonicalize_sql`: raw URL -> canonical form.  Steps, in
  order: lowercase; strip scheme (`https?://`); strip `#fragment`;
  strip `?query`; strip leading `www.`; strip an explicit `:port`;
  strip trailing `/index.html`; strip trailing `/`.  Plus `host`
  (first path-free label run) and `registered_domain` via the
  embedded public-suffix-list snapshot (`pipeline/psl.py`, VERDICT
  r13 ask 4): longest-match over the ~1.1k-rule relation with
  wildcard (`*.ck`) and exception (`!www.ck`) semantics — three
  BROADCAST joins on a pure projection, replacing the former
  12-combination mini-list that mis-derived whole countries
  (com.br, co.in, github.io, ...).
- `domain_cap_manifest_sql`: the curation manifest — exact
  canonical-URL dedup (keep lowest doc_id) then a per-registered-
  domain cap of DOMAIN_CAP kept docs; every doc gets an action of
  'keep' | 'url_duplicate' | 'domain_cap'.
- `domain_stats_sql`: per-domain accounting (docs, distinct URLs,
  kept, URL-duplicate count) — the dashboard for choosing caps.

The documents table carries no URL column, so the fixture URL is
synthesized deterministically per doc INSIDE the template (the
synth_media convention): six messy variants — uppercase scheme/host,
`www.`, `:443`, `?utm` params, `#fragment`, trailing slash,
`/index.html`, schemeless — that all canonicalize into one URL per
3-doc article group, plus suffix-class slices: `shop.brandK.co.uk`
(doc_id % 11, two-level UK suffix), `loja.brandK.com.br`
(doc_id % 13 = 6, the non-UK two-level suffix the r13 verdict asked
for), `user-hK.github.io` (doc_id % 17 = 2, private-section suffix),
and `travel.brandK.np` (doc_id % 23 = 8, `*.np` wildcard rule).

Scale: canonicalization is a pure projection (no shuffle); the
manifest shuffles twice on high-cardinality keys (url, then
registered_domain) with window ROW_NUMBERs — both AQE-coalescible;
stats is one more low-cardinality groupBy.  No Python anywhere.
"""

from __future__ import annotations

from .text import render

DOMAIN_CAP = 5

# ---------------------------------------------------------------------------
# fixture URL (closed-form, shared by Spark and the DuckDB oracle)
# ---------------------------------------------------------------------------

# aid: 3-doc article groups; hk: 7 hosts
_RAW_URL = """
    CASE WHEN doc_id % 11 = 0 THEN
        'https://shop.brand' || (doc_id {idiv} 3) % 7
            || '.co.uk/items/' || doc_id {idiv} 3
    WHEN doc_id % 13 = 6 THEN
        'https://loja.brand' || (doc_id {idiv} 3) % 7
            || '.com.br/p/' || doc_id {idiv} 3
    WHEN doc_id % 17 = 2 THEN
        'https://user-h' || (doc_id {idiv} 3) % 7
            || '.github.io/post/' || doc_id {idiv} 3
    WHEN doc_id % 23 = 8 THEN
        'https://travel.brand' || (doc_id {idiv} 3) % 7
            || '.np/tour/' || doc_id {idiv} 3
    ELSE CASE doc_id % 6
        WHEN 0 THEN 'https://WWW.articles-h' || (doc_id {idiv} 3) % 7
            || '.com/articles/' || doc_id {idiv} 3
            || '?utm_source=' || source
        WHEN 1 THEN 'http://articles-h' || (doc_id {idiv} 3) % 7
            || '.com/articles/' || doc_id {idiv} 3 || '/'
        WHEN 2 THEN 'https://www.articles-h' || (doc_id {idiv} 3) % 7
            || '.com:443/articles/' || doc_id {idiv} 3 || '#frag'
        WHEN 3 THEN 'https://articles-h' || (doc_id {idiv} 3) % 7
            || '.com/articles/' || doc_id {idiv} 3 || '/index.html'
        WHEN 4 THEN 'articles-h' || (doc_id {idiv} 3) % 7
            || '.com/articles/' || doc_id {idiv} 3
        ELSE 'HTTP://ARTICLES-H' || (doc_id {idiv} 3) % 7
            || '.COM/articles/' || doc_id {idiv} 3 || '?'
    END END
"""


def _canon_expr(raw: str) -> str:
    """Canonicalization chain over a raw-URL SQL expression.  Every
    regexp is ANCHORED, so DuckDB's replace-first default and Spark's
    replace-all agree; {b1} is the engine's group-1 backreference."""
    x = f"lower({raw})"
    x = f"regexp_replace({x}, '^https?://', '')"
    x = f"regexp_replace({x}, '#.*$', '')"
    x = f"regexp_replace({x}, '\\?.*$', '')"
    x = f"regexp_replace({x}, '^www\\.', '')"
    x = f"regexp_replace({x}, '^([^/:]+):[0-9]+', {{b1}})"
    x = f"regexp_replace({x}, '/index\\.html$', '')"
    x = f"regexp_replace({x}, '/$', '')"
    return x


_HOST = "regexp_extract(url, '^([^/]+)', 1)"


def _extras(engine: str) -> dict:
    return {"idiv": "DIV" if engine == "spark" else "//",
            "b1": "'$1'" if engine == "spark" else "'\\1'"}


def _url_cte() -> str:
    """Shared CTE prefix: doc_id, raw_url, url, host, reg_domain.
    reg_domain comes from the embedded public-suffix-list snapshot
    (pipeline/psl.py): longest-match over the exact-rule relation
    (label-count-bucketed broadcast joins against 2/3/4-label host
    tails — r15: each probe joins only its own bucket) plus the
    inline wildcard/exception rules — still a pure projection of the
    corpus; the PSL relation is broadcast-sized in both engines."""
    from .psl import reg_domain_ctes, reg_domain_expr
    return f"""
    WITH raw AS (
        SELECT doc_id, ({_RAW_URL}) AS raw_url FROM documents
    ), canon AS (
        SELECT doc_id, raw_url,
               {_canon_expr('raw_url')} AS url
        FROM raw
    ), hosted AS (
        SELECT doc_id, raw_url, url, {_HOST} AS host FROM canon
    ), {reg_domain_ctes('hosted')}, u AS (
        SELECT doc_id, raw_url, url, host,
               ({reg_domain_expr()}) AS reg_domain
        FROM _psl_hit
    )
    """


def url_canonicalize_sql(engine: str) -> str:
    t = _url_cte() + """
    SELECT doc_id, raw_url, url, host,
           reg_domain AS registered_domain
    FROM u
    """
    return render(t, engine, **_extras(engine))


def domain_cap_manifest_sql(engine: str) -> str:
    """Exact URL dedup (keep lowest doc_id) then per-registered-domain
    cap: rn_dom ranks only the URL-canonical survivors (the boolean
    partition key trick keeps it one window pass)."""
    t = _url_cte() + f"""
    , ranked AS (
        SELECT doc_id, url, reg_domain,
               ROW_NUMBER() OVER (PARTITION BY url
                                  ORDER BY doc_id) AS rn_url
        FROM u
    ), capped AS (
        SELECT doc_id, url, reg_domain, rn_url,
               ROW_NUMBER() OVER (
                   PARTITION BY reg_domain,
                                CASE WHEN rn_url = 1 THEN 0 ELSE 1 END
                   ORDER BY doc_id) AS rn_dom
        FROM ranked
    )
    SELECT doc_id, url, reg_domain AS registered_domain,
           CASE WHEN rn_url > 1 THEN 'url_duplicate'
                WHEN rn_dom > {DOMAIN_CAP} THEN 'domain_cap'
                ELSE 'keep' END AS action
    FROM capped
    """
    return render(t, engine, **_extras(engine))


def domain_stats_sql(engine: str) -> str:
    """Per-domain curation dashboard over the same manifest logic."""
    t = _url_cte() + f"""
    , ranked AS (
        SELECT doc_id, url, reg_domain,
               ROW_NUMBER() OVER (PARTITION BY url
                                  ORDER BY doc_id) AS rn_url
        FROM u
    ), capped AS (
        SELECT doc_id, url, reg_domain, rn_url,
               ROW_NUMBER() OVER (
                   PARTITION BY reg_domain,
                                CASE WHEN rn_url = 1 THEN 0 ELSE 1 END
                   ORDER BY doc_id) AS rn_dom
        FROM ranked
    )
    SELECT reg_domain AS registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
           CAST(SUM(CASE WHEN rn_url > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_url_duplicates,
           CAST(SUM(CASE WHEN rn_url = 1
                         AND rn_dom <= {DOMAIN_CAP}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM capped
    GROUP BY reg_domain
    """
    return render(t, engine, **_extras(engine))


# hazard-extended fixture for the URL quality filter: the shared
# _RAW_URL scheme plus three planted hazard classes on disjoint
# doc_id schedules (a blocklisted gambling/pharma domain, an
# IP-literal host, a crawler-trap deep path with a tracking-ridden
# query).  Separate expression so the three pinned url_* entries
# keep their fixture byte-stable.
_RAW_URL_HAZARD = """
    CASE WHEN doc_id % 13 = 1 THEN
        'https://best-casino' || doc_id % 5
            || '.example/pills/' || doc_id
    WHEN doc_id % 13 = 3 THEN
        'https://sweeps-h' || doc_id % 7
            || '.com/lottery/' || doc_id || '?track=' || doc_id
    WHEN doc_id % 13 = 5 THEN
        'http://10.' || doc_id % 200 || '.3.7/page/' || doc_id
    WHEN doc_id % 13 = 7 THEN
        'https://forum-h' || doc_id % 7
            || '.com/t/' || doc_id
            || '?session=' || doc_id * 7919
            || '&ref=' || doc_id * 104729
    WHEN doc_id % 13 = 9 THEN
        'https://trap-h' || doc_id % 7
            || '.com/a/b/c/d/e/f/g/h/i/' || doc_id
    ELSE """ + _RAW_URL + " END"

# (word, weight) soft list — the RefinedWeb G.1 shape: hard
# blocklist for known-bad registered domains, weighted substring
# scoring for the grey zone
_URL_BADWORDS = (("casino", 2), ("pills", 2), ("lottery", 1),
                 ("track", 1))
_SOFT_DROP = 2          # soft_score >= this drops
_MAX_PATH_DEPTH = 8
_MAX_QUERY_LEN = 24


# hard registered-domain blocklist (RefinedWeb G.1 runs a ~4.6M-
# domain list; these are the fixture's planted-bad REGISTERED
# domains — at deployment scale the list is a broadcast relation
# exactly like the PSL)
_DOMAIN_BLOCKLIST = tuple(f"best-casino{k}.example" for k in range(5))


def url_quality_filter_sql(engine: str) -> str:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 G.1) —
    the crawl-curation gate that runs BEFORE any content is fetched
    or scored: per URL a hard REGISTERED-DOMAIN blocklist hit (the
    domain comes from the embedded PSL snapshot, pipeline/psl.py —
    a host-prefix test would miss `casino.evil.example` vs
    `evil.example` list entries), a weighted soft bad-word score
    over the full URL, IP-literal-host detection, path depth, and
    query length; verdict = keep unless any hard rule or the soft
    threshold trips.  One projection over the canonicalized URL
    plus the PSL's broadcast-sized suffix joins — the corpus is
    never shuffled; blocklist/word lists are literals here and
    broadcast maps at deployment scale.  Every signal is its own
    column — the filter is auditable, not a black box."""
    from .psl import reg_domain_ctes, reg_domain_expr
    host_expr = "regexp_extract(url, '^([^/]+)', 1)"
    score = " + ".join(
        f"CASE WHEN instr(raw_url, '{w}') > 0 THEN {wt} ELSE 0 END"
        for w, wt in _URL_BADWORDS)
    blocked = ", ".join(f"'{d}'" for d in _DOMAIN_BLOCKLIST)
    t = f"""
    WITH raw AS (
        SELECT doc_id, lower({_RAW_URL_HAZARD}) AS raw_url
        FROM documents
    ), canon AS (
        SELECT doc_id, raw_url,
               {_canon_expr('raw_url')} AS url
        FROM raw
    ), hosted AS (
        SELECT doc_id, raw_url, url, {host_expr} AS host FROM canon
    ), {reg_domain_ctes('hosted')}, sig AS (
        SELECT doc_id, raw_url, url, host,
               ({reg_domain_expr()}) AS reg_domain,
               ({score}) AS soft_score,
               CASE WHEN regexp_extract(host,
                    '^([0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+)$', 1) <> ''
                    THEN 1 ELSE 0 END AS is_ip_host,
               CAST(length(url) - length(replace(url, '/', ''))
                    AS BIGINT) AS path_depth,
               CAST(CASE WHEN instr(raw_url, '?') > 0
                    THEN length(raw_url) - instr(raw_url, '?')
                    ELSE 0 END AS BIGINT) AS query_len
        FROM _psl_hit
    )
    SELECT doc_id, host, reg_domain AS registered_domain,
           CAST(soft_score AS BIGINT) AS soft_score,
           CAST(is_ip_host AS BIGINT) AS is_ip_host,
           path_depth, query_len,
           CASE WHEN reg_domain IN ({blocked}) THEN 'blocklist'
                WHEN is_ip_host = 1 THEN 'ip_host'
                WHEN soft_score >= {_SOFT_DROP} THEN 'soft_words'
                WHEN path_depth > {_MAX_PATH_DEPTH} THEN 'deep_path'
                WHEN query_len > {_MAX_QUERY_LEN} THEN 'long_query'
                ELSE 'keep' END AS verdict
    FROM sig
    """
    return render(t, engine, **_extras(engine))
