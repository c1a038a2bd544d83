"""HTML -> text extraction (the WARC->documents step of a crawl
pipeline).

Between `warc.py` (container parse) and everything content-based
(dedup, quality, curation) sits boilerplate-free text extraction:
drop comments / script / style, strip tags, decode entities, collapse
whitespace, and pull out the title and link count.  CCNet, RefinedWeb
and every Common Crawl derivative have this exact stage.

All operators are dual-engine SQL (the text.py convention — the
DuckDB rendering IS the oracle), pure projections with NO shuffle and
no Python: regexp_replace chains driven by a global-replace shim
(Spark's regexp_replace is always-global; DuckDB needs the 'g'
option).  Inline `(?is)` flags are portable (Java regex and RE2
both), and non-greedy quantifiers are RE2-supported.  Templates are
rendered under `escapedStringLiterals=true` (the `_run_template`
convention), so regex text is verbatim-identical across engines.

The fixture HTML is synthesized in-template from the documents table
(the synth_media convention): doctype + comment containing fake tags,
a script block with `<` in code, a style block, attributes, entities
(the escaped document text), links, and a self-closing img — every
hazard the strip chain must survive; extraction must recover the
document text EXACTLY (pinned by the hand-computed unit test and,
end-to-end, by the `warc_to_documents` closed-form oracle).
"""

from __future__ import annotations


def rrg(x: str, pat: str, rep: str, engine: str) -> str:
    """GLOBAL regexp_replace in either engine's dialect."""
    if engine == "spark":
        return f"regexp_replace({x}, '{pat}', '{rep}')"
    return f"regexp_replace({x}, '{pat}', '{rep}', 'g')"


def unescape_entities(x: str) -> str:
    """Decode the core entities; &amp; LAST (the inverse of escape
    order, so escaped ampersands survive round-trips)."""
    x = f"replace({x}, '&lt;', '<')"
    x = f"replace({x}, '&gt;', '>')"
    x = f"replace({x}, '&quot;', '\"')"
    return f"replace({x}, '&amp;', '&')"


def strip_html_expr(x: str, engine: str) -> str:
    """html string -> clean text: comments, script/style (content
    included), tags -> space, entity decode, whitespace collapse."""
    x = rrg(x, '(?s)<!--.*?-->', ' ', engine)
    x = rrg(x, '(?is)<script[^>]*>.*?</script>', ' ', engine)
    x = rrg(x, '(?is)<style[^>]*>.*?</style>', ' ', engine)
    x = rrg(x, '<[^>]*>', ' ', engine)
    x = unescape_entities(x)
    x = rrg(x, '\\s+', ' ', engine)
    return f"trim({x})"


def strip_html_col(col):
    """Column-function twin of ``strip_html_expr('...', 'spark')`` —
    for call sites OUTSIDE the dual-engine template convention
    (streaming projections, ad-hoc DataFrames).  pyspark column
    functions take pattern strings directly, with NO SQL-literal
    escape processing, so this form never needs (and never toggles)
    spark.sql.parser.escapedStringLiterals — mutating that conf
    session-globally silently flips the meaning of '\\\\.'-style
    regexes in later SQL (the dynamo escape-mode bug class).
    Parity with the template form is test-pinned."""
    from pyspark.sql import functions as F

    x = F.regexp_replace(col, '(?s)<!--.*?-->', ' ')
    x = F.regexp_replace(x, '(?is)<script[^>]*>.*?</script>', ' ')
    x = F.regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ')
    x = F.regexp_replace(x, '<[^>]*>', ' ')
    for ent, ch in (('&lt;', '<'), ('&gt;', '>'),
                    ('&quot;', '"'), ('&amp;', '&')):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, r'\s+', ' ')
    return F.trim(x)


# fixture: messy-but-deterministic HTML per document.  The comment
# contains a fake <div>, the script compares with '<', the style has
# braces, the anchor count varies with doc_id, and the body text is
# the entity-escaped document text.
_ESC_TEXT = ("replace(replace(replace(text, '&', '&amp;'), "
             "'<', '&lt;'), '>', '&gt;')")

_FIXTURE_HTML = (
    "'<!DOCTYPE html><html lang=\"' || lang || '\"><head>"
    "<!-- generated <div> not a tag --><title>Doc ' || doc_id || "
    "' (' || source || ')</title>"
    "<style>p { margin: 0; }</style>"
    "<script type=\"text/javascript\">if (a<b && b>0) { x = \"<p>\"; }"
    "</script></head><body><h1 class=\"hd\">Doc ' || doc_id || "
    "'</h1>' || CASE WHEN doc_id % 3 = 0 THEN "
    "'<a href=\"/prev/' || doc_id || '\">prev</a>' ELSE '' END || "
    "'<p id=\"main\">' || " + _ESC_TEXT + " || '</p>' || "
    "CASE WHEN doc_id % 2 = 0 THEN "
    "'<a href=\"/next/' || doc_id || '\">next</a>"
    "<img src=\"/i.png\"/>' ELSE '' END || '</body></html>'"
)


def html_extract_sql(engine: str) -> str:
    """Per-document extraction record: title, clean text, link count,
    raw/clean lengths.  Link count via occurrence arithmetic
    (length-difference of a literal replace), not regex."""
    title = ("regexp_extract(html, '(?is)<title>(.*?)</title>', 1)")
    body = strip_html_expr("html", engine)
    return f"""
    WITH h AS (
        SELECT doc_id, {_FIXTURE_HTML} AS html
        FROM documents
    )
    SELECT doc_id,
           {title} AS title,
           {body} AS text_clean,
           CAST((length(html) - length(replace(html, '<a href', '')))
                / 7 AS BIGINT) AS n_links,
           CAST(length(html) AS BIGINT) AS n_raw_chars
    FROM h
    """
