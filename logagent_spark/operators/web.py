"""Web-page text extraction — the html:binary -> text column step of the
BASELINE input shape (CC-style pages `(url, warc_ts, html, text, lang)`).

The reference operates on already-extracted log lines; the north-star
workload reads Common-Crawl-style pages where the payload arrives as an
HTML byte blob and the per-row invariant is BYTE-IDENTICAL extracted
text per url. This module is that extraction as pure Column expressions
(JVM regex, whole-stage codegen — no UDF):

  * drop <script>/<style> subtrees (their text is not page text);
  * strip tags;
  * decode the five basic entities, `&amp;` LAST (the exact inverse of
    escape order, so escape -> extract round-trips byte-identically);
  * whitespace is preserved verbatim — collapsing would break the
    byte-identity invariant.

Scope: deterministic extraction for well-formed pages, the contract the
synthetic corpus and the invariant need. A production crawler adds a
real parser for malformed markup behind the same column signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["escape_html_text", "html_to_text", "extract_text_from_html"]


def escape_html_text(col: Column) -> Column:
    """Text -> html-safe text (&, <, > in escape order). The twin used
    to BUILD pages in tests/oracles; html_to_text inverts it exactly."""
    e = F.replace(col, F.lit("&"), F.lit("&amp;"))
    e = F.replace(e, F.lit("<"), F.lit("&lt;"))
    return F.replace(e, F.lit(">"), F.lit("&gt;"))


def html_to_text(col: Column) -> Column:
    """HTML string -> text: script/style subtrees dropped, comments and
    CDATA sections dropped (their bodies are NOT page text), tags
    stripped, basic entities decoded (amp last). Pure Column exprs.

    ONE regex pass does all strips via alternation, ordered most- to
    least-specific: script/style subtree-with-close, then `<!--...-->`
    comment, then `<![CDATA[...]]>`, then bare tag as the fallback — an
    UNCLOSED script/comment/CDATA opener degrades to a tag strip (its
    body text leaks; a truncated page has no well-defined extraction,
    documented scope). Each regex pass over a KB-scale string costs ~4s
    per 4M docs, so passes are the budget here. Entity decoding (5
    literal-replace string copies) only runs on rows that contain '&'
    at all — most real page text has no entities, and `when` makes the
    whole chain a no-op copy for them."""
    # the common '<' prefix is FACTORED OUT of the alternation: the
    # engine attempts a match at every input position, and most
    # positions are prose — one failed char test there instead of four
    # (unfactored, the 4-way alternation cost ~1.8x on the 4M-doc bench)
    stripped = F.regexp_replace(
        col,
        r"(?is)<(?:(script|style)\b[^>]*>.*?</\1\s*>"
        r"|!--.*?-->"
        r"|!\[CDATA\[.*?\]\]>"
        r"|[^>]+>)",
        "",
    )
    c = F.replace(stripped, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&#39;"), F.lit("'"))
    decoded = F.replace(c, F.lit("&amp;"), F.lit("&"))
    return F.when(stripped.contains("&"), decoded).otherwise(stripped)


def extract_text_from_html(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Pages-table adapter: decode the binary html column and extract
    text scan-side (the step ahead of `from_pages` when the corpus
    arrives without a pre-extracted text column)."""
    return df.withColumn(
        out_col, html_to_text(F.col(html_col).cast("string"))
    )
