"""Web-page text extraction — the html:binary -> text column step of the
BASELINE input shape (CC-style pages `(url, warc_ts, html, text, lang)`).

The reference operates on already-extracted log lines; the north-star
workload reads Common-Crawl-style pages where the payload arrives as an
HTML byte blob and the per-row invariant is BYTE-IDENTICAL extracted
text per url. This module is that extraction as pure Column expressions
(JVM regex, whole-stage codegen — no UDF):

  * drop <script>/<style> subtrees (their text is not page text);
  * strip tags;
  * decode entities: the named basic set (`amp lt gt quot apos`), the
    ~100 common extended names (NAMED_ENTITIES: typography, currency,
    signs, Latin-1 letters), their uppercase variants (UPPER_ENTITIES —
    case-sensitive, `&Aacute;` is a different character than
    `&aacute;`), the spec's LEGACY semicolon-optional forms (`&amp`
    `&copy` `&Ouml` … decode when not followed by `[a-zA-Z0-9=]` —
    the attribute-value rule applied uniformly; the data-state spec
    would decode '&amplitude' as '&litude', rejected here for byte
    fidelity), and numeric character references (`&#NN;` decimal /
    `&#xNN;` hex, UNBOUNDED digit runs with leading zeros, full
    Unicode range incl. surrogate-pair codepoints, HTML5 U+FFFD
    replacement for invalid/overflowing codepoints) — basic-named-only
    rows take an amp-LAST literal-replace chain (the exact inverse of
    escape order, so escape -> extract round-trips byte-identically),
    rows with numeric, extended, uppercase, or legacy-unterminated
    refs take a single-pass split/decode/stitch (`decode_entities`);
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

# Extended named entities (HTML5 names -> codepoints), the common set
# beyond the five basic ones: typography, currency, signs, Latin-1
# letters (lowercase; uppercase variants live in UPPER_ENTITIES).
# Names outside these tables (the long tail of the HTML5 list, e.g.
# `&notin;`) stay literal — documented scope.
NAMED_ENTITIES = {
    "nbsp": 0xA0, "iexcl": 0xA1, "cent": 0xA2, "pound": 0xA3,
    "curren": 0xA4, "yen": 0xA5, "brvbar": 0xA6, "sect": 0xA7,
    "uml": 0xA8, "copy": 0xA9, "ordf": 0xAA, "laquo": 0xAB,
    "not": 0xAC, "shy": 0xAD, "reg": 0xAE, "macr": 0xAF,
    "deg": 0xB0, "plusmn": 0xB1, "sup2": 0xB2, "sup3": 0xB3,
    "acute": 0xB4, "micro": 0xB5, "para": 0xB6, "middot": 0xB7,
    "cedil": 0xB8, "sup1": 0xB9, "ordm": 0xBA, "raquo": 0xBB,
    "frac14": 0xBC, "frac12": 0xBD, "frac34": 0xBE, "iquest": 0xBF,
    "agrave": 0xE0, "aacute": 0xE1, "acirc": 0xE2, "atilde": 0xE3,
    "auml": 0xE4, "aring": 0xE5, "aelig": 0xE6, "ccedil": 0xE7,
    "egrave": 0xE8, "eacute": 0xE9, "ecirc": 0xEA, "euml": 0xEB,
    "igrave": 0xEC, "iacute": 0xED, "icirc": 0xEE, "iuml": 0xEF,
    "eth": 0xF0, "ntilde": 0xF1, "ograve": 0xF2, "oacute": 0xF3,
    "ocirc": 0xF4, "otilde": 0xF5, "ouml": 0xF6, "divide": 0xF7,
    "oslash": 0xF8, "ugrave": 0xF9, "uacute": 0xFA, "ucirc": 0xFB,
    "uuml": 0xFC, "yacute": 0xFD, "thorn": 0xFE, "yuml": 0xFF,
    "szlig": 0xDF, "times": 0xD7,
    "oelig": 0x153, "scaron": 0x161, "fnof": 0x192,
    "ndash": 0x2013, "mdash": 0x2014, "lsquo": 0x2018, "rsquo": 0x2019,
    "sbquo": 0x201A, "ldquo": 0x201C, "rdquo": 0x201D, "bdquo": 0x201E,
    "dagger": 0x2020, "bull": 0x2022, "hellip": 0x2026, "permil": 0x2030,
    "prime": 0x2032, "lsaquo": 0x2039, "rsaquo": 0x203A, "euro": 0x20AC,
    "trade": 0x2122, "minus": 0x2212, "infin": 0x221E, "ne": 0x2260,
    "le": 0x2264, "ge": 0x2265, "larr": 0x2190, "uarr": 0x2191,
    "rarr": 0x2192, "darr": 0x2193, "harr": 0x2194,
}

# Uppercase Latin-1 letter entities (distinct characters, not aliases)
# plus the spec's uppercase ALIASES of basic/sign names. Names are
# case-SENSITIVE throughout: &Aacute; is U+00C1, &aacute; is U+00E1.
UPPER_ENTITIES = {
    "Agrave": 0xC0, "Aacute": 0xC1, "Acirc": 0xC2, "Atilde": 0xC3,
    "Auml": 0xC4, "Aring": 0xC5, "AElig": 0xC6, "Ccedil": 0xC7,
    "Egrave": 0xC8, "Eacute": 0xC9, "Ecirc": 0xCA, "Euml": 0xCB,
    "Igrave": 0xCC, "Iacute": 0xCD, "Icirc": 0xCE, "Iuml": 0xCF,
    "ETH": 0xD0, "Ntilde": 0xD1, "Ograve": 0xD2, "Oacute": 0xD3,
    "Ocirc": 0xD4, "Otilde": 0xD5, "Ouml": 0xD6, "Oslash": 0xD8,
    "Ugrave": 0xD9, "Uacute": 0xDA, "Ucirc": 0xDB, "Uuml": 0xDC,
    "Yacute": 0xDD, "THORN": 0xDE,
    "AMP": 0x26, "LT": 0x3C, "GT": 0x3E, "QUOT": 0x22,
    "COPY": 0xA9, "REG": 0xAE,
}

# The HTML5 spec's LEGACY set: exactly the named references that are
# valid WITHOUT the trailing semicolon (the HTML 2.0/3.2-era Latin-1
# names plus their uppercase variants). An unterminated legacy name
# decodes only when the next character is not [a-zA-Z0-9=] — the
# spec's attribute-value rule, applied here uniformly (the data-state
# spec would decode '&amplitude' as '&litude'; for byte-fidelity text
# extraction the conservative rule is the documented choice).
LEGACY_UNTERMINATED = frozenset(
    [
        "amp", "lt", "gt", "quot",
        "AElig", "AMP", "Aacute", "Acirc", "Agrave", "Aring", "Atilde",
        "Auml", "COPY", "Ccedil", "ETH", "Eacute", "Ecirc", "Egrave",
        "Euml", "GT", "Iacute", "Icirc", "Igrave", "Iuml", "LT",
        "Ntilde", "Oacute", "Ocirc", "Ograve", "Oslash", "Otilde",
        "Ouml", "QUOT", "REG", "THORN", "Uacute", "Ucirc", "Ugrave",
        "Uuml", "Yacute",
        "aacute", "acirc", "acute", "aelig", "agrave", "aring",
        "atilde", "auml", "brvbar", "ccedil", "cedil", "cent", "copy",
        "curren", "deg", "divide", "eacute", "ecirc", "egrave", "eth",
        "euml", "frac12", "frac14", "frac34", "iacute", "icirc",
        "iexcl", "igrave", "iquest", "iuml", "laquo", "macr", "micro",
        "middot", "nbsp", "not", "ntilde", "oacute", "ocirc", "ograve",
        "ordf", "ordm", "oslash", "otilde", "ouml", "para", "plusmn",
        "pound", "raquo", "reg", "sect", "shy", "sup1", "sup2", "sup3",
        "szlig", "thorn", "times", "uacute", "ucirc", "ugrave", "uml",
        "uuml", "yacute", "yen", "yuml",
    ]
)

# one entity reference: named (basic five + extended + uppercase sets,
# semicolon-terminated) OR numeric (decimal / hex, unbounded digits —
# overflow clamps to U+FFFD in _codepoint_char) OR a LEGACY name
# without its semicolon when not followed by [a-zA-Z0-9=]. The '&'
# prefix is shared by construction; the trailing ';' in the terminated
# branch makes alternation-order irrelevant there (a prefix name that
# leaves the ';' unmatched backtracks); the legacy branch is sorted
# longest-first so maximal names win under the lookahead.
_EXT_ALT = "|".join(
    sorted({**NAMED_ENTITIES, **UPPER_ENTITIES}, key=len, reverse=True)
)
_LEGACY_ALT = "|".join(sorted(LEGACY_UNTERMINATED, key=len, reverse=True))
_ENT_BODY = (
    r"(?:amp|lt|gt|quot|apos|" + _EXT_ALT +
    r"|#(?:[xX][0-9a-fA-F]+|[0-9]+))"
)
# the captured body keeps the ';' for terminated refs (stripped in
# _entity_char) so ONE group serves both branches
_ENT_REF = rf"(?:{_ENT_BODY};|(?:{_LEGACY_ALT})(?![a-zA-Z0-9=]))"
_ENT_SPLIT = rf"&{_ENT_REF}"
_ENT_EXTRACT = rf"&({_ENT_REF})"
# routing gate for html_to_text: rows whose entities the literal
# chain can't decode (numeric, extended/uppercase named, or a basic
# name MISSING its semicolon — the legacy form) take the single pass.
# Over-approximation is fine: a routed row the single pass leaves
# literal costs time, never bytes. The rlike is one regex scan over
# '&'-bearing rows — measured ~3us per KB-scale doc (bench
# html_extract_text 0.12s -> 0.29s per 60k docs); '&'-free rows never
# reach it.
_NEEDS_SINGLE_PASS = rf"&(?:{_EXT_ALT}|#[xX0-9]|(?:amp|lt|gt|quot)(?!;))"


def _codepoint_char(body: Column) -> Column:
    """Numeric-reference body ('#65' or '#x41') -> its character.

    Codepoint -> UTF-16BE bytes (surrogate pair above the BMP) ->
    `decode`. HTML5 replacement semantics for invalid references:
    0, surrogates, and > 0x10FFFF all yield U+FFFD. (Divergence from
    the full spec, documented: the Windows-1252 remap of &#x80;-&#x9F;
    is not applied — those decode as the C1 codepoints themselves.)
    CaseWhen short-circuits per row, so the decode never sees the
    invalid codepoints that would raise MALFORMED_CHARACTER_CODING.

    Digit runs are UNBOUNDED (ADVICE r5): leading zeros are stripped
    before the parse, and a reference whose significant digits exceed
    the 0x10FFFF width (7 decimal / 6 hex) clamps straight to the
    invalid sentinel — '&#00000065;' decodes as 'A' and
    '&#999999999999;' as U+FFFD, matching html.unescape, with the
    numeric parse never leaving long range."""
    is_hex = body.rlike("^#[xX]")
    # strip '#' and the hex marker, then leading zeros (keep one digit)
    sig = F.regexp_replace(
        F.regexp_replace(body, "^#[xX]?", ""), "^0+(?=.)", ""
    )
    too_wide = F.length(sig) > F.when(is_hex, F.lit(6)).otherwise(F.lit(7))
    cp = (
        F.when(too_wide, F.lit(0x110000).cast("long"))  # > max -> U+FFFD
        .when(is_hex, F.conv(sig, 16, 10).cast("long"))
        .otherwise(sig.cast("long"))
    )
    bmp = F.lpad(F.lower(F.hex(cp)), 4, "0")
    sup = F.concat(
        F.lpad(F.lower(F.hex(F.shiftright(cp - 0x10000, 10) + 0xD800)), 4, "0"),
        F.lpad(F.lower(F.hex((cp - 0x10000).bitwiseAND(0x3FF) + 0xDC00)), 4, "0"),
    )
    invalid = (
        (cp < 1) | (cp > 0x10FFFF) | ((cp >= 0xD800) & (cp <= 0xDFFF))
    )
    return (
        F.when(invalid, F.lit("�"))
        .when(cp <= 0xFFFF, F.decode(F.unhex(bmp), "UTF-16BE"))
        .otherwise(F.decode(F.unhex(sup), "UTF-16BE"))
    )


def _named_entity_map() -> Column:
    """Map literal: entity name -> decoded character (basic five +
    extended + uppercase sets). Built once per query; lookup is one map
    probe per entity, not a 100-branch when-chain."""
    pairs: list = []
    for name, ch in (("amp", "&"), ("lt", "<"), ("gt", ">"),
                     ("quot", '"'), ("apos", "'")):
        pairs += [F.lit(name), F.lit(ch)]
    for name, cp in {**NAMED_ENTITIES, **UPPER_ENTITIES}.items():
        pairs += [F.lit(name), F.lit(chr(cp))]
    return F.create_map(*pairs)


def _entity_char(body: Column) -> Column:
    """Entity body (no '&'; trailing ';' present on terminated refs) ->
    decoded character. Named refs probe the map literal; numeric refs
    compute the codepoint. The regex only admits listed names, so the
    map probe cannot miss."""
    name = F.regexp_replace(body, ";$", "")
    return (
        F.when(name.startswith("#"), _codepoint_char(name))
        .otherwise(F.element_at(_named_entity_map(), name))
    )


def decode_entities(col: Column) -> Column:
    """SINGLE-PASS entity decode (named basic set + numeric character
    references, decimal and hex): split the text on entity matches,
    decode each match independently, and stitch parts and decoded
    characters back together. One pass is what makes nested-looking
    input correct — '&#38;amp;' is the TEXT '&amp;', which any
    sequential replace chain would decode twice.

    Pure Column exprs: two JVM regex passes (split + extract_all) plus
    interpreted HOF stitching — fine per-row (CLAUDE.md); callers gate
    on a cheap `contains` so most rows never reach it. The parts and
    chars arrays are built OUTSIDE the lambdas (outer args only), per
    the HOF-CSE doctrine."""
    parts = F.split(col, _ENT_SPLIT, -1)
    chars = F.transform(
        F.regexp_extract_all(col, F.lit(_ENT_EXTRACT), 1), _entity_char
    )
    interleaved = F.zip_with(
        F.slice(parts, 1, F.size(chars)), chars,
        lambda p, d: F.concat(p, d),
    )
    # array_join, NOT an aggregate fold: the fold re-copies the growing
    # accumulator per element (quadratic in entity count — measured
    # 13.8s fold vs 11.4s array_join per 1M entity-dense rows)
    return F.concat(
        F.array_join(interleaved, ""), F.element_at(parts, -1)
    )


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
    c = F.replace(c, F.lit("&apos;"), F.lit("'"))
    chained = F.replace(c, F.lit("&amp;"), F.lit("&"))
    # rows carrying a numeric reference ('&#NN;' / '&#xNN;'), an
    # extended/uppercase named entity, or a legacy unterminated basic
    # name ('&amp' without ';') take the single-pass decoder (the chain
    # can't express them, and only a single pass decodes
    # '&#38;amp;'-style nesting correctly); the
    # amp-LAST literal chain is single-pass-equivalent for named-only
    # rows (no produced char except amp's '&' can re-form an entity,
    # and amp runs last) and ~10x cheaper (measured, 1M x 1KB rows with
    # 54 entities each: chain 1.2s, bounded basic-set regexp chain 3.0s
    # but wrong on '&#38;amp;' nesting and numeric-only, single-pass
    # 11.4s; gated html_to_text on named-only rows stays at 1.6s).
    decoded = F.when(
        stripped.rlike(_NEEDS_SINGLE_PASS), decode_entities(stripped)
    ).otherwise(chained)
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
