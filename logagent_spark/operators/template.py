"""Template compiler — `${key}` interpolation as a concat Column tree.

Reproduces /root/reference/agent/task/template.go:8-31 byte-for-byte:

* placeholders matched by the non-greedy regex ``\\$\\{.*?\\}``;
* the key is ``strings.Trim(match, "${}")`` — i.e. ALL leading/trailing
  characters in the set {'$','{','}'} are trimmed, so ``${{key}}`` also
  resolves key ``key``;
* a missing key (NULL) or a non-string-typed column leaves the literal
  placeholder text in the output;
* an empty template renders ``msg["message"]`` if it is a string, else "".

The compiled form is a single ``concat`` of literal segments and
``coalesce(col, lit(placeholder))`` terms — pure JVM expressions inside
whole-stage codegen; no UDF. This is the "byte-identical extracted text"
invariant surface of BASELINE.json.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logagent_spark.functions import is_string

Schema = dict[str, T.DataType]

PLACEHOLDER = re.compile(r"\$\{.*?\}")


def split_template(template: str) -> list[tuple[str, str | None]]:
    """-> list of (text, key_or_None): literal segments carry key=None,
    placeholder segments carry the raw match text plus the trimmed key."""
    parts: list[tuple[str, str | None]] = []
    pos = 0
    for m in PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append((template[pos:m.start()], None))
        parts.append((m.group(0), m.group(0).strip("${}")))
        pos = m.end()
    if pos < len(template):
        parts.append((template[pos:], None))
    return parts


def compile_template(template: str, schema: Schema) -> Column:
    """-> StringType Column of the rendered row."""
    if not template:
        # template.go:11-17: empty template emits msg["message"] or ""
        dt = schema.get("message")
        if dt is not None and is_string(dt):
            return F.coalesce(F.col("message"), F.lit(""))
        return F.lit("")

    terms: list[Column] = []
    for text, key in split_template(template):
        if key is None:
            terms.append(F.lit(text))
            continue
        dt = schema.get(key)
        if dt is None or not is_string(dt):
            # non-string or never-present column: literal survives
            # (template.go:22-26)
            terms.append(F.lit(text))
        else:
            terms.append(F.coalesce(F.col(key), F.lit(text)))
    if len(terms) == 1:
        return terms[0]
    return F.concat(*terms)
