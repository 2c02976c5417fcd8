"""Grok pattern syntax: `%{NAME}` / `%{NAME:field}` expansion to named-group
regex (the logstash dialect the north-star's "grok dictionary" implies).

The reference parses with raw named-group regex (agent/task/task.go:224-242);
grok syntax is sugar over exactly that — `%{NAME:field}` becomes
`(?P<field>...)` and bare `%{NAME}` a non-capturing group — so expansion
happens once at compile time and the engine's regex paths (native
regexp_extract or the Arrow pandas UDF) are untouched.

The base library keeps to RE2-safe constructs (no backrefs/lookahead), per
the Go↔Python parity constraint (SURVEY.md §2.2).
"""

from __future__ import annotations

import re

# RE2-safe base library (subset of the classic grok-patterns file,
# rewritten rather than copied; field names resolve at expansion time).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b[1-9]\d*\b",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"%{IPV4}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}\.?)+\b",
    "IPORHOST": r"(?:%{IPV4}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "QUOTEDSTRING": r'"[^"]*"|\'[^\']*\'',
    "YEAR": r"\d{4}",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "HOUR": r"(?:[01]?\d|2[0-3])",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]\d)(?:[.,]\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "TIMESTAMP_ISO8601":
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}"
        r"(?::%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?",
    "LOGLEVEL":
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|"
        r"WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|"
        r"CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|"
        r"[Ee]merg(?:ency)?",
    "SYSLOGPRI": r"<%{INT}>",
    "HTTPMETHOD": r"GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "LOGAGENT_WAF": r"%{TIMESTAMP_ISO8601},\d{3} - %{LOGLEVEL} - %{GREEDYDATA}",
}

_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_MAX_DEPTH = 16


class GrokError(ValueError):
    pass


def expand_grok(
    pattern: str, library: dict[str, str] | None = None
) -> str:
    """Expand `%{NAME[:field]}` references to plain named-group regex.

    `%{NAME:field}` -> `(?P<field>expansion)`; bare `%{NAME}` -> a
    non-capturing group. Nested references resolve recursively (bounded
    depth, cycles rejected). A pattern with no references passes through
    unchanged, so raw-regex specs keep working."""
    lib = dict(GROK_PATTERNS)
    if library:
        lib.update(library)

    def resolve(pat: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise GrokError(
                f"grok expansion exceeds depth {_MAX_DEPTH} (cycle?)"
            )

        def sub(m: re.Match) -> str:
            name, field = m.group(1), m.group(2)
            if name not in lib:
                raise GrokError(f"unknown grok pattern %{{{name}}}")
            body = resolve(lib[name], depth + 1)
            if field:
                return f"(?P<{field}>{body})"
            return f"(?:{body})"

        return _REF.sub(sub, pat)

    return resolve(pattern, 0)
