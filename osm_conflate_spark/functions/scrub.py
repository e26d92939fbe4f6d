"""PII scrubbing for web-text corpora — pure-SQL regex redaction.

A training-data pipeline redacts obvious PII (emails, IPv4 addresses,
phone-like digit runs) before packing text into training chunks.  Here
that is three ``regexp_replace`` passes that stay inside whole-stage
codegen — no Python, no UDF — plus count expressions for audit rollups.

Engine dialects differ only in the replace call shape (Spark's
``regexp_replace`` is global by default; DuckDB needs the ``'g'``
flag), so the generators take an ``engine`` argument like
:mod:`.text`'s ``word_count_sql``.  The PATTERNS are identical text in
both: Java regex and RE2 agree on the subset used (character classes,
alternation, bounded repeats, ``\\b`` ASCII word boundaries).

Pattern scope (deliberate, documented): ASCII emails; dotted-quad IPv4
(no range validation — 999.0.0.1 redacts too, which is what you want
in a scrubber); international-ish phone runs of 7+ digits allowing
``+ ( ) - . space`` separators, anchored on digit boundaries so prose
years ("in 2024") and short ids survive.  Redaction order is
email -> ip -> phone: earlier passes consume their text so the phone
pattern never sees an IP's digits.
"""

from __future__ import annotations

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\+?\b[0-9](?:[-. ()]{0,3}[0-9]){6,}\b"

_TOKENS = {"email": "<EMAIL>", "ip": "<IP>", "phone": "<PHONE>"}
_PATTERNS = {"email": EMAIL_RE, "ip": IPV4_RE, "phone": PHONE_RE}


def _replace(expr: str, pat: str, repl: str, engine: str) -> str:
    pat = pat.replace("'", "''")
    if engine == "spark":
        # Spark SQL string literals process backslash escapes ('\b'
        # would become a backspace char); DuckDB literals do not
        pat = pat.replace("\\", "\\\\")
        return f"regexp_replace({expr}, '{pat}', '{repl}')"
    return f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"


def scrub_pii_sql(text: str, engine: str) -> str:
    """Expression: ``text`` with emails, IPv4s and phone runs replaced
    by ``<EMAIL>`` / ``<IP>`` / ``<PHONE>`` (in that order)."""
    cur = text
    for kind in ("email", "ip", "phone"):
        cur = _replace(cur, _PATTERNS[kind], _TOKENS[kind], engine)
    return cur


def pii_count_sql(text: str, kind: str, engine: str) -> str:
    """Expression: number of ``kind`` matches in ``text``.

    Counted as the length delta of deleting the matches divided is
    wrong for variable-length matches, so instead: redact matches of
    THIS kind to a single sentinel char and count the sentinels.  The
    sentinel (\\x01) cannot occur in sane web text; rows that do
    contain it overcount harmlessly in an audit metric.
    """
    pat = _PATTERNS[kind]
    red = _replace(text, pat, "\x01", engine)
    return (
        f"(length({red}) - length(regexp_replace({red}, '\x01', ''"
        + (", 'g'" if engine != "spark" else "")
        + ")))"
    )


def redact_sql(expr: str, kind: str, engine: str) -> str:
    """Expression: ``expr`` with matches of one ``kind`` replaced by
    its token — the single-stage building block of
    :func:`scrub_pii_sql` (exposed so audit queries can count per
    stage in pipeline order)."""
    return _replace(expr, _PATTERNS[kind], _TOKENS[kind], engine)
