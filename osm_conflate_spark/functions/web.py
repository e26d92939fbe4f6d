"""URL parsing for web-page tables, as portable SQL templates.

A crawl-scale pipeline groups, samples, rate-limits and reputations by
registrable domain; these helpers turn a raw ``url`` string column into
``host`` / ``registrable domain`` / ``path`` with ONE regex each —
identical text in Spark (Java regex) and DuckDB (RE2): the patterns use
only character classes, alternation and groups, which the two engines
interpret identically.  No Python on the hot path — all three compile
into whole-stage codegen.

Scope (documented, validated by tests): ``scheme://[user@]host[:port]
/path[?query][#frag]`` with lowercase ASCII hosts.  IPv6 bracket hosts
and internationalized domains are out of scope (a crawl pipeline
normalizes those upstream); ``:port`` and ``user@`` are stripped.

The registrable-domain heuristic keeps THREE labels when the host ends
in a second-level public suffix from a small built-in set (co.uk etc.),
else TWO.  The real public-suffix list is data, not code — at scale it
is a broadcast join against the PSL table; the regex keeps the operator
self-contained here and the template accepts extra suffixes.
"""

from __future__ import annotations

# Second-level public suffixes recognized by the built-in heuristic.
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.kr", "com.cn", "com.mx",
)

_AUTHORITY_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_STRIP_USER_PORT_RE = "^(?:[^@]*@)?([^:]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_host_sql(url: str) -> str:
    """Host of ``url``: authority with userinfo and port stripped.

    Same expression text runs in Spark and DuckDB (both expose
    ``regexp_extract(str, pattern, group)``).
    """
    auth = f"regexp_extract({url}, '{_AUTHORITY_RE}', 1)"
    return f"regexp_extract({auth}, '{_STRIP_USER_PORT_RE}', 1)"


def url_path_sql(url: str) -> str:
    """Path component of ``url`` ('' when absent — both engines return
    the empty string for a non-matching regexp_extract)."""
    return f"regexp_extract({url}, '{_PATH_RE}', 1)"


def registrable_domain_sql(host: str, extra_suffixes: tuple = ()) -> str:
    """Registrable domain of a ``host`` expression.

    One anchored regex: prefer ``label.<second-level-suffix>`` (three
    labels), else the last two labels.  Alternation order makes the
    three-label branch win when both match.
    """
    sl = "|".join(
        s.replace(".", "[.]") for s in SECOND_LEVEL_SUFFIXES + tuple(extra_suffixes)
    )
    pat = f"([^.]+[.](?:{sl})|[^.]+[.][^.]+)$"
    return f"regexp_extract({host}, '{pat}', 1)"
