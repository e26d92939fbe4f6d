"""U1 — frozen Arrow-vectorized html→text extractor + POI payload parse.

The reference delegates dataset parsing to profile hooks
(``conflate/profile.py :: dataset`` / ``conflate/dataset.py ::
read_dataset``, SURVEY §3 SRC2/U1).  For the web-scale graft the input
is a Common-Crawl-style ``pages`` table (url, warc_ts, html, text,
lang); this module IS the reference extractor whose output is frozen as
golden bytes (BASELINE.json input_hint: byte-identical extracted text
per url).

EXTRACTOR SPEC (frozen — changing any step breaks golden fixtures):
  1. decode html bytes as UTF-8 with errors='replace'
  2. drop <script>/<style> elements (case-insensitive, dotall)
  3. drop HTML comments <!-- ... -->
  4. replace every remaining tag with a single space
  5. unescape exactly: &lt; &gt; &quot; &#39; &nbsp; then &amp; (last)
  6. collapse all whitespace runs to one space; strip ends

All steps are pandas ``.str`` ops (C-level, Arrow-batched via
mapInPandas) — no per-row Python on the hot path.  The POI payload
lives in ``<div class="poi" data-id=... data-lat=... data-lon=...
data-tags="k=v;k=v">``; it is extracted with a vectorized regex and the
tags string is decoded JVM-side with ``map_from_entries`` (see
``poi_tags_map_sql``).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
TAG_RE = re.compile(r"<[^>]*>")
WS_RE = re.compile(r"\s+")
POI_RE = re.compile(
    r'<div class="poi" data-id="([^"]*)" data-lat="([^"]*)"'
    r' data-lon="([^"]*)" data-tags="([^"]*)"'
)

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def extract_text(html: pd.Series) -> pd.Series:
    """bytes html -> extracted text (vectorized; the frozen extractor)."""
    return extract_text_decoded(html.str.decode("utf-8", errors="replace"))


def extract_text_decoded(s: pd.Series) -> pd.Series:
    """Decoded html -> extracted text.  Split out so the mapInPandas
    body decodes each batch ONCE and shares the decoded series with
    :func:`extract_poi_decoded` (the decode was measured as a repeated
    cost on the 6M-page bench ingest; output is byte-identical)."""
    s = s.str.replace(SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(COMMENT_RE, " ", regex=True)
    s = s.str.replace(TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(WS_RE, " ", regex=True).str.strip()
    return s


def extract_poi(html: pd.Series) -> pd.DataFrame:
    """Vectorized POI payload parse -> (poi_id, poi_lat, poi_lon, poi_tags_raw)."""
    return extract_poi_decoded(html.str.decode("utf-8", errors="replace"))


def extract_poi_decoded(s: pd.Series) -> pd.DataFrame:
    """Decoded html -> POI columns (see extract_text_decoded)."""
    m = s.str.extract(POI_RE)
    return pd.DataFrame(
        {
            "poi_id": m[0],
            "poi_lat": pd.to_numeric(m[1], errors="coerce"),
            "poi_lon": pd.to_numeric(m[2], errors="coerce"),
            "poi_tags_raw": m[3],
        }
    )


# Spark-facing schema of the mapInPandas extractor output
EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, "
    "poi_id string, poi_lat double, poi_lon double, poi_tags_raw string"
)


def extract_pages_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: pages(url, warc_ts, html, lang) -> extracted rows.

    ``html`` (the fat binary column) is dropped inside the batch so it
    never crosses another exchange (SURVEY §5.2: prune the binary ASAP).
    """
    for pdf in batches:
        out = pd.DataFrame(
            {"url": pdf["url"], "warc_ts": pdf["warc_ts"], "lang": pdf["lang"]}
        )
        decoded = pdf["html"].str.decode("utf-8", errors="replace")
        out["text"] = extract_text_decoded(decoded)
        poi = extract_poi_decoded(decoded)
        yield pd.concat([out, poi], axis=1)


def poi_tags_map_sql(tags_raw_col: str) -> str:
    """JVM-side 'k=v;k=v' -> map<string,string> (no Python involved).

    Key = text before the first '='; value = everything after it.
    """
    return (
        f"map_from_entries(transform(filter(split({tags_raw_col}, ';'), "
        f"x -> x != '' AND instr(x, '=') > 0), "
        f"x -> struct(substring(x, 1, instr(x, '=') - 1) as key, "
        f"substring(x, instr(x, '=') + 1) as value)))"
    )
