"""URL-parsing templates: Spark and DuckDB must return identical
values for the same expression text (the whole point of the
portable-SQL design), and match a hand-written python oracle."""

import duckdb
import pytest

from osm_conflate_spark.functions.web import (
    SECOND_LEVEL_SUFFIXES,
    registrable_domain_sql,
    url_host_sql,
    url_path_sql,
)

URLS = [
    "https://www.example.com/a/b?q=1#frag",
    "http://sub.deep.example.co.uk/path",
    "https://example.com",
    "https://example.com/",
    "http://user@host.example.org:8080/x?y=2",
    "https://news.site.com.au/story/42",
    "ftp://files.example.net/pub",
    "https://single",  # no dot: host yes, domain '' (no 2-label match)
]


def _py_host(url):
    rest = url.split("://", 1)[1]
    auth = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    auth = auth.split("@", 1)[-1]
    return auth.split(":", 1)[0]


def _py_domain(host):
    labels = host.split(".")
    for suf in SECOND_LEVEL_SUFFIXES:
        if host.endswith("." + suf) and len(labels) >= 3:
            return ".".join(labels[-3:])
    return ".".join(labels[-2:]) if len(labels) >= 2 else ""


def _py_path(url):
    rest = url.split("://", 1)[1]
    if "/" not in rest:
        return ""
    p = "/" + rest.split("/", 1)[1]
    return p.split("?", 1)[0].split("#", 1)[0]


@pytest.mark.parametrize("engine", ["spark", "duck"])
def test_url_parsing_matches_python_oracle(engine, spark):
    sel = (
        f"SELECT url, {url_host_sql('url')} AS host, "
        f"{registrable_domain_sql(url_host_sql('url'))} AS domain, "
        f"{url_path_sql('url')} AS path FROM urls"
    )
    if engine == "spark":
        spark.createDataFrame(
            [(u,) for u in URLS], "url string"
        ).createOrReplaceTempView("urls")
        rows = {r["url"]: r.asDict() for r in spark.sql(sel).collect()}
    else:
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE urls AS SELECT * FROM (VALUES "
            + ",".join(f"('{u}')" for u in URLS)
            + ") t(url)"
        )
        rows = {
            r[0]: dict(zip(["url", "host", "domain", "path"], r))
            for r in con.sql(sel).fetchall()
        }
    for u in URLS:
        host = _py_host(u)
        assert rows[u]["host"] == host, (engine, u)
        assert rows[u]["domain"] == _py_domain(host), (engine, u)
        assert rows[u]["path"] == _py_path(u), (engine, u)
