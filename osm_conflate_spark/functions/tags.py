"""Tag-map column operators: normalization F5, transform DSL F2,
category defaults F3.

Reference: ``conflate/dataset.py :: transform_dataset`` (SURVEY §3 F2),
``conflate/data.py :: SourcePoint.__init__`` value coercion (F5),
``conflate/conflate.py`` category handling (F3).  Rules:

* constant string          -> set the tag to that value
* '-' prefixed string      -> delete the tag
* '+' prefixed string      -> set only if absent
* callable (str -> str)    -> rewrite the existing value (vectorized
                              pandas UDF over the single tag's values —
                              the only Python on this path, Arrow-batched)
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ConflateConfig


def normalize_tags(tags: str) -> Column:
    """F5 — trim every value (reference str()-coerces + strips)."""
    return F.transform_values(F.col(tags), lambda _k, v: F.trim(v))


def _set_key(m: Column, key: str, value: Column) -> Column:
    return F.map_concat(
        F.map_filter(m, lambda k, _v: k != F.lit(key)),
        F.create_map(F.lit(key), value),
    )


def _make_rewrite_udf(fn: Callable[[str], str]):
    """Bind the callable per rule — a UDF defined inline in the rule loop
    closes over the loop variable and every rule would execute the LAST
    callable (classic late binding)."""

    @F.pandas_udf("string")
    def _rewrite(vals: pd.Series) -> pd.Series:
        return vals.map(lambda v: None if v is None else fn(v))

    return _rewrite


def apply_transform(df: DataFrame, tags: str, cfg: ConflateConfig) -> DataFrame:
    """F2 — apply the profile transform DSL to a map column."""
    out = df
    cur: Column = F.col(tags)
    for key, rule in cfg.transform_dict.items():
        if callable(rule):
            has = F.map_contains_key(cur, F.lit(key))
            newv = _make_rewrite_udf(rule)(F.element_at(cur, F.lit(key)))
            cur = F.when(has, _set_key(cur, key, newv)).otherwise(cur)
        elif isinstance(rule, str) and rule.startswith("-"):
            cur = F.map_filter(cur, lambda k, _v: k != F.lit(key))
        elif isinstance(rule, str) and rule.startswith("+"):
            cur = F.when(
                F.map_contains_key(cur, F.lit(key)), cur
            ).otherwise(_set_key(cur, key, F.lit(rule[1:])))
        else:
            cur = _set_key(cur, key, F.lit(str(rule)))
    return out.withColumn(tags, F.transform_values(cur, lambda _k, v: F.trim(v)))


def apply_categories(df: DataFrame, tags: str, cfg: ConflateConfig) -> DataFrame:
    """F3 — per-category default tags (set only where absent).  The
    reserved ``max_distance`` key is a match-radius override consumed by
    the candidate join, never injected as a tag."""
    cats = {c: t for c, t in cfg.category_tags.items() if t}
    if not cats:
        return df
    cur: Column = F.col(tags)
    for cat, extra in cats.items():
        lit_map = F.create_map(
            *[x for k, v in sorted(extra.items()) for x in (F.lit(k), F.lit(str(v)))]
        )
        defaults = F.map_filter(
            lit_map, lambda k, _v: ~F.map_contains_key(F.col(tags), k)
        )
        cur = F.when(
            F.col("category") == F.lit(cat), F.map_concat(F.col(tags), defaults)
        ).otherwise(cur)
    return df.withColumn(tags, cur)


def query_filter_col(tags: str, cfg: ConflateConfig) -> Column:
    """F1 — AND of profile query clauses over the OSM tag map."""
    cond: Column = F.lit(True)
    for key, op, value in cfg.query:
        v = F.element_at(F.col(tags), F.lit(key))
        if op == "=":
            cond = cond & (v == F.lit(value))
        elif op == "~":
            cond = cond & v.contains(F.lit(value or ""))
        else:
            cond = cond & v.isNotNull()
    return cond
