"""Text-analysis functions for the training-data pipeline: token
counting, quality scoring, language id, document fingerprinting.

All expressed as portable SQL templates so the SAME text feeds the
Spark column (``F.expr``) and the DuckDB oracle — see
:mod:`.sqlgen` for the rationale.  Portability notes: only
``split/lower/length/regexp_replace/greatest/least/round`` and basic
arithmetic are used; Spark's ``split`` takes a regex while DuckDB's
``string_split`` takes a literal — both sides split on a single space
(documents in the test tables are single-space tokenized).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-language stopword marker sets for the n-gram/stopword heuristic
# language id (small on purpose; the *operator shape* is what matters).
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "y", "los", "de", "es"],
    "ru": ["i", "v", "na", "ne", "eto"],
}


def tokens_sql(text: str) -> str:
    """Spark-side token array (regex split). Not DuckDB-portable."""
    return f"filter(split({text}, ' '), x -> x != '')"


def token_count_spark(text: str) -> Column:
    return F.expr(f"size({tokens_sql(text)})")


def token_count_duck(text: str) -> str:
    return f"len(list_filter(string_split({text}, ' '), x -> x != ''))"


# --- quality score: portable arithmetic over lengths -----------------------

def _quality_parts(text: str, engine: str) -> dict:
    """Shared building blocks; regexp_replace semantics match in both."""
    n_chars = f"length({text})"
    n_alpha = f"length(regexp_replace({text}, '[^a-zA-Z]', '', 'g'))" if engine == "duck" \
        else f"length(regexp_replace({text}, '[^a-zA-Z]', ''))"
    n_space = f"length(regexp_replace({text}, '[^ ]', '', 'g'))" if engine == "duck" \
        else f"length(regexp_replace({text}, '[^ ]', ''))"
    return dict(n_chars=n_chars, n_alpha=n_alpha, n_space=n_space)


def quality_score_sql(text: str, engine: str) -> str:
    """Quality in [0,1]: alpha ratio x length saturation (cap 1000 chars)."""
    p = _quality_parts(text, engine)
    alpha_ratio = f"({p['n_alpha']} * 1.0E0 / greatest({p['n_chars']}, 1))"
    sat = f"least({p['n_chars']} / 1000.0E0, 1.0E0)"
    return f"round({alpha_ratio} * {sat}, 6)"


def word_count_sql(text: str, engine: str) -> str:
    """Words = spaces + 1 on trimmed text (portable, split-free).

    CAST to BIGINT because Spark's length() is INT while DuckDB's is
    BIGINT — the driver compares result schemas.
    """
    p = _quality_parts(f"trim({text})", engine)
    return (
        f"CAST((CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE {p['n_space']} + 1 END) AS BIGINT)"
    )


# --- document quality filter (Gopher/C4-style rules, portable) -------------

def quality_filter_parts(
    text: str,
    engine: str,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_ratio: float = 0.55,
) -> dict:
    """Gopher-rule-shaped document filter as portable SQL fragments:
    word-count bounds, mean word length bounds, alphabetic ratio.

    Returns ``{n_words, mean_word_len, alpha_ratio, keep}`` SQL strings
    (``keep`` is 0/1 INT — booleans hash differently across engines).
    The ratios are rounded to 6 dp BEFORE the threshold comparison so
    both engines threshold the same value.
    """
    from .sqlgen import dlit

    p = _quality_parts(text, engine)
    n_words = word_count_sql(text, engine)
    # non-space chars of the trimmed text / words
    pt = _quality_parts(f"trim({text})", engine)
    mean_wl = (
        f"round((length(trim({text})) - {pt['n_space']}) * 1.0E0 "
        f"/ greatest({n_words}, 1), 6)"
    )
    alpha_ratio = f"round({p['n_alpha']} * 1.0E0 / greatest({p['n_chars']}, 1), 6)"
    keep = (
        f"CAST((({n_words}) BETWEEN {min_words} AND {max_words}) "
        f"AND (({mean_wl}) BETWEEN {dlit(min_mean_word_len)} AND {dlit(max_mean_word_len)}) "
        f"AND (({alpha_ratio}) >= {dlit(min_alpha_ratio)}) AS INT)"
    )
    return dict(
        n_words=n_words, mean_word_len=mean_wl, alpha_ratio=alpha_ratio,
        keep=keep,
    )


# --- language id: stopword-hit argmax ---------------------------------------

def langid_spark(text: str) -> Column:
    """Argmax over per-language stopword hit counts; ties broken toward
    the lexicographically largest lang code; zero hits -> 'und'."""
    toks = f"array_distinct({tokens_sql(f'lower({text})')})"
    scores = []
    for lang in sorted(LANG_STOPWORDS):
        arr = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        scores.append(
            f"struct(size(array_intersect({toks}, array({arr}))) as score, '{lang}' as lang)"
        )
    # sort (score, lang) structs ascending and take the LAST element:
    # highest score wins; equal scores -> lexicographically largest lang.
    return F.expr(
        f"""
        CASE WHEN (aggregate(array({', '.join(scores)}), cast(0 as int),
                   (acc, s) -> greatest(acc, s.score))) = 0 THEN 'und'
        ELSE (sort_array(array({', '.join(scores)}), true)[{len(scores) - 1}].lang)
        END
        """
    )


def langid_duck(text: str) -> str:
    """DuckDB twin of :func:`langid_spark` (same argmax + tie-break)."""
    toks = f"list_distinct(list_filter(string_split(lower({text}), ' '), x -> x != ''))"
    score_exprs = {
        lang: f"len(list_intersect({toks}, [{', '.join(repr(w) for w in ws)}]))"
        for lang, ws in sorted(LANG_STOPWORDS.items())
    }
    # argmax with tie-break by lang ascending == max over (score, lang
    # DESCENDING)... replicate Spark's sort_array of (score, lang) structs
    # ascending and take the last element: equal scores -> LARGEST lang.
    pairs = ", ".join(f"({e}, '{lang}')" for lang, e in score_exprs.items())
    any_hit = " + ".join(score_exprs.values())
    return (
        f"CASE WHEN ({any_hit}) = 0 THEN 'und' "
        f"ELSE list_sort([{pairs}])[{len(score_exprs)}][2] END"
    )


# --- document fingerprint ----------------------------------------------------

def fingerprint_col(text: str, k: int = 8, portable: bool = False) -> Column:
    """Rolling-hash document fingerprint: min hash over character k-grams
    (winnowing-style min selection).

    Default hash is xxhash64 (JVM-native; pytest-verified against a
    pure-Python twin).  ``portable=True`` uses the md5-based
    ``sqlgen.hash60_sql`` so :func:`fingerprint_duck_sql` replays the
    exact value in DuckDB (driver oracle)."""
    from .sqlgen import hash60_sql

    h = hash60_sql("g", "spark") if portable else "xxhash64(g)"
    grams = (
        f"CASE WHEN length({text}) >= {k} THEN "
        f"transform(sequence(1, length({text}) - {k} + 1), i -> substring({text}, i, {k})) "
        f"ELSE array({text}) END"
    )
    # NULL text -> NULL fingerprint on BOTH engines: without the guard,
    # Spark's least() skips the NULL hash and returns the INT64_MAX init
    # while DuckDB's CASE yields NULL — a cross-engine divergence
    return F.expr(
        f"CASE WHEN {text} IS NULL THEN CAST(NULL AS BIGINT) ELSE "
        f"aggregate(transform({grams}, g -> {h}), cast(9223372036854775807 as bigint), "
        f"(acc, h) -> least(acc, h)) END"
    )


def fingerprint_duck_sql(text: str, k: int = 8) -> str:
    """DuckDB twin of ``fingerprint_col(..., portable=True)``."""
    from .sqlgen import hash60_sql

    h = hash60_sql(f"substr({text}, i, {k})", "duck")
    return (
        f"CASE WHEN {text} IS NULL THEN CAST(NULL AS BIGINT) "
        f"WHEN length({text}) >= {k} THEN "
        f"list_min([{h} FOR i IN range(1, length({text}) - {k} + 2)]) "
        f"ELSE {hash60_sql(text, 'duck')} END"
    )


def normalize_text_sql(text: str, engine: str) -> str:
    """Dedup-key normalization (the C4/Gopher-style pass applied before
    fuzzy/exact text dedup): lowercase, every run of non-alphanumerics
    collapsed to one space, trimmed.  ASCII-centric by design (matches
    the rest of the quality suite); the ``+`` quantifier does the
    whitespace collapse in the same regex pass.  One regexp_replace —
    codegen in Spark; DuckDB needs the explicit ``'g'`` flag."""
    g = ", 'g'" if engine == "duck" else ""
    return f"trim(regexp_replace(lower({text}), '[^a-z0-9]+', ' '{g}))"
