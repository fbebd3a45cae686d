"""Text-analysis primitives: tokenization, shingling, stopword scoring.

Built-in Column expressions only (SURVEY.md §2.11 — keep the hot path 100%
Catalyst-optimizable). Each helper has a DuckDB-SQL twin so oracle queries
compute byte-identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: token = maximal run of [a-z0-9] after lowercasing.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Priority order breaks argmax ties deterministically.
LANG_STOPWORDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "to", "a", "in", "is", "that")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "ein", "zu")),
    ("es", ("el", "la", "de", "que", "y", "en", "un", "es")),
    ("fr", ("le", "la", "et", "les", "des", "un", "une", "est")),
    ("zh", ("de", "le", "shi", "bu", "wo", "ni", "ta", "men")),
)

#: BPE-ish subword segmentation regex (GPT-2-style shape: contractions,
#: space-prefixed word/number runs, punctuation runs). Counting its matches
#: approximates tokenizer cost without shipping a vocab — the standard
#: cheap token-count estimate in data pipelines. Same dialect subset works
#: in Java regex (Spark) and RE2-ish (DuckDB).
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+"

#: Generic English-ish stopwords for quality scoring.
QUALITY_STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
)


def tokens(col: Column) -> Column:
    """Lowercased [a-z0-9]+ tokens, empties filtered (leading/trailing
    punctuation produces empty fragments in both engines)."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), "
        "t -> t <> '')"
    )


def quality_score(text_col: Column, tok: Column | None = None) -> Column:
    """Sampler quality score: token-length cap (``min(n_tokens/50, 1)``)
    times the alphanumeric-character ratio, rounded to 6 dp. The ONE scoring
    rule shared by every sampler (Bernoulli, exact-k weighted, balanced) and
    the corpus prep pipeline — edit here, not in a caller, or the samplers
    silently desynchronize. SQL twin: :func:`quality_score_sql`."""
    if tok is None:
        tok = tokens(text_col)
    # non-alnum char count = Σ lengths of the splits BETWEEN [a-zA-Z0-9 ]
    # runs. NOT regexp_replace("[^a-zA-Z0-9 ]", "") - length-diff: Spark's
    # RegExpReplace (and RegExpCount) cost ~50x a split on the same text
    # (round-11 500k-doc micro-probe: 25.4 s vs 0.47 s for the corpus) —
    # on a quality-gated 100 TB pipeline the replace WAS the scan cost.
    # Counts verified byte-identical to the old formula on all 500k
    # replica docs and on the edge corpus; the DuckDB twin keeps the
    # regexp_replace form (same value, and DuckDB's regex is not hot).
    non_alnum = F.aggregate(
        F.split(text_col, "[a-zA-Z0-9 ]+"),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    # empty or NULL text scores 0.0 (no content == no quality), guarding
    # the alnum-ratio division: length 0 is DIVIDE_BY_ZERO under ANSI
    # Spark but NULL under DuckDB — without the branch the engines
    # diverge on the empty-doc edge (found by the /tmp edge-sf sweep)
    return F.when(
        F.length(text_col) > 0,
        F.round(
            F.least(F.size(tok).cast("double") / 50.0, F.lit(1.0))
            * (
                1.0
                - non_alnum.cast("double") / F.length(text_col)
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))


def quality_score_sql(text_expr: str = "text", tok_expr: str = "tok") -> str:
    """DuckDB twin of :func:`quality_score` (expects ``tok_expr`` bound to
    ``tokens_sql(text_expr)`` in an enclosing CTE)."""
    return (
        f"CASE WHEN length({text_expr}) > 0 THEN CAST(ROUND("
        f"least(CAST(len({tok_expr}) AS DOUBLE) / 50.0, 1.0) * "
        f"(1.0 - CAST(length({text_expr}) - length(regexp_replace({text_expr}, "
        f"'[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length({text_expr})), "
        "6) AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    )


def word_shingles(tok: Column, n: int = 3) -> Column:
    """n-word shingles joined by single spaces; empty array when the doc has
    fewer than n tokens. (Spark ``sequence(1, k)`` DESCENDS when k < 1, so
    the short-doc case must be guarded, not clamped.)"""
    def shingle_at(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)])

    return F.when(
        F.size(tok) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tok) - (n - 1)), shingle_at),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(tok_col: str, n: int = 3) -> str:
    """DuckDB twin of :func:`word_shingles`. ``tok_col`` must be a column
    reference holding the token list (materialize tokens in a CTE first)."""
    joined = " || ' ' || ".join(f"{tok_col}[i+{j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({tok_col}) - {n - 2}, 1)), "
        f"i -> {joined})"
    )


def stopword_hits(tok: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens (with multiplicity) that are in ``words``.

    TOTAL function: 0 for an empty token list AND for a NULL one (NULL
    text) — without the coalesce the engines disagree on the edges:
    Spark's aggregate over [] is the 0 seed but DuckDB's list_sum([]) is
    NULL, and a NULL list is NULL on Spark but the twin's CASE arms flip
    it differently inside rule predicates (edge-sf sweep, gopher
    stopword rule off by one on each engine)."""
    return F.coalesce(
        F.aggregate(
            F.transform(tok, lambda t: F.when(t.isin(*words), 1).otherwise(0)),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
        F.lit(0),
    )


def stopword_hits_sql(tok_expr: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        f"COALESCE(list_sum(list_transform({tok_expr}, "
        f"t -> CASE WHEN t IN ({inlist}) THEN 1 ELSE 0 END)), 0)"
    )
