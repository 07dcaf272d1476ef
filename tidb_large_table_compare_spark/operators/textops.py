"""Text analysis operators over the `documents` table — BASELINE.json extension.

Language ID (stopword heuristic), quality scoring (length/punctuation/
stopword ratios), token counting, and document fingerprinting (rolling
polynomial hash) — all as JVM-side column expressions so they hold up in a
100 TB map-only pass (no shuffle, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "quality_features",
    "lang_guess",
    "doc_fingerprint",
    "bpe_ish_tokens",
    "BPE_ISH_PATTERN",
]

# tiny per-language stopword markers for the heuristic language guesser
_LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " et ", " les "]),
    ("es", [" el ", " y ", " los "]),
    ("zh", ["的", "是", "了"]),
]

FP_MOD = 1_000_000_007
FP_SEED = 7


def token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of spaces)."""
    return F.size(F.split(F.trim(text), r" +"))


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals.

    Integer-exact where possible; ratios are double divisions of identical
    integers, so they agree with any SQL oracle computing the same counts.
    """
    n_chars = F.length(text)
    n_spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    n_punct = n_chars - F.length(
        F.regexp_replace(text, r"[\.,;:!\?]", "")
    )
    n_the = (
        F.length(text) - F.length(F.replace(text, F.lit("the"), F.lit("")))
    ) / F.lit(3)
    n_tokens = token_count(text)
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": n_punct.cast("double") / n_chars,
        "space_ratio": n_spaces.cast("double") / n_chars,
        "stopword_hits": n_the.cast("bigint"),
    }


def lang_guess(text: Column) -> Column:
    """First-matching-marker language heuristic (deterministic CASE chain)."""
    expr = None
    for lang, markers in _LANG_MARKERS:
        cond = None
        for m in markers:
            c = F.instr(text, m) > 0
            cond = c if cond is None else (cond | c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    return expr.otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling hash over token head characters.

    ``acc = (acc * 31 + ascii(token[0])) mod 1e9+7`` folded left-to-right —
    integer-exact and reproducible in any engine with list folds.
    """
    heads = F.transform(
        F.split(F.trim(text), r" +"), lambda t: F.ascii(F.substring(t, 1, 1))
    )
    return F.aggregate(
        heads,
        F.lit(FP_SEED).cast("long"),
        lambda acc, x: (acc * 31 + x) % FP_MOD,
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
"""GPT-2-style pretokenization, ASCII-safe: letter runs, digit runs, and
punctuation/symbol clusters become separate tokens (ALL whitespace
delimits — \\s, not just the ASCII space: a bare space class glued tabs
and newlines into the symbol clusters, inflating symbol-token counts on
tab-separated text). The single string literal feeds both engines
verbatim (F.lit on the Spark side, f-string interpolation into the
DuckDB oracle) — verified to parse identically in both."""


def bpe_ish_tokens(text: Column) -> Column:
    """Array of BPE-ish pretokens (the subword-tokenizer front half)."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)
