"""Text analysis: token counting, quality scoring, language-ID,
document fingerprinting.

All column expressions (JVM-side); the only Python kernel is the
rolling-hash fingerprint, a vectorized pandas UDF.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

# BPE-ish tokenization: letter runs, single digits, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    # deterministic tie order: first language listed wins ties
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "les", "des", "et", "une"),
    "de": ("der", "die", "und", "das", "ist"),
}


def ws_tokens(col) -> F.Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def ws_token_count(col) -> F.Column:
    # size(NULL) is -1 under legacy semantics; NULL text -> NULL count
    # (matches the SQL oracle's len(...) on NULL)
    return F.when(col.isNull(), F.lit(None)).otherwise(F.size(ws_tokens(col))).cast("int")


def bpe_token_estimate(col) -> F.Column:
    """Token-count estimate under a BPE-ish regex segmentation."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def alpha_ratio(col) -> F.Column:
    """Fraction of characters that are letters (0 for empty text)."""
    return F.length(F.regexp_replace(col, "[^A-Za-z]", "")) / F.greatest(
        F.length(col), F.lit(1)
    )


def stopword_ratio(col) -> F.Column:
    toks = ws_tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_length(col) -> F.Column:
    toks = ws_tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col) -> F.Column:
    """Composite [0,1]-ish quality heuristic: favor letter-heavy text with
    a moderate stopword ratio and word lengths near typical prose (~4.7).
    Weights are fixed and documented so the oracle can reproduce them.
    NULL text -> NULL."""
    return F.when(col.isNull(), F.lit(None).cast("double")).otherwise(
        0.4 * alpha_ratio(col)
        + 0.3 * (1.0 - F.abs(stopword_ratio(col) - F.lit(0.4)))
        + 0.3 * (1.0 - F.least(F.abs(mean_token_length(col) - F.lit(4.7)) / 4.7, F.lit(1.0)))
    )  # noqa: closing the when/otherwise above


def _isin_hits(toks, values: tuple[str, ...]) -> F.Column:
    # NB: a plain `lambda x, m=values:` breaks — PySpark's higher-order
    # function wrapper binds Columns to *every* parameter incl. defaults.
    def pred(x):
        return x.isin(*values)

    return F.size(F.filter(toks, pred))


def lang_scores(col) -> list[tuple[str, F.Column]]:
    toks = ws_tokens(F.lower(col))
    return [(lang, _isin_hits(toks, markers)) for lang, markers in LANG_MARKERS.items()]


def lang_id(col) -> F.Column:
    """Marker-word language ID: argmax of per-language marker hits;
    ties break in LANG_MARKERS order; zero hits -> 'und'; NULL text ->
    NULL (size(NULL) would otherwise yield -1 everywhere and the first
    language would win by accident)."""
    scores = lang_scores(col)
    top = F.greatest(*[s for _, s in scores])
    expr = F.when(col.isNull(), F.lit(None)).when(top <= 0, F.lit("und"))
    for lang, s in scores:
        expr = expr.when(s == top, F.lit(lang))
    return expr


def normalize_text(col) -> F.Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint_md5(col) -> F.Column:
    """Deterministic document fingerprint over normalized text."""
    return F.md5(normalize_text(col))


def hex_hash64(col, seed: int | str = "") -> F.Column:
    """60-bit integer hash derived from md5 hex — the engine's
    oracle-parity hash: DuckDB computes the identical value as
    ``('0x' || substr(md5(seed || ':' || x), 1, 15))::BIGINT``."""
    seeded = F.concat(F.lit(str(seed)), F.lit(":"), col)
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


@F.pandas_udf(T.LongType())
def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash (base 257, mod 2^61-1) over the Unicode
    code points of the normalized text — the classic Rabin–Karp document
    fingerprint, as a vectorized Arrow kernel (no per-row Python at the
    Spark row level).

    Defined over code points (not utf-8 bytes) so the oracle can
    reproduce it exactly in ANSI SQL:
    ``list_reduce(list_prepend(0, codepoints), (a,x) -> (a*257+x) % m)``.
    """
    import re

    MOD = (1 << 61) - 1
    BASE = 257
    ws = re.compile(r"\s+")

    def one(t: str | None) -> int | None:
        if t is None:
            return None
        h = 0
        for ch in ws.sub(" ", t.lower()).strip():
            h = (h * BASE + ord(ch)) % MOD
        return h

    return texts.map(one).astype("Int64")
