"""Text-analysis operators: tokenization, quality scoring, language
ID, fingerprinting (SURVEY §2.3 LLM extensions).

Everything is a Column expression (codegen'd, shuffle-free, scans stay
columnar) so a 100 TB documents table maps straight through without a
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_caltopo_spark.functions.numeric import fround

#: tiny embedded stopword list — deterministic, engine-portable
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "and", "or", "of", "to", "in", "is")

#: (language, marker words) for the n-gram/marker language heuristic.
#: Checked in order; first language with a marker hit wins, else 'en'.
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("de", ("der", "die", "und", "nicht")),
    ("fr", ("le", "la", "et", "les")),
    ("es", ("el", "los", "las", "por")),
    ("zh", ("的", "是", "了")),
)


def portable_lower(col: Column) -> Column:
    """Engine-portable SIMPLE case folding.  Java's ``toLowerCase``
    applies Unicode SpecialCasing, which diverges from DuckDB's
    utf8proc simple 1:1 ``lower()`` in exactly two places:

    * U+0130 (Turkish İ) — the one UNCONDITIONAL multi-char lowercase
      mapping (İ → "i" + U+0307 combining dot in Java; İ → "i" 1:1 in
      utf8proc).  Pinned by pre-mapping İ → I.  (r8 adversarial sweep.)
    * U+03A3 (Greek Σ) — the one CONDITIONAL rule (Final_Sigma):
      Java lowers a word-final Σ to ς (U+03C2) while utf8proc always
      yields σ (U+03C3), so lower('ΟΔΟΣ') differs.  Pinned by
      pre-mapping Σ → σ BEFORE lower so the conditional rule never
      fires; both engines then agree on σ everywhere.  A pre-existing
      literal ς is already lowercase and passes through identically in
      both engines, so no post-fold is needed (a post-fold ς → σ on one
      side only would CREATE a divergence for ς-containing input).
      (r9, advisor finding.)

    These are the only two SpecialCasing lowercase entries, so the
    pre-translate makes the fold fully portable.  Every other probed
    class (\\x0B, emoji, CJK, combining marks, ZWSP, empty strings)
    already agreed."""
    return F.lower(F.translate(col, "İΣ", "Iσ"))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed, lowercased text.

    The split class is written out explicitly as RE2's \\s set
    ([ \\t\\n\\f\\r]) because Java's \\s ALSO matches vertical tab
    (\\x0B) while RE2's (the DuckDB oracles') does not — a document
    containing \\x0B would otherwise tokenize differently in the two
    engines and skew every tokens()-derived graded id
    (code-review r6).  Lowercasing is :func:`portable_lower` for the
    same reason (the U+0130 rule)."""
    return F.split(F.trim(portable_lower(col)), r"[ \t\n\f\r]+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column) -> Column:
    """Fraction of tokens that are stopwords (4 dp)."""
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return fround(n_stop / F.size(toks), 4)


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return fround(total / F.size(toks), 4)


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality heuristic: enough tokens, not stopword
    soup, enough raw characters.  Deterministic + SQL-portable."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return fround(
        F.least(F.lit(1.0), n_tok / F.lit(50.0)) * 0.5
        + (1.0 - n_stop / n_tok) * 0.3
        + F.least(F.lit(1.0), F.length(col) / F.lit(200.0)) * 0.2,
        4,
    )


def lang_id(col: Column) -> Column:
    """Marker-word language heuristic: first language whose marker
    appears as a whole token wins; default 'en'.  (A real model would
    be a Pandas UDF; this keeps the hot path in codegen and the result
    oracle-checkable.)"""
    padded = F.concat(F.lit(" "), portable_lower(col), F.lit(" "))
    expr: Column | None = None
    for lang, markers in reversed(LANG_MARKERS):
        hit = None
        for m in markers:
            c = padded.contains(f" {m} ")
            hit = c if hit is None else (hit | c)
        expr = F.when(hit, F.lit(lang)).otherwise(
            expr if expr is not None else F.lit("en")
        )
    return expr


def fingerprint(col: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased trimmed text
    (the cheap exact-dup key; rolling/shingle hashes live in dedup).
    Lowercasing is :func:`portable_lower` (the U+0130 rule)."""
    return F.md5(portable_lower(F.trim(col)))


#: (pattern, replacement) redaction rules, applied in order.  Patterns
#: are restricted to the syntax subset shared by Java regex (Spark) and
#: RE2 (DuckDB) so the oracle pair behaves identically.
#: The email rule's lookbehind is a PERFORMANCE guard, not a semantic
#: one (wide-values probe r14, knowledge #37): Java's regex engine
#: retries the greedy local-part class from every position of a long
#: alphanumeric run — a 200KB unbroken token costs O(n²) rescans
#: (observed: one such row pinned an executor for 10 min in
#: Matcher.search).  With the lookbehind, any attempt starting
#: MID-RUN fails in O(1), making the scan linear.  Match spans are
#: provably unchanged: the local-part class covers the whole run, so
#: the leftmost match always starts at the run start anyway — which
#: is exactly where the lookbehind allows it.  The DuckDB oracle
#: (RE2, lazy-DFA, no lookbehind support) is already linear and needs
#: no mirror — outputs are identical by the span argument.
PII_RULES: tuple[tuple[str, str], ...] = (
    (
        r"(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (r"\+1-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
)


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace over :data:`PII_RULES` — pure codegen'd
    string work, no Python boundary, so a 100 TB scrub is a map-only
    scan."""
    out = col
    for pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def bigrams(col: Column) -> Column:
    """Adjacent-token bigrams as an array<string> (empty for 1-token
    docs).  zip_with over two shifted slices keeps the whole expression
    in codegen AND evaluates the tokenization O(1) times per row — an
    element_at(tokens, i) inside a transform lambda would re-split the
    text per element, turning a 100 TB scan quadratic in tokens."""
    toks = tokens(col)
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
