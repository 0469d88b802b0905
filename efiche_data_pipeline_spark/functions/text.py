"""Text-analysis column expressions (all JVM-side built-ins — no Python
UDFs in the hot path). These power the LLM-data-pipeline extensions:
tokenization, shingling, quality scoring, language ID, fingerprints.

Reference analogue: the comma-separated ``labels`` string and
``report_text`` columns (reference: sql/01_schema.sql:112, :92) — text
handled there as opaque strings; here it becomes first-class array /
metric columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seeds for the heuristic language guesser.
# Order matters: ties resolve in this order (same order in the oracle).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "los", "una"),
    "de": ("der", "die", "und", "das", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}

PUNCT_CLASS = r"[.,;:!?]"


# Explicit whitespace class instead of \s: Java regex \s includes
# \x0B (vertical tab) while RE2's (DuckDB's) does not — pinning the
# characters keeps the Spark expression and the DuckDB oracle
# byte-identical on every input.
_WS = r"\t\n\f\r "


def canonical_text(text: str | Column) -> Column:
    """Unicode-robust canonical form for dedup keys: lowercase, map
    every non-letter/digit character to a space, collapse whitespace
    runs, trim. Real crawls contain the SAME document differing only
    in case, punctuation, or spacing — shingling raw text treats those
    as distinct and near-dup misses them (the q103/q28 front-end gap
    named by VERDICT r05 Next #6).

    All JVM built-ins (lower + two regexp_replace) — this runs inside
    whole-stage codegen on the full corpus scan. NFC normalization
    (é as one codepoint vs e+combining accent) is NOT expressible with
    Spark built-ins; compose with
    :func:`efiche_data_pipeline_spark.operators.dedup.nfc_normalize_docs`
    first when the corpus may carry decomposed forms — the fixture and
    oracle pipeline apply exactly that order (NFC → lower → strip →
    collapse).

    Oracle mirror (DuckDB): ``trim(regexp_replace(regexp_replace(
    lower(nfc_normalize(text)), '[^...]', ' ', 'g'), '[ws]+', ' ',
    'g'))`` — see :func:`oracle_canonical_sql`. Character classes use
    ``\\p{L}\\p{N}`` (identical semantics in Java regex and RE2) and
    the pinned whitespace class above."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.regexp_replace(c, f"[^\\p{{L}}\\p{{N}}{_WS}]", " ")
    c = F.regexp_replace(c, f"[{_WS}]+", " ")
    return F.trim(c)


def oracle_canonical_sql(text_expr: str) -> str:
    """The DuckDB replay of NFC → :func:`canonical_text` over
    ``text_expr`` (DuckDB's nfc_normalize supplies the NFC step that
    the Spark side runs as an Arrow batch pass)."""
    return (
        "trim(regexp_replace(regexp_replace("
        f"lower(nfc_normalize({text_expr})), "
        f"'[^\\p{{L}}\\p{{N}}{_WS}]', ' ', 'g'), "
        f"'[{_WS}]+', ' ', 'g'))"
    )


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization → array<string>.
    Oracle: ``regexp_split_to_array(text, '\\s+')``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


# Subword-ish lexer classes, shared verbatim with the DuckDB oracle
# (both regex engines treat this alternation identically): letter runs,
# digit runs, single non-alphanumeric marks. A BPE tokenizer's
# pre-tokenization split — the cheap, model-free approximation of a
# real BPE vocab count (which would need the merges table).
BPE_ISH_PATTERN = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"


def bpe_ish_count(text: str | Column) -> Column:
    """Subword-ish token count via :data:`BPE_ISH_PATTERN`.
    Oracle: ``length(regexp_extract_all(text, pattern))``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(1)))


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: str | Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in ``words`` (vectorized higher-order
    filter — no UDF). Oracle: ``length(list_filter(split, t -> t IN (...)))``."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def punct_count(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def word_ngrams(text: str | Column, n: int) -> Column:
    """ALL overlapping word n-grams in document order (repeats kept)
    → array<string>.

    Built from ``transform`` over token index positions (JVM-side), so
    the oracle can reproduce it with list comprehensions. Joins the n
    words with a single space.

    The token array is bound ONCE as a lambda variable by wrapping it
    in a single-element array and transforming over that: higher-order
    functions evaluate their *argument expressions* per call with no
    codegen/CSE, so referencing the ``split`` expression at each of
    the n ``element_at`` sites would re-split the document O(n·len)
    times (measured 12× slower at sf0.1 — the round-1..3 form). A
    lambda variable is a bound VALUE, evaluated exactly once per row.
    """
    toks = tokens(text)

    def grams_of(t: Column) -> Column:
        k = F.size(t) - F.lit(n - 1)
        # sequence(1, 0) would produce a DESCENDING [1, 0] in Spark, so
        # short documents must map to an explicitly empty index array.
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + F.lit(j)).cast("int")) for j in range(n)]
            ),
        )

    return F.flatten(F.transform(F.array(toks), grams_of))


def word_shingles(text: str | Column, n: int) -> Column:
    """Distinct n-gram word shingles → array<string> (set semantics —
    the dedup/blocking form of :func:`word_ngrams`)."""
    return F.array_distinct(word_ngrams(text, n))


def predict_lang(text: str | Column) -> Column:
    """Heuristic language ID: CJK-codepoint detection wins outright,
    otherwise the language with the most stopword hits; ties resolve in
    LANG_STOPWORDS order (en > es > de > fr). The oracle reproduces the
    identical CASE ladder (see q33/q51 in plans/extensions.py)."""
    c = F.col(text) if isinstance(text, str) else text
    hits = {lang: stopword_count(c, words) for lang, words in LANG_STOPWORDS.items()}
    en, es, de, fr = hits["en"], hits["es"], hits["de"], hits["fr"]
    return (
        F.when(c.rlike(r"[一-鿿]"), "zh")
        .when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )


def quality_score_raw(text: str | Column) -> Column:
    """Unrounded document quality in [0, 1]: half English-stopword
    density (fluency proxy), half saturating length credit at 200
    tokens. Both terms are exact IEEE double ops on integer inputs, so
    any engine computing the same formula produces bit-identical
    doubles — thresholding on the raw score is oracle-safe."""
    n_tok = token_count(text)
    stop = stopword_count(text, LANG_STOPWORDS["en"])
    return F.lit(0.5) * (stop.cast("double") / n_tok) + F.lit(0.5) * (
        F.least(n_tok, F.lit(200)).cast("double") / 200.0
    )


def bow_fingerprint(text: str | Column) -> Column:
    """Bag-of-words document fingerprint: md5 of the sorted distinct
    token set. Detects shuffled/reordered duplicates that exact-hash
    dedup misses. Oracle:
    ``md5(array_to_string(list_sort(list_distinct(split)), ' '))``."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))
