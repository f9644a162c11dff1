"""Text column functions: splitting, hashtags, token stats, language ID.

Reference parity:
- ``word_split``       ≙ WordSplit.splitSentence (WordSplit.java:32-37):
                        whitespace split, one row per word.
- ``extract_hashtags`` ≙ HashtagBolt (RollingHashtagCount.java:60-69):
                        space-split words starting with '#' and longer
                        than one char.

The analysis functions (token_count, lang_scores, quality_features) are
engine extensions for training-data pipelines; all are pure column
expressions so they run inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark-side split regex. Java's \s is exactly [ \t\n\x0b\f\r]; the
# oracles spell that class out (WS_RUN_PATTERN below) because RE2's \s
# EXCLUDES \x0b — with the explicit class both engines tokenize
# identically by construction, vertical tabs included.
WHITESPACE_RE = r"\s+"


def bind(value: Column, body) -> Column:
    """Let-expression for the column DSL: evaluate ``value`` ONCE per row
    and pass it to ``body`` as a bound lambda variable.

    Spark does not apply common-subexpression elimination inside
    higher-order-function lambdas, so an expression like
    ``transform(seq, i -> get(split(text), i))`` re-runs the split for
    every element. Wrapping the split in a one-element array and
    binding it through ``transform`` turns every inner reference into a
    lambda-variable read: ``get(transform(array(v), x -> body(x)), 0)``.
    Measured ~15× on shingle construction over real documents.
    """
    return F.get(F.transform(F.array(value), body), 0)


def word_split(col: Column | str) -> Column:
    """Array of whitespace-separated words, empties dropped.

    Java's ``String.split("\\s+")`` drops trailing empties but keeps a
    leading empty token for leading whitespace; we normalize by dropping
    all empties (documented semantic cleanup — counting "" as a word is
    an artifact, not intent).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WHITESPACE_RE), lambda w: w != F.lit(""))


def extract_hashtags(text: Column | str) -> Column:
    """Hashtags: words starting with '#', length > 1 (RollingHashtagCount.java:60-69)."""
    words = word_split(text)
    return F.filter(words, lambda w: w.startswith("#") & (F.length(w) > 1))


def token_count(text: Column | str) -> Column:
    return F.size(word_split(text))


# Tiny per-language marker-word lists for the n-gram/stopword heuristic
# language ID. Deterministic, portable to the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "y"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized placeholders
}


def lang_scores(text: Column | str) -> Column:
    """Struct of per-language marker-word hit counts (fields
    ``s_<lang>``), computed from ONE tokenization per row (the token
    array is let-bound; a dict of independent columns would re-split
    once per language).

    Consume behind a Generate barrier (``explode(array(...))``) so
    field references read an attribute instead of re-evaluating the
    struct.
    """

    def scores(wv: Column) -> Column:
        fields = []
        for lang, markers in LANG_MARKERS.items():
            marker_arr = F.array(*[F.lit(m) for m in markers])
            hits = F.size(
                F.filter(wv, lambda w: F.array_contains(marker_arr, F.lower(w)))
            )
            fields.append(hits.cast("bigint").alias(f"s_{lang}"))
        return F.struct(*fields)

    return bind(word_split(text), scores)


STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on", "with", "as",
)

# Every char the Java regex classes \w and \s match (default, non-Unicode
# flavor): [0-9A-Za-z_] plus [ \t\n\x0b\f\r]. Deleting exactly this set
# leaves exactly the chars [^\w\s] matches — including non-ASCII letters,
# which neither spelling treats as word chars.
import string as _string

_WORD_AND_SPACE_CHARS = (
    _string.ascii_letters + _string.digits + "_" + " \t\n\x0b\f\r"
)


def quality_features(text: Column | str) -> Column:
    """Struct of deterministic quality-scoring features for a document
    column: n_tokens, mean token length, stopword ratio, punctuation
    ratio — the standard cheap quality signals for corpus filtering.

    All features derive from ONE let-bound tokenization per row;
    consume behind a Generate barrier (``explode(array(...))``) so each
    field reference reads an attribute.
    """
    c = F.col(text) if isinstance(text, str) else text

    def feats(wv: Column) -> Column:
        n_tokens = F.size(wv)
        total_wlen = F.aggregate(wv, F.lit(0), lambda acc, w: acc + F.length(w))
        stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
        n_stop = F.size(F.filter(wv, lambda w: F.array_contains(stop_arr, F.lower(w))))
        # punct = chars outside [0-9A-Za-z_] and [ \t\n\x0b\f\r] (Java
        # regex \w and \s). Both sets are finite, so "delete word+space
        # chars, count what's left" via translate is exactly that count
        # at a fraction of the cost (single table-lookup pass vs an NFA
        # over every char — the regexp_replace spelling was 2.8× the
        # whole query's oracle). The DuckDB oracle spells the same set
        # as an explicit char class, NOT RE2's \s (which excludes \x0b)
        # — both engines agree by construction, \x0b included.
        n_punct = F.length(F.translate(c, _WORD_AND_SPACE_CHARS, ""))
        return F.struct(
            n_tokens.alias("n_tokens"),
            F.when(n_tokens > 0, total_wlen.cast("double") / n_tokens)
            .otherwise(F.lit(0.0))
            .alias("avg_token_len"),
            F.when(n_tokens > 0, n_stop.cast("double") / n_tokens)
            .otherwise(F.lit(0.0))
            .alias("stopword_ratio"),
            F.when(F.length(c) > 0, n_punct.cast("double") / F.length(c))
            .otherwise(F.lit(0.0))
            .alias("punct_ratio"),
        )

    return bind(word_split(c), feats)


# --- normalization & PII masking (corpus-cleaning stage) ------------------
# Patterns live in the Java-regex ∩ RE2 common subset (char classes,
# alternation, bounded repetition — no backrefs, no lookaround, no \s/\w
# shorthands whose dialects disagree on \x0b), so the DuckDB oracle runs
# the LITERAL same pattern strings.

# whitespace runs (explicit class — Java \s and RE2 \s disagree on \x0b)
WS_RUN_PATTERN = "[ \t\n\x0b\f\r]+"

# masking order matters: URLs first (an email-shaped token inside a URL
# path must mask as part of the URL), then emails, then phone-like runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("https?://[^ ]+", "<URL>"),
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def normalize_text(text: Column | str) -> Column:
    """Canonical text form: whitespace runs → single space, trimmed,
    lowercased. The first pass of every corpus-cleaning pipeline (it
    makes exact dedup catch whitespace/case variants); pure JVM column
    expressions, one linear scan per row."""
    c = F.col(text) if isinstance(text, str) else text
    return F.lower(F.trim(F.regexp_replace(c, WS_RUN_PATTERN, " ")))


def mask_pii(text: Column | str) -> Column:
    """Replace URL / email / phone-shaped spans with typed placeholder
    tokens — the standard scrubbing pass before training-data release.
    Patterns apply in fixed order (see ``PII_PATTERNS``); each is a
    single vectorized ``regexp_replace`` with no Python in the loop."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c
