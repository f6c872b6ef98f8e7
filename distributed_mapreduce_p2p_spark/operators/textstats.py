"""Text analysis for training-data pipelines (north-star ops,
BASELINE.json): token counting, quality scoring, language ID,
document fingerprinting — all JVM-side expressions (no Python UDFs),
so they run inside whole-stage codegen and scale linearly with the
corpus.

The reference's only text op is the word-count tokenizer
(wc/wc.go:26-39); these generalize it to the per-document statistics
a 100 TB corpus-curation pipeline filters on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, punctuation runs.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

# Tiny per-language stopword lists for the n-gram/stopword-hit
# language heuristic. Deterministic, ASCII-only.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de", "le", "shi", "zai", "wo"),
}


def _hits_expr(words: tuple[str, ...], size_fn: str) -> str:
    """Count tokens of lower(text) that belong to ``words``.

    Emitted for both dialects: ``size_fn`` is ``size`` (Spark) or
    ``len`` (DuckDB); the split function also differs.
    """
    lst = ", ".join(f"'{w}'" for w in words)
    if size_fn == "size":  # Spark
        return (
            f"size(filter(split(lower(text), '[^a-z]+'), x -> x IN ({lst})))"
        )
    return (
        "len(list_filter(string_split_regex(lower(text), '[^a-z]+'),"
        f" x -> x IN ({lst})))"
    )


def lang_case_expr(dialect: str) -> str:
    """CASE expression choosing the language with the most stopword
    hits (priority order on ties: en > es > de > fr > zh; 'und' when
    zero hits everywhere). Identical logic in both dialects."""
    size_fn = "size" if dialect == "spark" else "len"
    hits = {lang: _hits_expr(ws, size_fn) for lang, ws in LANG_STOPWORDS.items()}
    langs = list(LANG_STOPWORDS)
    whens = []
    for i, lang in enumerate(langs):
        later = [langs[j] for j in range(i + 1, len(langs))]
        earlier = [langs[j] for j in range(i)]
        cond = " AND ".join(
            [f"({hits[lang]}) > 0"]
            + [f"({hits[lang]}) >= ({hits[o]})" for o in later]
            + [f"({hits[lang]}) > ({hits[o]})" for o in earlier]
        )
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def token_stats(df: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts and char length per doc."""
    return df.select(
        "doc_id",
        F.expr(
            r"size(filter(split(text, '[\\s]+'), x -> x <> ''))"
        ).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.length("text").cast("long").alias("len_chars"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Heuristic quality features: alpha ratio, whitespace ratio,
    stopword ratio, mean word length, and a combined score. All exact
    integer counts divided once in double — portable bit-for-bit."""
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    spaces = F.length(F.regexp_replace("text", r"[^\s]", ""))
    total = F.length("text")
    words = F.expr("size(filter(split(lower(text), '[^a-z]+'), x -> x <> ''))")
    stop = F.expr(_hits_expr(LANG_STOPWORDS["en"], "size"))
    return df.select(
        "doc_id",
        total.cast("long").alias("n_chars"),
        words.cast("long").alias("n_words"),
        (alpha / total).alias("alpha_ratio"),
        (spaces / total).alias("space_ratio"),
        (stop / words).alias("stopword_ratio"),
        (alpha / words).alias("mean_word_len"),
    )


def lang_id(df: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic; compares against the labeled
    ``lang`` column downstream if desired."""
    return df.select(
        "doc_id", "lang", F.expr(lang_case_expr("spark")).alias("pred_lang")
    )


def fingerprint(df: DataFrame) -> DataFrame:
    """Document fingerprints over whitespace/case-normalized text:
    full md5 plus a 60-bit integer fingerprint (for compact
    join/bucket keys)."""
    norm = "trim(regexp_replace(lower(text), '[^a-z]+', ' '))"
    return df.select(
        "doc_id",
        F.expr(f"md5({norm})").alias("fp_md5"),
        F.expr(
            f"cast(conv(substring(md5({norm}), 1, 15), 16, 10) as bigint)"
        ).alias("fp_int"),
    )
