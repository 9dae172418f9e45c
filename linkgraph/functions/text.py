"""Text-analysis operators over a documents table — the training-data
pipeline tier (task brief: language id, quality scoring, token
counting, document fingerprinting). All are pure pyspark.sql.functions
column expressions (JVM-side, whole-stage codegen) — no Python UDFs —
and each has an exact DuckDB-SQL oracle in __spark_entry__.py.

Determinism notes: expressions avoid anything engine-specific
(regex classes are shared verbatim with the SQL oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with the SQL oracles — keep in sync with __spark_entry__.py
TOKEN_SPLIT_RE = "[^a-zA-Z0-9]+"

# tiny per-language stopword marker sets for the n-gram/stopword
# language-id heuristic (padded with spaces: whole-word occurrences)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring: (len(s) - len(replace(s)))/len(needle)
    — expressible identically in any SQL dialect."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def token_count(col: Column) -> Column:
    """Whitespace/punctuation token count (BPE-ish pre-tokenization:
    maximal alphanumeric runs)."""
    toks = F.split(F.trim(col), TOKEN_SPLIT_RE)
    # split can yield leading/trailing empty strings; filter them
    return F.size(F.filter(toks, lambda t: t != F.lit("")))


def char_count(col: Column) -> Column:
    return F.length(col)


def quality_score_col(c: Column) -> Column:
    """The composite quality score as a bare Column (rounded to 6) —
    the single source of truth shared by ``quality_features`` and any
    one-projection composition (functions/corpus.clean_corpus folds it
    into the same select as the language id, so the composed pipeline
    scans the documents once instead of three scans + two self-joins)."""
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_stop = sum(
        (_count_occurrences(padded, m) for ms in LANG_MARKERS.values() for m in ms),
        F.lit(0.0),
    )
    mean_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(10.0), F.lit(1.0)) * 0.3
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), 0.3).otherwise(0.0)
    )
    return F.round(score, 6)


def pred_lang_col(c: Column) -> Column:
    """The predicted-language expression as a bare Column (see
    ``quality_score_col`` for why these exist as column builders)."""
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    scores = {
        lang: sum((_count_occurrences(padded, m) for m in ms), F.lit(0.0))
        for lang, ms in LANG_MARKERS.items()
    }
    best = None
    for lang in sorted(scores):  # ascending code order = tie-break
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        else:
            best = F.when(scores[lang] > best["s"], F.struct(s.alias("s"), F.lit(lang).alias("l"))).otherwise(best)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features +
    composite score in [0, 1] (heuristic: long-enough docs with normal
    punctuation and some stopwords score high)."""
    c = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    n_chars = F.length(c)
    n_tokens = token_count(c)
    n_punct = _count_occurrences(c, ".") + _count_occurrences(c, ",")
    n_stop = sum(
        (_count_occurrences(padded, m) for ms in LANG_MARKERS.values() for m in ms),
        F.lit(0.0),
    )
    mean_tok_len = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality_score_col(c).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language id: score per language = whole-word
    marker occurrences; predicted = argmax, ties broken by language
    code order, 'und' (undetermined) when no marker hits."""
    return df.select("doc_id", pred_lang_col(F.col(text_col)).alias("pred_lang"))


#: 31-bit Mersenne prime modulus shared by every portable-hash stream.
HASH_MOD = (1 << 31) - 1


def portable_token_hash(tok, mult: int = 131):
    """31-bit polynomial hash of a token's characters — pure integer
    arithmetic, reproducible bit-for-bit in any engine with 64-bit
    ints (the DuckDB oracles re-derive it in SQL). Tokens are
    ``[a-zA-Z0-9]+`` (TOKEN_SPLIT_RE), so ``ascii()`` codepoints are
    engine-independent. acc < 2^31, mult 131, codepoint < 128:
    max ~2^39 — no long overflow under ANSI mode."""
    return F.aggregate(
        F.filter(F.split(tok, ""), lambda c: c != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(
            acc * F.lit(mult).cast("long") + F.ascii(c), F.lit(HASH_MOD).cast("long")
        ),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", token_hash: str = "xxhash64"
) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash over
    the token sequence, folded mod 2^31-1 so the arithmetic never
    overflows a long — Spark 4 runs ANSI mode, so deliberate wraparound
    would throw. Robust to surrounding whitespace; JVM-side via
    aggregate().

    token_hash: 'xxhash64' (default — fastest, JVM intrinsic) or
    'portable' (polynomial char hash: bit-for-bit reproducible outside
    Spark — use when fingerprints must match across engines, e.g.
    deduplicating against a DuckDB/Polars-side corpus; it is also what
    gives the harness query an exact DuckDB oracle)."""
    mod = F.lit(HASH_MOD).cast("long")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )
    if token_hash == "portable":
        tok_h = portable_token_hash
    elif token_hash == "xxhash64":
        def tok_h(t):
            return F.pmod(F.xxhash64(t), F.lit(1 << 31).cast("long"))
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")

    def _stream(mult: int, basis: int):
        # acc < 2^31, mult small, token hash < 2^31: max ~2^37, no overflow
        return F.aggregate(
            toks,
            F.lit(basis).cast("long"),
            lambda acc, t: F.pmod(acc * F.lit(mult).cast("long") + tok_h(t), mod),
        )

    # two independent 31-bit streams packed into one 62-bit fingerprint
    fp = _stream(31, 2166136261 % HASH_MOD) * F.lit(1 << 31).cast("long") + _stream(
        37, 16777619
    )
    return df.select("doc_id", fp.alias("fingerprint"))
