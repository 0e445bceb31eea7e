"""Text analysis for training-data pipelines: token stats, quality scoring,
language ID, document fingerprinting.

All operators are pure Spark column expressions (whole-stage codegen, no
Python) and have exact DuckDB-SQL oracles in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plume_spark.functions.quantize import qround

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# marker lexicons for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "de", "los", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, avg_token_len) — whitespace +
    a BPE-ish sub-token count (runs of letters / digits / punctuation)."""
    toks = F.filter(F.split(F.col(text), " "), lambda t: t != "")
    subtoks = F.filter(
        F.split(F.regexp_replace(F.col(text), r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+)", "$1\x1f"), "\x1f"),
        lambda t: F.trim(t) != "",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        qround(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.size(subtoks).alias("n_subtokens"),
    )


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, stopword_ratio, punct_ratio, quality): deterministic
    length/punct/stopword heuristic in [0, 1]."""
    toks = F.filter(F.split(F.col(text), " "), lambda t: t != "")
    n_tok = F.greatest(F.size(toks), F.lit(1))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = F.length(F.col(text)) - F.length(F.regexp_replace(F.col(text), r"[^\w\s]", ""))
    len_ok = (F.length(F.col(text)) >= 50) & (F.length(F.col(text)) <= 5000)
    return df.select(
        F.col(id_col).alias("doc_id"),
        qround(n_stop / n_tok, 4).alias("stopword_ratio"),
        qround(n_punct / F.greatest(F.length(F.col(text)), F.lit(1)), 4).alias("punct_ratio"),
        qround(
            (F.when(len_ok, 0.4).otherwise(0.0))
            + F.least(n_stop / n_tok, F.lit(0.3)) * 1.0
            + F.when(
                n_punct / F.greatest(F.length(F.col(text)), F.lit(1)) < 0.1, 0.3
            ).otherwise(0.0),
            4,
        ).alias("quality"),
    )


def language_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang): marker-word counting; CJK chars force 'zh';
    no marker hits -> 'und'.  Ties resolve to the lexicographically first
    language (deterministic)."""
    toks = F.filter(F.split(F.lower(F.col(text)), " "), lambda t: t != "")
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # max_by over (score, -lang): array_max on struct compares score then lang;
    # to make ties pick the FIRST lang, compare (score, reversed-rank) instead
    ranked = [
        F.struct(s["score"].alias("score"), F.lit(-i).alias("rank"), s["lang"].alias("lang"))
        for i, s in enumerate(scores)
    ]
    best = F.array_max(F.array(*ranked))
    has_cjk = F.col(text).rlike(r"[一-鿿]")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(has_cjk, F.lit("zh"))
        .when(best["score"] > 0, best["lang"])
        .otherwise(F.lit("und"))
        .alias("pred_lang"),
    )


# email, then long digit runs (account/phone-shaped); both patterns use only
# classes + bounded quantifiers, valid under Java regex AND RE2 so the DuckDB
# oracle replays them verbatim
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGITS = r"[0-9]{5,}"


def pii_scrub(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact PII-shaped spans: emails -> <EMAIL>, 5+ digit runs -> <NUM> —
    the scrub pass a training pipeline runs before tokenization.  Pure
    regexp_replace projection (scan-speed at 100 TB); returns
    (doc_id, text, n_redactions) where n_redactions counts replaced spans
    so downstream can quarantine PII-dense docs."""
    t = F.col(text)
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_DIGITS, "<NUM>"
    )
    n_email = F.size(F.split(t, PII_EMAIL, -1)) - 1
    n_num = F.size(F.split(F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_DIGITS, -1)) - 1
    return df.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("text"),
        (n_email + n_num).cast("long").alias("n_redactions"),
    )


# fixed logistic-regression weights for the model-based quality score: a
# deterministic stand-in for a trained fastText/LR quality classifier — the
# Spark-side SERVING pattern (pure column arithmetic, no model runtime) is
# the part that matters at 100 TB.
LOGREG_BIAS = -1.5
LOGREG_W = {"f_len": 2.0, "f_stop": 3.0, "f_word": -0.5}


def quality_logreg(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Model-based quality score: sigmoid(w . x) over interpretable text
    features (length saturation, stopword ratio, mean word length) with
    FIXED published weights.  (doc_id, f_len, f_stop, f_word, score).
    Everything is per-row column arithmetic — applying a linear model at
    scan speed, the way trained quality classifiers are served in corpus
    pipelines (score once, filter by threshold downstream)."""
    toks = F.filter(F.split(F.col(text), " "), lambda t: t != "")
    n = F.greatest(F.size(toks), F.lit(1))
    f_len = F.least(F.length(F.col(text)) / F.lit(500.0), F.lit(1.0))
    f_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) / n
    f_word = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n / F.lit(10.0)
    z = (
        F.lit(LOGREG_BIAS)
        + F.lit(LOGREG_W["f_len"]) * f_len
        + F.lit(LOGREG_W["f_stop"]) * f_stop
        + F.lit(LOGREG_W["f_word"]) * f_word
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        qround(f_len, 6).alias("f_len"),
        qround(f_stop, 6).alias("f_stop"),
        qround(f_word, 6).alias("f_word"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint): positional rolling hash over tokens —
    sum((pos+1) * (len(tok)*131 + first_char_code) mod P) mod P, P = 1e9+7.
    Arithmetic only, portable to the SQL oracle, order-sensitive (a reordered
    document fingerprints differently, unlike bag-of-words hashes).

    A pure per-row array fold — ZERO shuffles (the round-2 posexplode +
    groupBy form moved every token through an exchange; the per-term mod
    keeps the accumulator bounded, and (a+b) mod P folded stepwise equals
    mod-of-sum, so values are unchanged).  Docs with no tokens are filtered
    out, matching the former group-by drop semantics and the SQL oracle."""
    P = 1000000007
    toks = F.filter(F.split(F.col(text), " "), lambda t: t != "")

    def tok_code(t):
        return (F.length(t).cast("long") * 131 + F.ascii(t)) * 131 + F.ascii(
            F.reverse(t)
        )

    terms = F.transform(
        toks, lambda t, i: ((i + 1).cast("long") * (tok_code(t) % P)) % P
    )
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % P)
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"), fp.alias("fingerprint"))
        .filter(F.size("_t") > 0)
        .drop("_t")
    )


def readability(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_sentences, n_syllables, flesch): Flesch reading
    ease with a vowel-group syllable proxy — the deterministic readability
    gate corpus-quality pipelines threshold on.

        flesch = 206.835 - 1.015 * (words / sentences)
                         - 84.6  * (syllables / words)

    Sentences = non-overlapping runs of [.!?] (floored at 1); syllables =
    non-overlapping runs of [aeiou] in the lowercased text; words floored
    at 1 so empty docs stay defined.  Pure column expressions (regexp_count
    is JVM-side, whole-stage codegen) — zero shuffle, like quality_score."""
    toks = F.filter(F.split(F.col(text), " "), lambda t: t != "")
    n_words = F.greatest(F.size(toks), F.lit(1)).cast("long")
    n_sent = F.greatest(
        F.regexp_count(F.col(text), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    n_syl = F.regexp_count(F.lower(F.col(text)), F.lit(r"[aeiou]+")).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syl / n_words)
    )
    # floor(x*100 + 0.5) / 100.0 instead of round(x, 2): a doc landing
    # EXACTLY on the centi-unit half boundary (e.g. 18 words, 1 sentence,
    # 22 syllable groups -> 85.165) rounds differently under Spark's
    # BigDecimal HALF_UP vs DuckDB's binary-double round — the same
    # knife edge the a16 skewness repair closed.  Plain IEEE ops are
    # bit-identical on both engines (found by the sf0.1 full sweep).
    flesch_q = F.floor(flesch * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        flesch_q.alias("flesch"),
    )


def word_entropy(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc unigram Shannon entropy (nats) over whitespace tokens — the
    Gopher-style diversity signal: looping/generated text collapses toward
    0, natural prose sits near log(vocab).  Uses the identity
    H = ln(n) - sum(c*ln(c))/n over exact int64 token counts, so the only
    float work is one log per distinct token.

    (doc_id, n_tokens, n_distinct_tokens, entropy).  Scale: explode ->
    partial-agg on (doc_id, token) -> partial-agg on doc_id — two map-side
    combinable shuffles, both keyed by doc (never by corpus vocabulary), so
    skew is bounded by the largest single document."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.filter(F.split(F.col(text), " "), lambda t: t != "")).alias("tok"),
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    return cnt.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.round(
            F.log(n.cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))) / n,
            6,
        ).alias("entropy"),
    )


def bpe_pair_counts(
    df: DataFrame, k: int = 20, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The first step of BPE tokenizer training: corpus-wide counts of
    adjacent symbol pairs within words -> the top-``k`` (pair, n_pairs)
    merge candidates (count desc, pair asc — a total order, so the cut is
    bit-deterministic).  Full BPE iterates merge-recount; the recount after
    a merge touches only words containing the merged pair, so each round is
    this same map-side-combinable shape over a shrinking stream.

    Scale: explode to word-internal character bigrams (a pure projection),
    ONE partial agg whose key space is bounded by alphabet^2 (map-side
    combine collapses each task to at most that many rows), and a
    TakeOrderedAndProject top-k — no global sort, no vocabulary-sized
    shuffle."""
    words = df.select(
        F.explode(F.split(F.col(text), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("pair").asc())
        .limit(k)
    )


def pmi_bigrams(
    df: DataFrame, k: int = 20, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent word
    pairs -> the top-``k`` bigrams by frequency (c12 desc, w1 asc, w2 asc —
    a total order) with PMI = ln(c12 * T / (l1 * r2)), where l1 / r2 are
    the words' left-slot / right-slot occurrence counts and T the total
    bigram count.  High-PMI pairs are multiword units ("new york") the
    tokenizer or phrase miner should keep together.

    Cross-engine contract: c12 / l1 / r2 are exact int64; PMI is ONE ln
    over a product/quotient of those exact ints quantized floor(x*1e6+0.5)
    — no float summation anywhere, so the row hashes identically on any
    engine and under any partitioning.

    Scale: one (w1, w2)-keyed partial agg over the exploded bigram stream,
    two vocabulary-sized slot-count aggs DERIVED from the bigram table
    (not a second corpus pass), one broadcast scalar, and a
    TakeOrderedAndProject top-k — no global sort."""
    toks = F.filter(F.split(F.col(text), " "), lambda x: x != "")
    pairs = df.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    big = big.localCheckpoint(eager=True)  # 4 consumers: left, right, T, rows
    left = big.groupBy("w1").agg(F.sum("c12").alias("l1"))
    right = big.groupBy("w2").agg(F.sum("c12").alias("r2"))
    total = big.agg(F.sum("c12").alias("t_big"))
    pmi = F.log(
        F.col("c12").cast("double")
        * F.col("t_big").cast("double")
        / (F.col("l1").cast("double") * F.col("r2").cast("double"))
    )
    return (
        big.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c12",
            "l1",
            "r2",
            F.floor(pmi * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("pmi_e6"),
        )
        .orderBy(F.col("c12").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )
