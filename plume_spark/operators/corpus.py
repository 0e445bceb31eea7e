"""Training-corpus preparation operators: decontamination, boilerplate
scoring, deterministic train/val splitting, TF-IDF term ranking, and
concat-then-chunk sequence packing.

These extend the reference's dedup/idempotency semantics (duplicate identity
IDriver.scala:91-98; unchanged-input skip CHANGELOG.md:694) to the operations
a large-scale LLM training-data pipeline runs between raw documents and
tokenized batches.  Everything is pure DataFrame algebra — whole-stage
codegen, no Python in the loop — and every operator has an exact ANSI-SQL
oracle in __spark_entry__.py.

Scale notes:
* decontamination joins on the shingle string; Spark's shuffle hashes the
  key, and the eval side (benchmarks are small) is broadcast — the classic
  "13-gram against the eval suite" shape where only the corpus side is big.
* boilerplate scoring is two partial aggregates over the shingle stream —
  no self-join, no window over raw text.
* the split and packing operators are pure projections / one window per
  hash shard: no global sort, no driver collect (shard count is the
  packing parallelism knob — see pack_chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from plume_spark.functions.quantize import qround
from plume_spark.operators.dedup import poly_hash, shingles

# deterministic eval-subset selector for the contract decontamination query:
# every 29th doc plays the "benchmark" held-out set.
EVAL_MOD = 29


def _doc_tokens(df: DataFrame, text: str, id_col: str) -> DataFrame:
    """(doc_id, tok) with multiplicity (dedup.tokens minus the distinct) —
    the shared token-explosion for the frequency-based scorers."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def ngram_overlap(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per train doc, how many of its distinct
    word n-grams also appear anywhere in the eval set.

    Returns (doc_id, n_grams, n_overlap, overlap_frac) for train docs with at
    least one overlapping gram.  The eval gram set is deduplicated across
    docs and broadcast (eval suites are dictionary-sized); the corpus side
    streams through one shuffle-free semi-ish inner join + one aggregate."""
    tg = shingles(train, n=n, text=text, id_col=id_col).localCheckpoint(eager=True)  # 2 consumers
    eval_grams = shingles(evalset, n=n, text=text, id_col=id_col).select("tok").distinct()
    sizes = tg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        tg.join(F.broadcast(eval_grams), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        hits.join(sizes, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            qround(F.col("n_overlap") / F.col("n_grams"), 6).alias("overlap_frac"),
        )
    )


def boilerplate_score(
    df: DataFrame,
    n: int = 3,
    min_docs: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc boilerplate density: the fraction of a doc's distinct word
    n-grams that are corpus-common (appear in >= min_docs distinct docs).

    (doc_id, n_shingles, n_common, boilerplate_frac).  Two partial hash
    aggregates over the shingle stream (per-gram doc counts; per-doc tallies)
    joined back.  The common-gram table scales with shared boilerplate, so
    its semi-join is left to the planner (broadcast only when it fits).
    The web-scale use: drop or down-weight docs whose text is
    mostly navigation chrome / license headers duplicated across sites."""
    sh = shingles(df, n=n, text=text, id_col=id_col).localCheckpoint(eager=True)  # 3 consumers
    common = (
        sh.groupBy("tok")
        .agg(F.count("*").alias("n_docs"))  # sh is distinct per (doc, tok)
        .filter(F.col("n_docs") >= min_docs)
        .select("tok")
    )
    marked = sh.join(common, "tok", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("n_common")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (
        sizes.join(marked, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            qround(F.coalesce("n_common", F.lit(0)) / F.col("n_shingles"), 6).alias(
                "boilerplate_frac"
            ),
        )
    )


def train_val_split(
    df: DataFrame, val_pct: int = 10, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic hash split: bucket = poly_hash(str(doc_id)) mod 100;
    buckets < val_pct go to 'val', the rest to 'train'.

    (doc_id, bucket, split).  A pure projection: the same doc lands in the
    same split on every run, on any cluster size, with no coordination —
    the split survives resume/retry by construction.  At 100 TB this is the
    only splitter that needs neither a shuffle nor a materialized
    assignment table."""
    bucket = F.pmod(poly_hash(F.col(id_col).cast("string")), F.lit(100)).cast("int")
    return df.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def tfidf_topk(
    df: DataFrame, k: int = 3, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k distinctive terms per doc by TF-IDF.

    (doc_id, tok, tf, df_docs, score) with score = round(tf * ln(N/df), 6).
    Ranking is integer-only (tf desc, df asc, tok asc) so row selection is
    bit-deterministic across engines; the float score is display-rounded.
    Both aggregates are partial (map-side combined); the per-token document
    frequency table is derived from the tf table itself — one pass over the
    token stream feeds both."""
    toks = _doc_tokens(df, text, id_col)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df_docs"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df_docs").asc(), F.col("tok").asc()
    )
    return (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "tok",
            "tf",
            "df_docs",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df_docs")), 6).alias("score"),
        )
    )


def pack_chunks(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid end-to-end in
    deterministic order within hash shards and cut into fixed token budgets.

    (doc_id, shard, tok_offset, chunk) where chunk = tok_offset // budget —
    the training-batch a doc's first token lands in.  One window per shard
    (cumulative token counts, rows-unbounded-preceding).  A window partition
    executes in a single task, so ``n_shards`` is the parallelism AND the
    per-task memory bound: it must be sized so one shard's rows fit a task
    (tokens_total / n_shards ~ a few hundred MB of (id, count) rows) — the
    default 8 suits the test corpus, a 100 TB run wants thousands.  Shards
    are keyed by the portable string hash, so non-numeric doc ids are fine
    and the assignment is resume-stable.  This is the streaming
    concat+chunk tokenizer-feed shape (exact greedy bin packing needs a
    sequential scan; offset-chunking is the form production pipelines
    actually use)."""
    n_tok = F.size(F.filter(F.split(F.col(text), " "), lambda t: t != ""))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(poly_hash(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "doc_id",
        "shard",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tok_offset"),
    ).withColumn("chunk", F.floor(F.col("tok_offset") / budget).cast("long"))


def select_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The capstone composition: training-ready corpus selection.

    Keeps docs that pass the quality heuristic, are in an accepted language,
    and are their exact-duplicate group's keeper — the filter chain every
    training-data pipeline runs between raw crawl and tokenizer.  One plan:
    three doc-keyed joins over the shared scan; Catalyst pushes the filters
    and prunes columns, so at 100 TB this is a handful of co-keyed shuffles,
    not three passes over raw text."""
    from plume_spark.operators.dedup import exact_dedup
    from plume_spark.operators.text import language_id, quality_score

    q = quality_score(df, text=text, id_col=id_col).select("doc_id", "quality")
    lang = language_id(df, text=text, id_col=id_col)
    keep = exact_dedup(df, text=text, id_col=id_col).select("doc_id", "keeper_id")
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(q, "doc_id")
        .join(lang, "doc_id")
        .join(keep, "doc_id")
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("pred_lang").isin(*langs)
            & (F.col("doc_id") == F.col("keeper_id"))
        )
        .select("doc_id", "quality", "pred_lang")
    )


MIX_P = 1000003  # prime sampling modulus (fits the mulmod in int64)
MIX_A = 2654435761 % MIX_P
MIX_B = 40503


def mix_sample(
    df: DataFrame, rates: DataFrame, id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic stratified corpus mixing: keep each doc with its
    source's target rate — the data-mixing step every multi-source training
    pipeline runs (web x wiki x code at tuned proportions).

    The keep decision is a pure hash projection, pmod(pmod(id,P)*A + B, P)
    < rate*P — no randomness to persist, identical across runs/engines, and
    re-running on a grown corpus keeps previously-kept docs kept (stable
    membership, the same philosophy as the deterministic train/val split).
    ``rates`` is a tiny (source, rate) table — broadcast by the planner.
    """
    u = F.pmod(
        F.pmod(F.col(id_col), F.lit(MIX_P)) * F.lit(MIX_A) + F.lit(MIX_B), F.lit(MIX_P)
    )
    return (
        df.join(rates, source_col)
        .withColumn("_u", u)
        .filter(F.col("_u") < F.col("rate") * F.lit(MIX_P))
        .select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
    )


def dupe_ngram_rate(
    df: DataFrame, n: int = 8, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc CROSS-document n-gram duplication rate: the fraction of a
    doc's distinct word n-grams that also occur in at least one OTHER doc —
    the corpus-level duplication diagnostic behind suffix-style "dedup the
    training set" passes (long n defaults catch copied passages, not
    common phrases).

    (doc_id, n_ngrams, dup_frac).  Two partial aggregates + one join on the
    gram hash — never a self-join: the gram document-frequency table plays
    the same role as tfidf's df table, and only grams of the probed doc set
    flow through the final aggregate."""
    sh = shingles(df, n, text, id_col).select(
        "doc_id", F.xxhash64("tok").alias("g")
    )
    sh = sh.localCheckpoint(eager=True)  # gram DF + per-doc aggregate
    gdf = sh.groupBy("g").agg(F.count("*").alias("n_docs"))
    return (
        sh.join(gdf, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            qround(
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)) / F.count("*"), 6
            ).alias("dup_frac"),
        )
    )


def unigram_logprob(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean unigram log-likelihood per doc under the corpus's own unigram
    model — the model-based quality signal (CCNet-style): garbled or
    out-of-distribution docs score low.

    (doc_id, n_tokens, avg_logprob).  Two partial aggregates (per-token
    corpus counts; per-doc means) and one broadcast scalar — the token
    frequency table joins at the planner's discretion (corpus-vocabulary
    sized, like tfidf's df table)."""
    toks = _doc_tokens(df, text, id_col).localCheckpoint(eager=True)  # 2 consumers
    freq = toks.groupBy("tok").agg(F.count("*").alias("n_tok"))
    total = freq.agg(F.sum("n_tok").alias("n_total"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("n_tok") / F.col("n_total"))), 6).alias("avg_logprob"),
        )
    )


def repetition_score(
    df: DataFrame, n: int = 2, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-doc repetition (the Gopher-rule signal): the fraction of a
    doc's word n-grams that are repeats of an earlier n-gram in the SAME
    doc.  Looping generated text scores near 1, natural text near 0.

    (doc_id, n_ngrams, rep_frac).  A pure per-row column expression —
    whole-stage codegen, zero shuffles — so it runs at scan speed over
    100 TB."""
    toks = F.filter(F.split(F.col(text), " "), lambda x: x != "")
    # guard: F.sequence(1, 0) DESCENDS (1, 0), feeding slice() an illegal
    # start of 0 — docs shorter than n tokens must yield an empty gram list
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    rep = F.when(
        n_grams > 0,
        qround((n_grams - F.size(F.array_distinct(grams))) / n_grams, 6),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_grams.cast("long").alias("n_ngrams"),  # match SQL len() (BIGINT)
        rep.alias("rep_frac"),
    )


def ngram_novelty(
    df: DataFrame, n: int = 8, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc n-gram NOVELTY in corpus order: the fraction of a doc's
    distinct word n-grams whose first occurrence (min doc_id) is this doc —
    the freshness/diversity signal data-mixing passes rank sources by (a
    near-copy of earlier material scores ~0, genuinely new text ~1).  The
    complement of dupe_ngram_rate's symmetric duplication view: novelty is
    ORDER-aware, so re-ingesting a corpus twice shows the second pass at 0.

    (doc_id, n_ngrams, n_novel, novelty_frac).  Same scale shape as
    dupe_ngram_rate: one per-gram partial aggregate (min doc over the gram
    hash) joined back on the hash — never a self-join, never a window over
    the corpus."""
    sh = shingles(df, n, text, id_col).select(
        "doc_id", F.xxhash64("tok").alias("g")
    )
    sh = sh.localCheckpoint(eager=True)  # gram first-seen + per-doc aggregate
    first = sh.groupBy("g").agg(F.min("doc_id").alias("_first"))
    novel = F.sum(F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0))
    return (
        sh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            novel.alias("n_novel"),
            qround(novel / F.count(F.lit(1)), 6).alias("novelty_frac"),
        )
    )


def length_histogram(
    df: DataFrame, len_col: str = "n_chars", group_col: str = "source"
) -> DataFrame:
    """Power-of-two length histogram per corpus slice: the size-distribution
    diagnostic run before choosing chunking/packing parameters and for
    spotting truncation artifacts (a spike in one bucket = a hard cap
    somewhere upstream).

    Buckets are EXACT integer bit-lengths (bucket k holds lengths in
    [2^(k-1), 2^k - 1]; 0 and NULL land in bucket 0) computed via the
    binary-string length — no float log2, so bucket edges are
    engine-portable by construction.  (group, bucket, n_docs, total_chars,
    share) with share = bucket fraction within its group.  One partial-agg
    shuffle plus a window over the (tiny) aggregate."""
    ln = F.coalesce(F.col(len_col).cast("long"), F.lit(0))
    bucket = F.when(ln > 0, F.length(F.bin(ln))).otherwise(F.lit(0)).cast("int")
    agg = (
        df.select(F.col(group_col).alias("grp"), ln.alias("_len"), bucket.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("_len").alias("total_chars"))
    )
    w = Window.partitionBy("grp")
    return agg.select(
        "grp",
        "bucket",
        "n_docs",
        "total_chars",
        qround(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("share"),
    )


def containment_pairs(
    df: DataFrame,
    n: int = 5,
    tau: float = 0.5,
    max_gram_docs: int = 64,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Asymmetric containment dedup: directed pairs (doc_a, doc_b) where at
    least ``tau`` of doc_a's distinct word n-grams also appear in doc_b —
    the partial-copy detector (quotes, wrapped articles, boilerplate-padded
    rewraps) that symmetric Jaccard near-dup misses: a short doc fully
    embedded in a long one has low Jaccard but containment 1.0.

    (doc_a, doc_b, n_grams_a, n_common, containment), containment =
    n_common / n_grams_a rounded to 6 dp, doc_a != doc_b, directed (both
    orientations can appear).

    Scale: the shared-gram self-join is capped by gram document frequency —
    grams appearing in more than ``max_gram_docs`` docs are dropped from
    BOTH the candidate join and the denominator (stop-grams carry no
    containment signal; the same degenerate-hub policy as the LSH band cap
    and the co-occurrence group cap), bounding per-gram fan-out at cap^2
    and keeping candidate volume linear in corpus gram count.  One
    checkpointed capped-gram table feeds the sizes, both join sides, and
    the pair count."""
    g = shingles(df, n=n, text=text, id_col=id_col)
    rare = (
        g.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_gram_docs)
        .select("tok")
    )
    gg = g.join(rare, "tok").localCheckpoint(eager=True)  # 3 consumers
    sizes = gg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams_a"))
    pairs = (
        gg.select(F.col("doc_id").alias("doc_a"), "tok")
        .join(gg.select(F.col("doc_id").alias("doc_b"), "tok"), "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .filter(F.col("n_common") >= F.lit(tau) * F.col("n_grams_a"))
        .select(
            "doc_a",
            "doc_b",
            "n_grams_a",
            "n_common",
            qround(F.col("n_common") / F.col("n_grams_a"), 6).alias("containment"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str = "n_chars",
    group_col: str = "source",
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): per group, the k docs with the largest ln(u)/w keys,
    where u is a uniform derived from the portable poly_hash of the doc id
    and w the sampling weight — here doc length, the token-budget-aware
    mixing sampler (long docs proportionally likelier, every doc possible).

    (grp, doc_id, w, samp_key, rank).  Deterministic BY CONSTRUCTION: the
    "randomness" is poly_hash(id) — the same doc draws the same u on every
    run, every cluster size, and in the SQL oracle — so the sample is
    reproducible and resume-safe with no seed plumbing or materialized
    assignment table.  Scale: key assignment is a pure projection; the
    top-k is one window per group (partial top-k under AQE), never a
    global sort."""
    m = 1 << 20
    u = (
        F.pmod(poly_hash(F.col(id_col).cast("string")), F.lit(m)) + 1
    ).cast("double") / float(m + 1)
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.log(u) / w
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        w.alias("w"),
        key.alias("_key"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                F.col("_key").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "grp",
        "doc_id",
        F.col("w").cast("long").alias("w"),
        F.round("_key", 9).alias("samp_key"),
        "rank",
    )


def vocab_growth(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1024,
) -> DataFrame:
    """Vocabulary-growth curve (Heaps' law): per doc in id order, how many
    tokens appear for the FIRST time in that doc and the cumulative
    vocabulary size so far — the diminishing-returns read for corpus
    collection (when new data stops adding new vocabulary).

    (doc_id, n_new_tokens, vocab_size).  Scale: "first time" is min(doc_id)
    per token — one partial agg, no sequential scan.  The running total is
    a TWO-LEVEL cumulative sum: docs bucket by id range, the intra-bucket
    prefix sum is a window partitioned by bucket (parallel), and bucket
    offsets come from a window over the bucket AGGREGATE (n_buckets rows =
    corpus_size / bucket_width — the only unpartitioned window in the plan
    runs over that tiny table, never the doc rows; the naive
    Window.orderBy(doc) would move every doc to one partition)."""
    toks = _doc_tokens(df, text, id_col)
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
    news = first.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_new_tokens"))
    docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    nd = (
        docs.join(news, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_new_tokens"), F.lit(0)).cast("long").alias("n_new_tokens"),
            F.floor(F.col("doc_id") / bucket_width).alias("_b"),
        )
        .localCheckpoint(eager=True)  # 2 consumers: bucket sums + final join
    )
    bsums = nd.groupBy("_b").agg(F.sum("n_new_tokens").alias("_bs"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bsums.select(
        "_b", F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias("_off")
    )
    w_intra = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        nd.join(F.broadcast(boff), "_b")
        .select(
            "doc_id",
            "n_new_tokens",
            (F.sum("n_new_tokens").over(w_intra) + F.col("_off"))
            .cast("long")
            .alias("vocab_size"),
        )
    )


def dsir_logratio(
    df: DataFrame,
    target_sources: tuple[str, ...] = ("src0",),
    text: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weight per doc -> (doc_id, n_tokens,
    avg_logratio): the mean per-token log p_target(tok)/p_raw(tok) under
    add-1-smoothed unigram models, where the target distribution is
    estimated from the docs of ``target_sources`` and the raw distribution
    from the whole corpus (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling" — the hashed-n-gram variant at scale
    replaces tok with hash(tok) % B; the test-scale contract keys the
    string so the oracle needs no portable hash).  Docs whose token mix
    resembles the target domain score high; the downstream sampler keeps
    docs with probability proportional to exp(weight).

    Both models smooth over the RAW vocabulary (V = distinct raw tokens),
    so target-unseen tokens get mass 1/(N_t + V) and the ratio is total.

    Scale: two token-keyed partial aggs (raw counts; target counts over the
    filtered stream) + one vocabulary-sized join + one per-doc agg — the
    same shape as unigram_logprob with a second count column.  The two
    scalar totals ride one broadcast row.  Float policy follows
    unigram_logprob: avg-of-ln cannot be decimal-exact; round(,6) with
    summation-order risk ~1e-8/row, accepted."""
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=True)  # 3 consumers: raw, target, per-doc
    )
    raw = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        toks.filter(F.col("source").isin(*target_sources))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    stats = (
        raw.join(tgt, "tok", "left")
        .select("tok", "c_r", F.coalesce("c_t", F.lit(0)).alias("c_t"))
        .localCheckpoint(eager=True)  # 2 consumers: totals row, token join
    )
    totals = stats.agg(
        F.sum("c_r").alias("n_raw"),
        F.sum("c_t").alias("n_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = F.log(
        (F.col("c_t") + 1).cast("double") / (F.col("n_tgt") + F.col("v")).cast("double")
    ) - F.log(
        (F.col("c_r") + 1).cast("double") / (F.col("n_raw") + F.col("v")).cast("double")
    )
    return (
        toks.join(stats, "tok")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # + 0.0 canonicalizes IEEE negative zero (a log-RATIO rounds to
            # -0.0 for raw-typical docs; logprob never hits this)
            (F.round(F.avg(lr), 6) + F.lit(0.0)).alias("avg_logratio"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    lam: float = 0.7,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean bigram log-likelihood per doc under the corpus's own
    interpolated bigram model — the KenLM-shaped quality gate one rung above
    unigram_logprob: p(w2|w1) = lam * c12/c1 + (1-lam) * c2/N, averaged in
    ln over a doc's bigram positions.  Looping or shuffled text keeps a
    plausible unigram profile but collapses under the bigram term.

    (doc_id, n_bigrams, avg_logprob) for docs with >= 2 tokens.  Unseen
    bigrams never occur when the model is fit on the scored corpus itself;
    the (1-lam) unigram interpolation is what keeps the score total when
    the model is FIT ELSEWHERE and shipped as a broadcast table — same
    join shape, frozen counts.

    Scale: ONE tokenization pass feeds both the per-position bigram stream
    and the unigram counts (array-derived, no second corpus scan); the
    bigram/unigram count tables are vocabulary-sized partial aggs joined
    back (planner's choice of broadcast vs shuffle); the two scalars ride
    one broadcast row.  Float policy = unigram_logprob (avg-of-ln,
    round(,6), summation-order risk accepted)."""
    toks_col = F.filter(F.split(F.col(text), " "), lambda x: x != "")
    base = df.select(F.col(id_col).alias("doc_id"), toks_col.alias("ts"))
    pos = (
        base.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at("ts", i).alias("w1"),
                        F.element_at("ts", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .localCheckpoint(eager=True)  # 2 consumers: big counts, scoring join
    )
    uni = (
        base.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # 3 consumers: c1, c2, N
    )
    big = pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n_tot = uni.agg(F.sum("c").alias("n_tok"))
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    p = (
        F.lit(lam) * (F.col("c12").cast("double") / F.col("c1").cast("double"))
        + F.lit(1.0 - lam)
        * (F.col("c2").cast("double") / F.col("n_tok").cast("double"))
    )
    return (
        pos.join(big, ["w1", "w2"])
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )
