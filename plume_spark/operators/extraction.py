"""Per-conversation mention + relation extraction.

Reference analog: the abstract pass ``generateParts()`` + ``runOnPart(builder,
part)`` (astcreator/.../PlumeForkJoinParallelCpgPass.scala:21,30) with the one
concrete pass AstCreationPass.runOnPart (astcreator/.../AstCreationPass.scala:35-51):
one independent part in, many nodes/edges out, exceptions tolerated per-part
(AstCreationPass.scala:46-50).

Spark recast: ``applyInPandas`` over ``groupBy("conv_id")`` — one pandas frame
per conversation, sorted by ``turn_idx`` inside the UDF (the stable turn
ordering the window materializes), emitting a single change-log frame that is
then split per record kind (the 3-way ``collect { case ... }`` split of
Neo4jDriver.scala:198-212).  All Python executes on Arrow batches; nothing in
this module runs per-row on the JVM side.

At 100 TB the groupBy(conv_id) shuffle is avoided by storing transcripts
bucketed/partitioned by hash(conv_id) (Iceberg ``bucket(N, conv_id)``) so
grouping is shuffle-free; in the sandbox the shuffle is explicit.

The extraction grammar is the contract documented in plume_spark/generator.py;
tests/oracle.py re-implements it independently in plain pandas as the golden
reference.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plume_spark.functions.textnorm import norm_py

# predicate keyword -> (pred, subj_kind, obj_kind); multi-word first
KEYWORDS = [
    ("works at", "works_at", "person", "org"),
    ("produces", "produces", "org", "artifact"),
    ("visited", "visited", "person", "org"),
    ("uses", "uses", "person", "tool"),
    ("met", "met", "person", "person"),
]
FALLBACK_PRED = ("mentions", "entity", "entity")

_TOKEN_RE = re.compile(r"\S+")
_STRIP = ".,;:!?\"'()[]{}<>«»—–-"


class Mention(NamedTuple):
    surface: str
    start: int
    end: int


def find_mentions(text: str) -> list[Mention]:
    """Maximal runs of tokens whose stripped form starts with an uppercase
    ASCII letter.  Pure function — shared contract with tests/oracle.py."""
    mentions: list[Mention] = []
    run: list[tuple[int, int]] = []
    prev_idx = -2
    for idx, m in enumerate(_TOKEN_RE.finditer(text)):
        raw = m.group(0)
        core = raw.strip(_STRIP)
        if core and "A" <= core[0] <= "Z":
            off = raw.find(core)
            span = (m.start() + off, m.start() + off + len(core))
            if prev_idx == idx - 1 and run:
                run.append(span)
            else:
                if run:
                    mentions.append(Mention(text[run[0][0] : run[-1][1]], run[0][0], run[-1][1]))
                run = [span]
            prev_idx = idx
    if run:
        mentions.append(Mention(text[run[0][0] : run[-1][1]], run[0][0], run[-1][1]))
    return mentions


def find_relations(text: str, ms: list[Mention] | None = None) -> list[dict]:
    """Relations between consecutive mention pairs; FIRST keyword between the
    two spans wins, else the 'mentions' fallback.  Returns dicts with mention
    spans, pred, endpoint kinds.  ``ms`` lets callers that already ran
    find_mentions skip recomputing it."""
    if ms is None:
        ms = find_mentions(text)
    out = []
    for left, right in zip(ms, ms[1:]):
        between = text[left.end : right.start].lower()
        best = None  # (pos, pred, sk, ok)
        for kw, pred, sk, ok in KEYWORDS:
            p = between.find(kw)
            if p >= 0 and (best is None or p < best[0]):
                best = (p, pred, sk, ok)
        pred, sk, ok = (best[1], best[2], best[3]) if best else FALLBACK_PRED
        out.append({"subj": left, "pred": pred, "obj": right, "subj_kind": sk, "obj_kind": ok})
    return out


def mention_kinds(text: str, relations: list[dict] | None = None) -> dict[int, str]:
    """span_start -> kind, from the first relation each mention joins."""
    kinds: dict[int, str] = {}
    for r in find_relations(text) if relations is None else relations:
        kinds.setdefault(r["subj"].start, r["subj_kind"])
        kinds.setdefault(r["obj"].start, r["obj_kind"])
    return kinds


# change-log schema: one frame per pass, split per kind downstream (U2)
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("rec_kind", T.StringType()),  # 'mention' | 'triple'
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("mention_id", T.LongType()),
        T.StructField("surface", T.StringType()),
        T.StructField("norm", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("span_start", T.IntegerType()),
        T.StructField("span_end", T.IntegerType()),
        T.StructField("arg_index", T.IntegerType()),  # W2: positional rank in turn
        T.StructField("pred", T.StringType()),
        T.StructField("subj_norm", T.StringType()),
        T.StructField("subj_kind", T.StringType()),
        T.StructField("obj_norm", T.StringType()),
        T.StructField("obj_kind", T.StringType()),
        T.StructField("src_mention", T.StringType()),
        T.StructField("obj_mention", T.StringType()),
    ]
)

# UDF-side schema: mention_id is attached JVM-side afterwards (vectorized
# xxhash64 over the natural key) — a per-mention hash loop in Python was
# measured as a material slice of extraction CPU.
_UDF_SCHEMA = T.StructType([f for f in CHANGELOG_SCHEMA.fields if f.name != "mention_id"])

_MENTION_COLS = ("surface", "norm", "kind", "span_start", "span_end", "arg_index")
_TRIPLE_COLS = (
    "pred", "subj_norm", "subj_kind", "obj_norm", "obj_kind",
    "src_mention", "obj_mention",
)


# one regex that matches a MAXIMAL capitalized-token run directly: a token
# qualifies iff its first non-STRIP character is an ASCII uppercase letter
# (exactly find_mentions' per-token strip test), runs extend across single
# whitespace gaps (token-index adjacency == whitespace-only separation, since
# tokens are \S+), and a non-qualifying token breaks the run because it
# cannot match the token alternative.  The per-token Python loop becomes one
# C-level scan.
_RUN_TOKEN = r"[.,;:!?\"'()\[\]{}<>«»—–-]*[A-Z]\S*"
_RUN_RE = re.compile(rf"(?:^|(?<=\s))(?:{_RUN_TOKEN})(?:\s+(?:{_RUN_TOKEN}))*")
# separator between turns in the batch mega-string: the \x00 token's first
# non-STRIP char is \x00 (not A-Z), so no run can cross a turn boundary
_SEP = "\n\x00\n"


# per-worker one-time warning latch: a systematic vec-kernel failure would
# otherwise silently run every batch on the ~3x-slower loop kernel with green
# tests and no signal (round-3 ADVICE).
_FALLBACK_WARNED = False


def _extract_part(
    pdf: pd.DataFrame, on_fallback=None, _poison: bool = False
) -> pd.DataFrame:
    """Batch extraction with the vectorized kernel; any unexpected failure
    inside it degrades the batch to the retained loop kernel (identical
    semantics, per-turn exception tolerance) instead of failing the Arrow
    batch — the whole-batch analog of runOnPart's per-part tolerance.

    The degradation is OBSERVABLE, not silent: the first fallback on each
    worker prints one stderr warning with the causing exception, and
    ``on_fallback`` (an Accumulator.add bound by extract_changelog) counts
    fallen-back batches so build_graph can surface the perf cliff in its
    stats.  ``_poison`` is a test-only hook that forces the failure path
    (closure-serialized, so it reaches real executors — monkeypatching the
    driver module does not)."""
    global _FALLBACK_WARNED
    try:
        if _poison:
            raise RuntimeError("test-poisoned vectorized kernel")
        return _extract_part_vec(pdf)
    except Exception as exc:  # noqa: BLE001 — deliberate batch tolerance
        if not _FALLBACK_WARNED:
            _FALLBACK_WARNED = True
            import sys
            import traceback

            print(
                "plume_spark WARNING: vectorized extraction kernel failed; "
                f"batch degraded to the loop kernel (~3x slower): {exc!r}\n"
                + "".join(traceback.format_exception(exc)[-3:]),
                file=sys.stderr,
            )
        if on_fallback is not None:
            on_fallback(1)
        return _extract_part_loop(pdf)


def _extract_part_vec(pdf: pd.DataFrame) -> pd.DataFrame:
    """runOnPart analog: one part (a hash-bucket of whole conversations) in,
    its change log out.  Rows are sorted (conv_id, turn_idx) so each
    conversation is contiguous in stable turn order (W1).

    VECTORIZED batch kernel: all turns of the batch are joined into one
    mega-string (separator \\x00 cannot start or extend a run), mention runs
    are found by ONE compiled-regex scan (C-level, replacing the per-token
    Python loop), matches map back to turns via searchsorted over the turn
    offsets, and every output column is assembled by numpy array arithmetic.
    The per-token iteration + per-record append loop this replaces was ~2/3
    of kernel CPU (kernel micro-bench 0.97 s -> 0.31 s per 20k turns, 3.2x);
    extraction was 94% of flagship wall time, and the k=192 phase profile
    moved 116 s -> 63 s on 8 cores (232k -> 400k triples/s end-to-end).
    Semantics are EXACTLY find_mentions/find_relations per turn: the loop
    kernel is retained below (_extract_part_loop) as the reference, and
    test_vectorized_kernel_equals_loop pins equality on adversarial text.
    ``norm_py`` is memoized per part via a distinct-surface map: surface
    forms repeat heavily in real transcripts.  Malformed rows (non-string /
    empty text, non-numeric turn_idx) are skipped, not fatal — the same
    per-part tolerance as the reference (AstCreationPass.scala:46-50)."""
    import numpy as np

    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    names = [f.name for f in _UDF_SCHEMA.fields]
    texts_raw = pdf["text"]
    # non-numeric AND non-finite turn_idx rows are skipped (an unguarded
    # int64 cast would turn inf into INT64_MIN garbage); fractional floats
    # truncate exactly like the loop kernel's int()
    ti_f = pd.to_numeric(pdf["turn_idx"], errors="coerce").to_numpy(
        dtype="float64", na_value=float("nan")
    )
    ok = texts_raw.map(
        lambda t: isinstance(t, str) and bool(t)
    ).to_numpy() & np.isfinite(ti_f)
    if not ok.any():
        return pd.DataFrame({n: [] for n in names})
    texts = texts_raw.to_numpy()[ok]
    convs = pdf["conv_id"].to_numpy()[ok]
    tis = ti_f[ok].astype("int64")

    mega = _SEP.join(texts)
    # start offset of each turn's text inside the mega-string
    lens = np.fromiter((len(t) for t in texts), dtype="int64", count=len(texts))
    starts = np.zeros(len(texts), dtype="int64")
    np.cumsum(lens[:-1] + len(_SEP), out=starts[1:])

    runs = list(_RUN_RE.finditer(mega))
    if not runs:
        return pd.DataFrame({n: [] for n in names})
    n_m = len(runs)
    s0 = np.empty(n_m, dtype="int64")
    e0 = np.empty(n_m, dtype="int64")
    surfaces: list[str] = [""] * n_m
    for i, mt in enumerate(runs):
        g = mt.group(0)
        a = mt.start() + (len(g) - len(g.lstrip(_STRIP)))
        b = mt.end() - (len(g) - len(g.rstrip(_STRIP)))
        s0[i] = a
        e0[i] = b
        surfaces[i] = mega[a:b]
    turn_of = np.searchsorted(starts, s0, side="right") - 1
    span_start = s0 - starts[turn_of]
    span_end = e0 - starts[turn_of]
    # arg_index: running count within each turn (turn_of is non-decreasing)
    first_of_turn = np.empty(n_m, dtype=bool)
    first_of_turn[0] = True
    first_of_turn[1:] = turn_of[1:] != turn_of[:-1]
    run_start_pos = np.maximum.accumulate(np.where(first_of_turn, np.arange(n_m), 0))
    arg_index = np.arange(n_m) - run_start_pos

    # relations: consecutive mention pairs within one turn; FIRST keyword in
    # the between-text wins, else the fallback.  Deliberately a tight Python
    # loop: a pandas .str.lower() + five .str.find() passes over the same
    # array were MEASURED SLOWER (1.9 s vs 1.5 s per 100k turns) — per-call
    # overhead and re-allocation dominate on short between-strings, and
    # relations are ~1 per turn, not per token.
    pair = np.nonzero(turn_of[:-1] == turn_of[1:])[0]
    preds: list[str] = [""] * len(pair)
    sks: list[str] = [""] * len(pair)
    oks: list[str] = [""] * len(pair)
    for j, i in enumerate(pair):
        between = mega[e0[i] : s0[i + 1]].lower()
        best = None
        for kw, pred, sk, okk in KEYWORDS:
            p = between.find(kw)
            if p >= 0 and (best is None or p < best[0]):
                best = (p, pred, sk, okk)
        preds[j], sks[j], oks[j] = (
            (best[1], best[2], best[3]) if best else FALLBACK_PRED
        )
    # mention kind — mention_kinds' setdefault order means: the obj-kind of
    # the PRECEDING relation wins over the subj-kind of the following one
    is_pair = np.zeros(n_m, dtype=bool)
    is_pair[pair] = True
    sk_arr = np.empty(n_m, dtype=object)
    ok_arr = np.empty(n_m, dtype=object)
    sk_arr[:] = "entity"
    ok_arr[:] = "entity"
    if len(pair):
        sk_arr[pair] = sks
        ok_arr[pair + 1] = oks
    prev_is_pair = np.zeros(n_m, dtype=bool)
    prev_is_pair[1:] = is_pair[:-1]
    kinds = np.where(prev_is_pair, ok_arr, np.where(is_pair, sk_arr, "entity"))

    norm_map = {s: norm_py(s) for s in set(surfaces)}
    surf_a = np.array(surfaces, dtype=object)
    norm_a = np.array([norm_map[s] for s in surfaces], dtype=object)

    conv_m = convs[turn_of]
    ti_m = tis[turn_of]
    n_t = len(pair)
    n = n_m + n_t

    # ONE output frame assembled column-by-column from plain numpy arrays —
    # no pd.concat (whose extension-dtype NA reconciliation was measured at
    # >60% of kernel time) and no per-row Python in sight.  Mention rows
    # occupy [0, n_m), triple rows [n_m, n); columns that only one record
    # kind carries stay None on the other side, exactly as the loop kernel.
    def _both(m_vals, t_vals):
        col = np.empty(n, dtype=object)
        col[:n_m] = m_vals
        col[n_m:] = t_vals
        return col

    rec_kind = np.empty(n, dtype=object)
    rec_kind[:n_m] = "mention"
    rec_kind[n_m:] = "triple"
    cols = {
        "rec_kind": rec_kind,
        "conv_id": _both(conv_m, conv_m[pair]),
        "turn_idx": _both(ti_m, ti_m[pair]),
        "surface": _both(surf_a, None),
        "norm": _both(norm_a, None),
        "kind": _both(kinds, None),
        "span_start": _both(span_start, None),
        "span_end": _both(span_end, None),
        "arg_index": _both(arg_index, None),
        "pred": _both(None, preds),
        "subj_norm": _both(None, norm_a[pair]),
        "subj_kind": _both(None, sks),
        "obj_norm": _both(None, norm_a[pair + 1]),
        "obj_kind": _both(None, oks),
        "src_mention": _both(None, surf_a[pair]),
        "obj_mention": _both(None, surf_a[pair + 1]),
    }
    return pd.DataFrame({name: cols[name] for name in names})


def _extract_part_loop(pdf: pd.DataFrame) -> pd.DataFrame:
    """The original per-turn loop kernel, retained VERBATIM as the reference
    implementation for test_vectorized_kernel_equals_loop (the vectorized
    kernel above must emit the identical record set).

    COLUMNAR accumulation: values append to per-column lists, never to
    per-row dicts — at millions of records the dict-per-row form allocates
    ~20x more Python objects, and that allocation pressure was measured to
    destroy multi-worker scaling (workers' CPU time inflates under shared
    memory-bandwidth contention).  ``norm_py`` is memoized per part: surface
    forms repeat heavily in real transcripts."""
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    mcols: dict[str, list] = {c: [] for c in ("conv_id", "turn_idx", *_MENTION_COLS)}
    tcols: dict[str, list] = {c: [] for c in ("conv_id", "turn_idx", *_TRIPLE_COLS)}
    norm_cache: dict[str, str] = {}

    def _norm(s: str) -> str:
        v = norm_cache.get(s)
        if v is None:
            v = norm_cache[s] = norm_py(s)
        return v

    for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
        try:
            if not isinstance(text, str) or not text:
                continue
            # one mention scan + one relation scan per turn, shared by both
            # record kinds (find_mentions is the expensive regex pass)
            ms = find_mentions(text)
            rels = find_relations(text, ms)
            kinds = mention_kinds(text, rels)
            ti = int(turn_idx)
            for ai, m in enumerate(ms):
                mcols["conv_id"].append(conv_id)
                mcols["turn_idx"].append(ti)
                mcols["surface"].append(m.surface)
                mcols["norm"].append(_norm(m.surface))
                mcols["kind"].append(kinds.get(m.start, "entity"))
                mcols["span_start"].append(m.start)
                mcols["span_end"].append(m.end)
                mcols["arg_index"].append(ai)  # W2 ARGUMENT_INDEX analog
            for r in rels:
                tcols["conv_id"].append(conv_id)
                tcols["turn_idx"].append(ti)
                tcols["pred"].append(r["pred"])
                tcols["subj_norm"].append(_norm(r["subj"].surface))
                tcols["subj_kind"].append(r["subj_kind"])
                tcols["obj_norm"].append(_norm(r["obj"].surface))
                tcols["obj_kind"].append(r["obj_kind"])
                tcols["src_mention"].append(r["subj"].surface)
                tcols["obj_mention"].append(r["obj"].surface)
        except Exception:
            continue  # tolerate a bad turn, keep the part going

    n_m, n_t = len(mcols["conv_id"]), len(tcols["conv_id"])
    names = [f.name for f in _UDF_SCHEMA.fields]
    mdf = pd.DataFrame(
        {
            name: (
                ["mention"] * n_m if name == "rec_kind"
                else mcols[name] if name in mcols
                else [None] * n_m
            )
            for name in names
        }
    )
    tdf = pd.DataFrame(
        {
            name: (
                ["triple"] * n_t if name == "rec_kind"
                else tcols[name] if name in tcols
                else [None] * n_t
            )
            for name in names
        }
    )
    return pd.concat([mdf, tdf], ignore_index=True)


def split_valid_rejects(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Error-path tolerance (P8): malformed rows are diverted, not fatal."""
    bad = (
        F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | F.col("text").isNull()
        | (F.length("text") == 0)
    )
    return transcripts.filter(~bad), transcripts.filter(bad)


def _extract_batches(batches, on_fallback=None, _poison: bool = False):
    """mapInPandas adapter: the same per-part extraction kernel applied to
    each incoming Arrow batch in place (no shuffle — see extract_changelog)."""
    for pdf in batches:
        out = _extract_part(pdf, on_fallback=on_fallback, _poison=_poison)
        if len(out):
            yield out


def _extract_batches_compact(batches, on_fallback=None, _poison: bool = False):
    """mapInPandas adapter with per-batch mention pre-aggregation: mention
    records collapse to the batch's DISTINCT (norm, kind) pairs (a map-side
    partial of the global per-norm reduction build_entities performs), triple
    records pass through untouched.

    Entity linking is a pure function of the distinct-norm dictionary and the
    kind hint is a global min over (norm, kind) pairs, so collapsing
    duplicates inside a batch changes NOTHING downstream — it just stops
    shipping the same surface form thousands of times through Arrow and the
    cache (mention occurrences outnumber distinct norms ~3000:1 at bench
    scale; the mention-stream scan was measured memory-bandwidth-bound, i.e.
    the one cost MORE cores cannot buy down)."""
    for pdf in batches:
        out = _extract_part(pdf, on_fallback=on_fallback, _poison=_poison)
        if not len(out):
            continue
        is_m = out["rec_kind"] == "mention"
        m = out[is_m]
        if len(m):
            m = m.drop_duplicates(subset=["norm", "kind"])
            # identity/position fields are occurrence-level — null them so a
            # compact record can never be mistaken for a real occurrence
            m = m.assign(
                conv_id=None, turn_idx=None, surface=None,
                span_start=None, span_end=None, arg_index=None,
            )
        yield pd.concat([m, out[~is_m]], ignore_index=True)


def extract_changelog(
    transcripts: DataFrame,
    n_parts: int | None = None,
    colocate: bool = False,
    compact_mentions: bool = False,
    fallback_acc=None,
    _poison: bool = False,
) -> DataFrame:
    """Parallel extraction pass: valid rows -> change-log DataFrame.

    The ForkJoin ``parts.parallel().collect(supplier, accumulator, combiner)``
    fold (PlumeForkJoinParallelCpgPass.scala:47-70) maps to a pandas/Arrow
    UDF pass — Spark's task parallelism is the pool, the implicit union of
    per-batch outputs is the associative ``absorb``.

    Physical strategy (the extraction grammar is strictly turn-local, so the
    output row set is identical either way):

    * default — ``mapInPandas`` over the input's EXISTING partitioning: zero
      shuffle.  The reference's runOnPart needs whole-compilation-unit parts;
      a per-turn grammar does not, and shuffling the full transcript text
      (by far the widest column) just to re-bucket it was measured as the
      dominant non-scaling cost at high core counts — shuffle write+read of
      the text stream is disk/memory-bandwidth-bound, which caps N-vs-4N
      scaling well below the CPU-bound extraction itself.
    * ``colocate=True`` — the runOnPart-faithful layout: parts are
      hash-buckets of WHOLE conversations (pmod(xxhash64(conv_id), n_parts),
      fixed 256 so work units are identical at every cluster size),
      conversations contiguous in stable turn order within a part.  Use when
      a future grammar needs cross-turn context, or on a cluster where the
      storage bucketing makes the groupBy shuffle-free anyway.

    ``compact_mentions`` (default-path only): mention records are collapsed
    to per-batch distinct (norm, kind) pairs — sufficient (and ~3000x
    lighter at bench scale) for entity linking, which is a pure function of
    the distinct-norm dictionary; occurrence-level fields are nulled.  Use
    for linking-only pipelines; the store/staging path keeps full records."""
    valid, _ = split_valid_rejects(transcripts)
    # fallback counting: Accumulator.add is closure-serialized into the UDF,
    # so counts flow back from real executors with task results; read
    # fallback_acc.value after an action to observe the perf cliff.
    on_fb = fallback_acc.add if fallback_acc is not None else None
    if colocate:
        p = n_parts or 256
        extracted = (
            valid.select("conv_id", "turn_idx", "text")
            .withColumn("_part", F.pmod(F.xxhash64("conv_id"), F.lit(p)).cast("int"))
            .groupBy("_part")
            .applyInPandas(
                lambda pdf: _extract_part(pdf, on_fallback=on_fb, _poison=_poison),
                schema=_UDF_SCHEMA,
            )
        )
    else:
        base = _extract_batches_compact if compact_mentions else _extract_batches
        fn = lambda batches: base(batches, on_fallback=on_fb, _poison=_poison)  # noqa: E731
        extracted = valid.select("conv_id", "turn_idx", "text").mapInPandas(
            fn, schema=_UDF_SCHEMA
        )
    # stable mention identity, JVM-side and vectorized (the IDriver.scala:91-98
    # identity contract): deterministic over the natural key, so resume runs
    # regenerate identical ids.
    mention_id = F.when(
        F.col("rec_kind") == "mention",
        F.xxhash64("conv_id", "turn_idx", "span_start"),
    )
    return extracted.withColumn("mention_id", mention_id).select(
        *[f.name for f in CHANGELOG_SCHEMA.fields]
    )


def split_changelog(changelog: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-kind partition of the change log (U2; Neo4jDriver.scala:198-212)."""
    mentions = changelog.filter(F.col("rec_kind") == "mention").select(
        "conv_id", "turn_idx", "mention_id", "surface", "norm", "kind",
        "span_start", "span_end", "arg_index",
    )
    raw_triples = changelog.filter(F.col("rec_kind") == "triple").select(
        "conv_id", "turn_idx", "subj_norm", "subj_kind", "pred",
        "obj_norm", "obj_kind", "src_mention", "obj_mention",
    )
    return mentions, raw_triples
