"""Golden reference extractor — slow, single-node, obviously correct.

Independently re-implements the extraction grammar documented in
plume_spark/generator.py using plain Python/pandas: no Spark, no code shared
with the engine (deliberate: this is the "reference extractor" the P/R >= 0.95
gate compares against, the analog of the upstream Joern test-jar oracle in
astcreator/build.sbt:8-11).

Canonicalization here is exact: all-pairs 3-gram Jaccard over distinct norms +
union-find — O(n^2) but n = distinct norms at test scale.
"""

from __future__ import annotations

import re

import pandas as pd

_SUFFIXES = ("corporation", "corp", "inc", "incorporated", "ltd", "llc", "co")
_STRIP = ".,;:!?\"'()[]{}<>«»—–-"
_KEYWORDS = [
    ("works at", "works_at", "person", "org"),
    ("produces", "produces", "org", "artifact"),
    ("visited", "visited", "person", "org"),
    ("uses", "uses", "person", "tool"),
    ("met", "met", "person", "person"),
]
JACCARD_TAU = 0.55


def norm(s: str) -> str:
    s = re.sub(r"[^a-z0-9]+", " ", s.lower())
    s = re.sub(r"\b(" + "|".join(_SUFFIXES) + r")\b", " ", s)
    return re.sub(r"\s+", " ", s).strip()


def mentions_of(text: str) -> list[tuple[str, int, int]]:
    """[(surface, start, end)] — maximal capitalized-token runs."""
    spans = []
    for m in re.finditer(r"\S+", text):
        core = m.group(0).strip(_STRIP)
        if core and core[0].isupper() and core[0].isascii():
            off = m.group(0).find(core)
            spans.append((m.start() + off, m.start() + off + len(core), m.start()))
    # group maximal runs of consecutive tokens
    all_toks = [m.start() for m in re.finditer(r"\S+", text)]
    tok_index = {s: i for i, s in enumerate(all_toks)}
    runs, cur = [], []
    prev = -2
    for s, e, raw_start in spans:
        i = tok_index[raw_start]
        if i == prev + 1 and cur:
            cur.append((s, e))
        else:
            if cur:
                runs.append(cur)
            cur = [(s, e)]
        prev = i
    if cur:
        runs.append(cur)
    return [(text[r[0][0] : r[-1][1]], r[0][0], r[-1][1]) for r in runs]


def relations_of(text: str) -> list[tuple[str, str, str, str, str]]:
    """[(subj_surface, pred, obj_surface, subj_kind, obj_kind)]"""
    ms = mentions_of(text)
    out = []
    for (s1, a1, b1), (s2, a2, b2) in zip(ms, ms[1:]):
        between = text[b1:a2].lower()
        hit = None
        for kw, pred, sk, ok in _KEYWORDS:
            p = between.find(kw)
            if p >= 0 and (hit is None or p < hit[0]):
                hit = (p, pred, sk, ok)
        if hit:
            out.append((s1, hit[1], s2, hit[2], hit[3]))
        else:
            out.append((s1, "mentions", s2, "entity", "entity"))
    return out


def _grams(s: str) -> set:
    if len(s) < 3:
        s = s + "\x00" * (3 - len(s))
    return {s[i : i + 3] for i in range(len(s) - 2)}


def canonical_map(norms: set[str], tau: float = JACCARD_TAU) -> dict[str, str]:
    """norm -> canonical norm, exact all-pairs Jaccard + union-find."""
    items = sorted(norms)
    parent = {n: n for n in items}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    g = {n: _grams(n) for n in items}
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            a, b = items[i], items[j]
            inter = len(g[a] & g[b])
            if inter and inter / len(g[a] | g[b]) >= tau:
                union(a, b)
    # canonical = min norm in component
    comp: dict[str, list[str]] = {}
    for n in items:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        c = min(members)
        for m in members:
            out[m] = c
    return out


def expected_triples(transcripts: pd.DataFrame, tau: float = JACCARD_TAU) -> pd.DataFrame:
    """Golden (conv_id, turn_idx, subj_name, pred, obj_name) rows."""
    valid = transcripts.dropna(subset=["conv_id", "turn_idx", "text"])
    valid = valid[valid["text"].str.len() > 0]
    raw = []
    all_norms: set[str] = set()
    for conv_id, turn_idx, text in zip(valid["conv_id"], valid["turn_idx"], valid["text"]):
        for s1, pred, s2, _sk, _ok in relations_of(text):
            n1, n2 = norm(s1), norm(s2)
            raw.append((conv_id, int(turn_idx), n1, pred, n2))
            all_norms.add(n1)
            all_norms.add(n2)
        for s, _a, _b in mentions_of(text):
            all_norms.add(norm(s))
    cmap = canonical_map(all_norms, tau)
    rows = [
        (c, t, cmap[n1], p, cmap[n2]) for (c, t, n1, p, n2) in raw
    ]
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "subj_name", "pred", "obj_name"]
    ).drop_duplicates()


def precision_recall(got: pd.DataFrame, want: pd.DataFrame) -> tuple[float, float]:
    key = ["conv_id", "turn_idx", "subj_name", "pred", "obj_name"]
    g = set(map(tuple, got[key].drop_duplicates().itertuples(index=False)))
    w = set(map(tuple, want[key].drop_duplicates().itertuples(index=False)))
    if not g or not w:
        return (0.0, 0.0)
    inter = len(g & w)
    return inter / len(g), inter / len(w)
