"""Span query algebra (ES `span_term` / `span_near` / `span_first` /
`span_or` / `span_not` / `span_within` / `span_containing` /
`span_multi`): pure-numpy
per-document evaluation over token
position lists, shared by both reader tiers' `search_span_df`.

The reference imports rows into Elasticsearch, whose query DSL ships the
span family (the pre-`intervals` proximity algebra, still served by every
ES 2.x-era index the importer feeds — README.md query examples run through
the same search API). The engine-native analogue evaluates a span SPEC —
data, never code — against the decoded position lists of one document and
returns the set of matching spans.

Spec grammar (each node is a single-key dict):

  {"span_term": "token"}                         one analyzed token; a
                                                 multi-token string desugars
                                                 to an ordered slop-0 near
                                                 (caller-side, see
                                                 search_span_df)
  {"span_near": {"clauses": [...],               one span per clause,
                 "slop": n, "in_order": bool}}   total gap <= slop
  {"span_first": {"match": spec, "end": n}}      spans ending at <= n
  {"span_or": {"clauses": [...]}}                union
  {"span_not": {"include": spec,                 include-spans that overlap
                "exclude": spec,                 no exclude-span widened by
                "pre": 0, "post": 0}}            pre/post positions
  {"span_within": {"little": spec,               little-spans enclosed by
                   "big": spec}}                 some big-span
  {"span_containing": {"little": spec,           big-spans enclosing some
                       "big": spec}}             little-span
  {"span_multi": {"match": {prefix|fuzzy|       multi-term query in span
                  wildcard: ...},               position: reader rewrites
                  "max_expansions": 50}}        to span_or pre-algebra

Span sets are kept MINIMAL (no span strictly containing another survives a
combinator — Lucene's spans iterators enforce the same discipline via
their lazily-advancing min-heaps). Minimality is what makes the greedy
ordered-near chain exact: within an antichain sorted by start, ends are
ascending too, so the earliest-starting successor dominates every other
choice for both the immediate gap and all later ones.

Positions are token offsets (0-based); spans are half-open [start, end).

Semantics chosen for oracle-checkability (documented deltas vs Lucene):
  - the algebra is CANONICAL: every combinator consumes and produces
    minimal antichains. Where Lucene's spans iterators also surface
    dominated (wider) spans — which can matter to an enclosing span_not
    or a nested unordered near via the length-credit below — this engine
    does not; for flat specs (leaf span_terms under one combinator, the
    overwhelmingly common shape) the two agree.
  - ordered near requires non-overlapping clause spans in clause order;
    slop counts the summed gaps between consecutive spans (Lucene
    NearSpansOrdered's matchWidth).
  - unordered near: for each candidate start, each clause contributes its
    earliest span starting there-or-later; the window matches when its
    width minus the summed chosen span lengths is <= slop (overlap spends
    no slop). For leaf-term clauses this is exactly the ES intervals
    `unordered` rule.
  - span_not rejects an include span that overlaps any exclude span
    widened by `pre` positions before and `post` after (ES pre/post).
"""

from __future__ import annotations

import numpy as np

_SPAN_KINDS = (
    "span_term", "span_near", "span_first", "span_or", "span_not",
    "span_within", "span_containing", "span_multi", "span_field",
)

_EMPTY = (np.empty(0, np.int64), np.empty(0, np.int64))


def validate_span(spec: dict) -> None:
    """Driver-side shape check; raises ValueError on malformed specs."""
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"span spec must be a single-key dict, got {spec!r}")
    kind, body = next(iter(spec.items()))
    if kind == "span_term":
        if not isinstance(body, str) or not body.strip():
            raise ValueError(f"span_term wants a non-empty string, got {body!r}")
    elif kind == "span_near":
        clauses = body.get("clauses") if isinstance(body, dict) else None
        if not clauses or not isinstance(clauses, list):
            raise ValueError("span_near wants {'clauses': [...], 'slop', 'in_order'}")
        if int(body.get("slop", 0)) < 0:
            raise ValueError("span_near slop must be >= 0")
        for c in clauses:
            validate_span(c)
    elif kind == "span_first":
        if not isinstance(body, dict) or "match" not in body:
            raise ValueError("span_first wants {'match': spec, 'end': n}")
        if int(body.get("end", 0)) < 1:
            raise ValueError("span_first end must be >= 1")
        validate_span(body["match"])
    elif kind == "span_or":
        clauses = body.get("clauses") if isinstance(body, dict) else None
        if not clauses or not isinstance(clauses, list):
            raise ValueError("span_or wants {'clauses': [...]}")
        for c in clauses:
            validate_span(c)
    elif kind == "span_not":
        if not isinstance(body, dict) or "include" not in body or "exclude" not in body:
            raise ValueError("span_not wants {'include': spec, 'exclude': spec}")
        if int(body.get("pre", 0)) < 0 or int(body.get("post", 0)) < 0:
            raise ValueError("span_not pre/post must be >= 0")
        validate_span(body["include"])
        validate_span(body["exclude"])
    elif kind in ("span_within", "span_containing"):
        if not isinstance(body, dict) or "little" not in body or "big" not in body:
            raise ValueError(f"{kind} wants {{'little': spec, 'big': spec}}")
        validate_span(body["little"])
        validate_span(body["big"])
    elif kind == "span_multi":
        # pre-analysis node only: the reader rewrites it to span_term /
        # span_or (SpanRewriteMethod) before the algebra ever sees it
        if not isinstance(body, dict) or not isinstance(body.get("match"), dict):
            raise ValueError(
                "span_multi wants {'match': {prefix|fuzzy|wildcard: ...}}"
            )
    elif kind == "span_field":
        # pre-analysis node only (ES span_field_masking): switches the
        # analyzer's field namespace for its subtree, then vanishes
        if (
            not isinstance(body, dict)
            or not isinstance(body.get("field"), str)
            or not body["field"].strip()
            or not isinstance(body.get("query"), dict)
        ):
            raise ValueError(
                "span_field wants {'field': name, 'query': span spec}"
            )
        validate_span(body["query"])
    else:
        raise ValueError(f"unknown span kind {kind!r} (supported: {_SPAN_KINDS})")


def span_leaf_texts(spec: dict) -> list[str]:
    """Every span_term text in the spec, depth-first, duplicates kept."""
    kind, body = next(iter(spec.items()))
    if kind == "span_term":
        return [body]
    if kind == "span_first":
        return span_leaf_texts(body["match"])
    if kind == "span_not":
        return span_leaf_texts(body["include"]) + span_leaf_texts(body["exclude"])
    if kind in ("span_within", "span_containing"):
        return span_leaf_texts(body["little"]) + span_leaf_texts(body["big"])
    return [t for c in body["clauses"] for t in span_leaf_texts(c)]


def span_scoring_texts(spec: dict) -> list[str]:
    """Leaf texts that RANK: every span_term except those under a
    span_not `exclude` branch (those gate matches away; a doc must not be
    rewarded for containing them)."""
    kind, body = next(iter(spec.items()))
    if kind == "span_term":
        return [body]
    if kind == "span_first":
        return span_scoring_texts(body["match"])
    if kind == "span_not":
        return span_scoring_texts(body["include"])
    if kind in ("span_within", "span_containing"):
        # both branches must exist for a match -> both rank
        return span_scoring_texts(body["little"]) + span_scoring_texts(body["big"])
    return [t for c in body["clauses"] for t in span_scoring_texts(c)]


def prune_spans(starts: np.ndarray, ends: np.ndarray):
    """Minimal antichain: drop duplicates and any span strictly containing
    another. Result sorted by start (ends ascending too)."""
    if len(starts) == 0:
        return _EMPTY
    o = np.lexsort((-ends, starts))  # start asc, end desc
    s, e = starts[o], ends[o]
    min_after = np.empty_like(e)
    if len(e) > 1:
        min_after[:-1] = np.minimum.accumulate(e[::-1])[::-1][1:]
    min_after[-1] = np.iinfo(np.int64).max
    keep = e < min_after
    return s[keep], e[keep]


def _near_ordered(clause_spans: list[tuple], slop: int):
    """Chains one span per clause, in order, non-overlapping, greedy
    earliest-successor (exact on minimal antichains); emits chains whose
    summed inter-span gaps are <= slop."""
    cur_s, cur_e = clause_spans[0]
    gaps = np.zeros(len(cur_s), np.int64)
    for s, e in clause_spans[1:]:
        idx = np.searchsorted(s, cur_e, side="left")
        ok = idx < len(s)
        if not ok.any():
            return _EMPTY
        cur_s, cur_e, gaps, idx = cur_s[ok], cur_e[ok], gaps[ok], idx[ok]
        gaps = gaps + (s[idx] - cur_e)
        cur_e = e[idx]
    keep = gaps <= slop
    return prune_spans(cur_s[keep], cur_e[keep])


def _near_unordered(clause_spans: list[tuple], slop: int):
    """Deterministic per-start minimal-window rule: for each candidate
    start s (every clause-span start), clause j contributes its EARLIEST
    span starting at >= s (minimal end within an antichain); the window is
    (s, max end) and matches when window width minus the summed chosen
    span lengths is <= slop. For leaf-term clauses (all spans length 1)
    this is EXACTLY the ES intervals `unordered` rule — any matching
    one-span-per-clause combination is dominated by a matching candidate
    window. For nested variable-length clauses the earliest-span choice is
    canonical (see the module docstring's Lucene-delta note)."""
    cands = np.unique(np.concatenate([s for s, _ in clause_spans]))
    win_e = np.full(len(cands), -1, np.int64)
    credit = np.zeros(len(cands), np.int64)
    alive = np.ones(len(cands), bool)
    for s, e in clause_spans:
        idx = np.searchsorted(s, cands, side="left")
        ok = idx < len(s)
        alive &= ok
        idx = np.minimum(idx, len(s) - 1)
        win_e = np.maximum(win_e, e[idx])
        credit = credit + (e[idx] - s[idx])
    keep = alive & ((win_e - cands) - credit <= slop)
    return prune_spans(cands[keep], win_e[keep])


def eval_span(spec: dict, by_term: dict):
    """Evaluate `spec` against one doc's {term: positions ndarray};
    returns (starts, ends) as a minimal antichain sorted by start."""
    kind, body = next(iter(spec.items()))
    if kind == "span_term":
        pos = by_term.get(body)
        if pos is None or len(pos) == 0:
            return _EMPTY
        p = np.sort(np.asarray(pos, np.int64))
        return p, p + 1
    if kind == "span_or":
        parts = [eval_span(c, by_term) for c in body["clauses"]]
        return prune_spans(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    if kind == "span_first":
        s, e = eval_span(body["match"], by_term)
        keep = e <= int(body["end"])
        return s[keep], e[keep]
    if kind == "span_not":
        inc_s, inc_e = eval_span(body["include"], by_term)
        if len(inc_s) == 0:
            return _EMPTY
        exc_s, exc_e = eval_span(body["exclude"], by_term)
        if len(exc_s) == 0:
            return inc_s, inc_e
        pre, post = int(body.get("pre", 0)), int(body.get("post", 0))
        # exclude is an antichain sorted by start -> ends ascending, so the
        # largest end among excludes starting before X is the last one.
        hi = np.searchsorted(exc_s, inc_e + post, side="left")
        overlap = (hi > 0) & (exc_e[np.maximum(hi - 1, 0)] > inc_s - pre)
        keep = ~overlap
        return inc_s[keep], inc_e[keep]
    if kind in ("span_within", "span_containing"):
        lit_s, lit_e = eval_span(body["little"], by_term)
        big_s, big_e = eval_span(body["big"], by_term)
        if len(lit_s) == 0 or len(big_s) == 0:
            return _EMPTY
        if kind == "span_within":
            # keep little spans enclosed by SOME big span. In an antichain
            # sorted by start, ends ascend too, so among big spans with
            # start <= ls the one with the LARGEST end is the last.
            j = np.searchsorted(big_s, lit_s, side="right") - 1
            keep = (j >= 0) & (big_e[np.maximum(j, 0)] >= lit_e)
            return lit_s[keep], lit_e[keep]
        # span_containing: keep big spans containing SOME little span —
        # among little spans with start >= bs the smallest end comes
        # first (ends ascend), so index i is the best witness.
        i = np.searchsorted(lit_s, big_s, side="left")
        keep = (i < len(lit_s)) & (lit_e[np.minimum(i, len(lit_s) - 1)] <= big_e)
        return big_s[keep], big_e[keep]
    # span_near
    clause_spans = [eval_span(c, by_term) for c in body["clauses"]]
    if any(len(s) == 0 for s, _ in clause_spans):
        return _EMPTY
    slop = int(body.get("slop", 0))
    if bool(body.get("in_order", True)):
        return _near_ordered(clause_spans, slop)
    return _near_unordered(clause_spans, slop)


def spans_match(spec: dict, by_term: dict) -> bool:
    """Existence gate: does the doc yield at least one span?"""
    return len(eval_span(spec, by_term)[0]) > 0
