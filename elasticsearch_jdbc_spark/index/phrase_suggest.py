"""Phrase suggester (the ES `_search` suggest `phrase` block): whole-query
"did you mean" ranked by a corpus language model, not per-token edit
distance alone.

ES builds the LM from a shingle sub-field's term statistics and scores
candidate phrases with StupidBackoff (default, discount 0.4) or Laplace
smoothing, multiplied by a candidate-generator error likelihood. The
engine-native contract (pinned so the DuckDB oracle can replay it
exactly):

  candidates per position i (token w_i):
      dictionary terms sharing the first `prefix_length` chars, length
      within +-max_edits, Levenshtein distance 0..max_edits (distance 0
      keeps the original word — real-word errors stay rankable), ranked
      (distance asc, cf desc, term asc), top `candidates_per_token`
  phrase score, log space:
      log P_uni(c_1)
        + sum_{i>1} [ c2(c_{i-1}, c_i) > 0 ? log(c2/cf(c_{i-1}))
                      : log(backoff * P_uni(c_i)) ]        (StupidBackoff)
        + (total edit distance) * log(error_discount)      (error model)
      with P_uni(w) = (cf(w) + alpha) / (N + alpha * V)    (Laplace floor,
      so an unseen unigram never yields -inf)
  output: top `size` phrases by (score desc, text asc), the verbatim
  input phrase excluded (ES returns corrections, not the input)

Statistics substrate:
  cf / V / N    the term dictionary's total-term-frequency column, its
                row count, and sum(dl) (manifest n_docs * avgdl)
  c2            bigram counts materialized once by `build_ngram_stats`
                from the tokenized checkpoint (adjacent pairs inside each
                doc's token array — content is never re-read or
                re-tokenized), written range-sorted by (w1, w2) so
                query-time lookups are pyarrow point-range reads, the
                same columnar-FST trick as the term dictionary

On a fields-indexed corpus tokens are namespaced "field\x1ftoken" in both
the dictionary and the checkpoint, and a field's tokens are contiguous in
the array — so per-field LMs fall out of prefix filtering: pass `field=`.

The candidate beam is the cross product of per-position shortlists
(<= candidates_per_token^n with n = token count, capped) — constant-sized
driver work; everything that scales with the corpus (dictionary scan,
bigram lookups) is a pruned columnar read or a Spark job.
"""

from __future__ import annotations

import itertools
import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import LocalFS

NGRAMS_MANIFEST = "ngrams.json"
MAX_TOKENS = 5


def build_ngram_stats(
    spark: SparkSession,
    index_dir: str,
    partitions: int | None = None,
    fs=None,
) -> dict:
    """Materialize bigram counts (w1, w2, c2) from the tokenized
    checkpoint: posexplode each doc's token array, self-pair each token
    with its successor (a shift join on the ordinal — one shuffle on
    (doc, ordinal) is avoided by doing the pairing inside the array with
    a transform, no explode-join), then ONE map-side-combinable groupBy.
    Output is range-sorted by (w1, w2) for point-range query reads."""
    fs = fs or LocalFS()
    tok = spark.read.parquet(os.path.join(index_dir, "tokenized")).select("tokens")
    pairs = tok.select(
        F.explode(
            F.expr(
                "transform(slice(tokens, 1, greatest(size(tokens) - 1, 0)),"
                " (t, i) -> struct(t as w1, tokens[i + 1] as w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    n_parts = partitions or max(1, counts.rdd.getNumPartitions() // 4)
    out_dir = os.path.join(index_dir, "ngrams")
    (
        counts.repartitionByRange(n_parts, "w1", "w2")
        .sortWithinPartitions("w1", "w2")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    import pyarrow.parquet as pq

    n_bigrams = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in fs.listdir(out_dir)
        if f.endswith(".parquet")
    )
    manifest = {"n_distinct_bigrams": int(n_bigrams)}
    fs.write_text(os.path.join(index_dir, NGRAMS_MANIFEST), json.dumps(manifest))
    return manifest


def _substrate(reader) -> dict:
    """Resolve the statistics substrate for either reader tier.

    Base IndexReader: its terms/ngrams dirs, manifest stats. Incremental:
    every live segment's dirs, cf/c2 SUMMED across segments; N and V are
    the segment-summed totals (masked docs still count — the Lucene
    deleted-docs stats rule the df/cf surfaces already follow; V sums
    per-segment vocabularies, the O(1)-manifest-read approximation of the
    distinct union). Every segment must carry the ngram sidecar —
    apply_incremental builds it for deltas automatically when the base
    has one."""
    fs = reader.fs
    if hasattr(reader, "segments"):  # IncrementalIndexReader
        dirs = [
            os.path.join(reader.index_dir, s) if s else reader.index_dir
            for s in reader.segments
        ]
        missing = [
            d for d in dirs if not fs.exists(os.path.join(d, NGRAMS_MANIFEST))
        ]
        if missing:
            raise ValueError(
                f"no ngram stats on segment(s) {missing} — call "
                "build_ngram_stats on the base before applying deltas "
                "(deltas then build theirs automatically)"
            )
        rs = [reader.readers[s] for s in reader.segments]
        return {
            "terms_dirs": [os.path.join(d, "terms") for d in dirs],
            "ngrams_dirs": [os.path.join(d, "ngrams") for d in dirs],
            "n_tokens": float(sum(r.n_docs * r.avgdl for r in rs)),
            "v": float(sum(r.manifest["n_terms"] for r in rs)),
        }
    if not fs.exists(os.path.join(reader.index_dir, NGRAMS_MANIFEST)):
        raise ValueError(
            "no ngram stats — call build_ngram_stats(spark, index_dir) first"
        )
    return {
        "terms_dirs": [os.path.join(reader.index_dir, "terms")],
        "ngrams_dirs": [os.path.join(reader.index_dir, "ngrams")],
        "n_tokens": float(reader.n_docs) * float(reader.avgdl),
        "v": float(reader.manifest["n_terms"]),
    }


def _candidates(
    reader,
    sub: dict,
    tokens: list[str],
    ns: str,
    max_edits: int,
    prefix_length: int,
    per_token: int,
) -> list[list[tuple[str, int, int]]]:
    """Per-position shortlists [(term, cf, distance), ...] ranked
    (distance asc, cf desc, term asc) — one pyarrow point-range
    dictionary read per position (prefix-pruned on the term-sorted
    parquet; a union dataset over live segments, cf summed), bounded-DP
    distances on the shortlisted window."""
    import pyarrow.dataset as ds

    dset = ds.dataset(
        [ds.dataset(d, format="parquet") for d in sub["terms_dirs"]]
    )
    out: list[list[tuple[str, int, int]]] = []
    for tok in tokens:
        pref = ns + tok[:prefix_length] if prefix_length > 0 else ns
        flt = None
        if pref:
            hi = pref[:-1] + chr(ord(pref[-1]) + 1)
            flt = (ds.field("term") >= pref) & (ds.field("term") < hi)
        t = dset.to_table(filter=flt, columns=["term", "cf"])
        cfs: dict[str, int] = {}
        for term, cf in zip(
            t.column("term").to_pylist(), t.column("cf").to_pylist()
        ):
            if ns and not term.startswith(ns):
                continue
            bare = term[len(ns):]
            if abs(len(bare) - len(tok)) > max_edits:
                continue
            cfs[bare] = cfs.get(bare, 0) + int(cf)
        cands: list[tuple[int, int, str]] = []
        for bare, cf in cfs.items():
            if not reader._lev_within(bare, tok, max_edits):
                continue
            dist = 0 if bare == tok else next(
                d for d in range(1, max_edits + 1)
                if reader._lev_within(bare, tok, d)
            )
            cands.append((dist, -cf, bare))
        cands.sort()
        out.append([(b, -negcf, d) for d, negcf, b in cands[:per_token]])
    return out


def _bigram_counts(
    sub: dict, ns: str, shortlists: list[list[tuple[str, int, int]]]
) -> dict[tuple[str, str], int]:
    """c2 for every candidate pair that can appear adjacent in a beam —
    ONE pyarrow read filtered to the w1 candidate set (each ngrams
    parquet is (w1, w2)-sorted, so the isin prunes row-groups; a union
    dataset over live segments, c2 summed)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    w1s = sorted(
        {ns + t for pos in shortlists[:-1] for t, _, _ in pos}
    )
    w2s = {ns + t for pos in shortlists[1:] for t, _, _ in pos}
    if not w1s or not w2s:
        return {}
    dset = ds.dataset(
        [ds.dataset(d, format="parquet") for d in sub["ngrams_dirs"]]
    )
    t = dset.to_table(filter=ds.field("w1").isin(w1s))
    t = t.filter(pc.is_in(t.column("w2"), value_set=pa.array(sorted(w2s))))
    out: dict[tuple[str, str], int] = {}
    for a, b, c in zip(
        t.column("w1").to_pylist(),
        t.column("w2").to_pylist(),
        t.column("c2").to_pylist(),
    ):
        key = (a[len(ns):], b[len(ns):])
        out[key] = out.get(key, 0) + int(c)
    return out


def phrase_suggest(
    reader,
    text: str,
    size: int = 3,
    max_edits: int = 2,
    prefix_length: int = 1,
    candidates_per_token: int = 5,
    backoff: float = 0.4,
    alpha: float = 0.5,
    error_discount: float = 0.5,
    field: str | None = None,
) -> list[dict]:
    """Driver-tier phrase suggestion over either reader tier: returns
    [{"text", "score"}, ...] ranked (score desc, text asc), the input
    phrase excluded. Requires build_ngram_stats() on the index (live
    tier: on the base — deltas inherit automatically)."""
    sub = _substrate(reader)
    ns = reader._suggest_namespace(field)
    tokens = reader.query_terms(text)
    if not tokens:
        return []
    if len(tokens) > MAX_TOKENS:
        raise ValueError(
            f"phrase_suggest caps input at {MAX_TOKENS} tokens (got {len(tokens)})"
        )
    shortlists = _candidates(
        reader, sub, tokens, ns, max_edits, prefix_length, candidates_per_token
    )
    if any(not pos for pos in shortlists):
        return []
    c2 = _bigram_counts(sub, ns, shortlists)
    n_tokens = sub["n_tokens"]
    v = sub["v"]

    def p_uni(cf: int) -> float:
        return (cf + alpha) / (n_tokens + alpha * v)

    results: list[tuple[float, str]] = []
    identity = " ".join(tokens)
    for beam in itertools.product(*shortlists):
        score = math.log(p_uni(beam[0][1]))
        edits = beam[0][2]
        for (w1, cf1, _d1), (w2, cf2, d2) in zip(beam, beam[1:]):
            pair = c2.get((w1, w2), 0)
            if pair > 0:
                score += math.log(pair / float(cf1))
            else:
                score += math.log(backoff * p_uni(cf2))
            edits += d2
        score += edits * math.log(error_discount)
        phrase = " ".join(w for w, _, _ in beam)
        if phrase != identity:
            results.append((score, phrase))
    results.sort(key=lambda sp: (-sp[0], sp[1]))
    return [
        {"text": p, "score": round(s, 4)} for s, p in results[:size]
    ]


def phrase_suggest_df(
    reader,
    text: str,
    size: int = 3,
    max_edits: int = 2,
    prefix_length: int = 1,
    candidates_per_token: int = 5,
    backoff: float = 0.4,
    alpha: float = 0.5,
    error_discount: float = 0.5,
    field: str | None = None,
) -> DataFrame:
    """Distributed twin of phrase_suggest (same candidates, same LM, same
    ranking — pytest-verified; the ORACLE-checked surface): per-position
    shortlists come from prefix-pruned scans of the term dictionary with
    threshold-capped JVM levenshtein and one window cut each; the beam is
    the cross join of those (<= candidates_per_token^n rows — broadcast);
    each adjacent pair left-joins the (w1, w2)-sorted ngrams parquet; one
    scoring expression, ordered-limit cut. Returns (suggestion, score)."""
    spark = reader.spark
    sub = _substrate(reader)
    ns = reader._suggest_namespace(field)
    tokens = reader.query_terms(text)
    empty = spark.createDataFrame([], "suggestion string, score double")
    if not tokens:
        return empty
    if len(tokens) > MAX_TOKENS:
        raise ValueError(
            f"phrase_suggest caps input at {MAX_TOKENS} tokens (got {len(tokens)})"
        )
    n_tokens = sub["n_tokens"]
    v = sub["v"]

    def p_uni(cf_col):
        return (cf_col + F.lit(alpha)) / F.lit(n_tokens + alpha * v)

    # multi-segment (live) substrate: union the dictionaries and sum cf
    # per term before candidate ranking; single-segment reads stay as-is
    def terms_df():
        d = spark.read.parquet(*sub["terms_dirs"]).select("term", "cf")
        if len(sub["terms_dirs"]) > 1:
            d = d.groupBy("term").agg(F.sum("cf").alias("cf"))
        return d

    cands = []
    for i, tok in enumerate(tokens):
        d = terms_df()
        pref = ns + tok[:prefix_length] if prefix_length > 0 else ns
        if pref:
            hi = pref[:-1] + chr(ord(pref[-1]) + 1)
            d = d.filter((F.col("term") >= pref) & (F.col("term") < hi))
        bare = (
            F.expr(f"substring(term, {len(ns) + 1})") if ns else F.col("term")
        )
        c = (
            d.filter(
                F.abs(F.length("term") - F.lit(len(ns) + len(tok))) <= max_edits
            )
            .select(
                bare.alias(f"w{i}"),
                F.col("cf").cast("long").alias(f"cf{i}"),
                F.levenshtein(bare, F.lit(tok), max_edits).alias(f"d{i}"),
            )
            .filter(F.col(f"d{i}") >= 0)
        )
        # TakeOrderedAndProject (distributed partial top-N per partition,
        # merged on the driver) — not a row_number window, which would
        # funnel the whole prefix bucket through one partition
        c = c.orderBy(
            F.asc(f"d{i}"), F.desc(f"cf{i}"), F.asc(f"w{i}")
        ).limit(candidates_per_token)
        cands.append(c)
    beam = cands[0]
    for c in cands[1:]:
        beam = beam.crossJoin(F.broadcast(c))
    # adjacent-pair bigram counts: the tiny beam-side key set broadcasts
    # against each (w1, w2)-sorted ngrams scan (live: segments unioned,
    # c2 summed)
    ngrams = spark.read.parquet(*sub["ngrams_dirs"])
    if len(sub["ngrams_dirs"]) > 1:
        ngrams = ngrams.groupBy("w1", "w2").agg(F.sum("c2").alias("c2"))
    score = F.log(p_uni(F.col("cf0")))
    edits = F.col("d0")
    for i in range(1, len(tokens)):
        src = ngrams
        if ns:
            src = ngrams.filter(
                F.col("w1").startswith(ns) & F.col("w2").startswith(ns)
            )
        pair = src.select(
            (F.expr(f"substring(w1, {len(ns) + 1})") if ns else F.col("w1")).alias(f"w{i-1}"),
            (F.expr(f"substring(w2, {len(ns) + 1})") if ns else F.col("w2")).alias(f"w{i}"),
            F.col("c2").alias(f"c2_{i}"),
        )
        beam = beam.join(pair, [f"w{i-1}", f"w{i}"], "left")
        score = score + F.when(
            F.col(f"c2_{i}") > 0,
            F.log(F.col(f"c2_{i}") / F.col(f"cf{i-1}").cast("double")),
        ).otherwise(F.log(F.lit(backoff) * p_uni(F.col(f"cf{i}"))))
        edits = edits + F.col(f"d{i}")
    score = score + edits.cast("double") * F.lit(math.log(error_discount))
    suggestion = F.concat_ws(" ", *[F.col(f"w{i}") for i in range(len(tokens))])
    identity = " ".join(tokens)
    # rank by the RAW score (the driver twin's rule) and round only for
    # display — ranking by the rounded value let two near-tied phrases
    # collapse and re-break by text, so the two tiers could disagree on
    # the top suggestion
    return (
        beam.select(
            suggestion.alias("suggestion"),
            score.cast("double").alias("_raw"),
            F.round(score, 4).alias("score"),
        )
        .filter(F.col("suggestion") != identity)
        .orderBy(F.desc("_raw"), F.asc("suggestion"))
        .limit(size)
        .drop("_raw")
    )
