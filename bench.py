"""Benchmark harness. Prints ONE JSON line:

{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
 "index_build": {...}, "scaling": {...}}

Sections:
  * queries: wall seconds per headline relational/pipeline query at
    $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
    local[$SPARK_GRAFT_CPUS].
  * index_build: build the inverted index over the sf documents corpus +
    BM25 search latency.
  * scaling: the north-rule evidence — the same synthetic-corpus build at
    two parallelism levels (local[N] vs local[4N]) in fresh subprocesses,
    steady-state (warmup build, then median of timed builds), reporting
    files/sec at both and efficiency = thr_4N / (4 * thr_N).

Set SPARK_GRAFT_BENCH_SKIP_SCALING=1 to skip the scaling section (it costs
a few minutes of subprocess runs).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N=2 -> 4N=8: both levels stay under the box's memory-bandwidth ceiling,
# so the ratio measures SOFTWARE scaling (the cluster analogue, where each
# executor brings its own memory channels). At 4->16 on this single box the
# 16-core level is bandwidth-throttled (~17% per-core slowdown measured
# with a numpy probe under 15-core load); we report that pair as secondary
# context in BASELINE.md.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
SCALE_FILES = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "400000"))

HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "w1_top_orders_per_cust",
    "q3_top_orders",
    "q5_region_revenue",
    "b4_join_left_customer",
    "bm25_topk",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "knn_cosine",
    "text_stats_by_lang",
]


def bench_queries(spark) -> tuple[dict[str, float], float]:
    from elasticsearch_jdbc_spark.plans.registry import QUERIES

    from bench_scale_run import _affinity, _steal_pct, _steal_ticks

    aff = _affinity()  # no-op when unpinned; correct under taskset/cpuset
    out = {}
    s0 = _steal_ticks(aff)
    t_sec = time.time()
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, SF_DIR).collect()  # warm (plans, workers, page cache)
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(time.time() - t0)
        # min of the timed runs: shared-VM steal bursts inflate single
        # samples by 2-4x; the min is the reproducible figure. If the two
        # samples disagree by >30% the window is noisy — pay one extra
        # sample so the recorded min is not itself a lucky/unlucky draw.
        if max(times) > 1.3 * min(times):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(time.time() - t0)
        out[name] = round(min(times), 3)
    # steal% over the whole query window, returned as a sibling value so
    # the per-query map stays homogeneous (no magic keys for consumers
    # iterating result["queries"])
    steal = round(
        _steal_pct(_steal_ticks(aff) - s0, time.time() - t_sec, len(aff)), 1
    )
    return out, steal


def bench_index(spark) -> dict:
    from elasticsearch_jdbc_spark.index import IndexBuilder, IndexReader
    from elasticsearch_jdbc_spark.sources import corpus_from_documents

    from bench_scale_run import _affinity, _steal_pct, _steal_ticks

    aff = _affinity()
    corpus = corpus_from_documents(spark, SF_DIR)
    n_docs = corpus.count()
    idx_dir = "/dev/shm/bench_idx_docs"
    # clean-window retry (the scaling section's policy, VERDICT r4 #7):
    # a sample whose window the hypervisor stole >= 2% of is re-timed,
    # up to 3 attempts; the headline is the LOWEST-STEAL sample (ties ->
    # fastest) and every attempt is reported
    attempts = []
    for _ in range(3):
        b = IndexBuilder(spark, idx_dir, partitions=CPUS)
        b.reset()
        s0 = _steal_ticks(aff)
        t0 = time.time()
        b.build(corpus, resume=False)
        build_s = time.time() - t0
        steal = _steal_pct(_steal_ticks(aff) - s0, build_s, len(aff))
        attempts.append((round(steal, 1), round(build_s, 2)))
        if steal < 2.0:
            break
    steal, build_s = min(attempts)
    reader = IndexReader(spark, idx_dir)
    t0 = time.time()
    hits = reader.search("fast key merge sort window", k=10)
    search_s = time.time() - t0
    shutil.rmtree(idx_dir, ignore_errors=True)
    return {
        "n_docs": n_docs,
        "build_s": build_s,
        "files_per_sec": round(n_docs / build_s, 1),
        "search_s": round(search_s, 3),
        "top1": hits[0][0] if hits else None,
        "steal_pct": steal,
        "attempts": [
            {"steal_pct": s, "build_s": t} for s, t in attempts
        ],
    }


def _scale_run(cores: int, timed: int) -> dict | None:
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "bench_scale_run.py"),
           str(cores), str(SCALE_FILES), str(timed)]
    if shutil.which("taskset"):
        # pin the whole process tree (JVM + python workers) to exactly
        # `cores` CPUs — local[N] alone only caps task slots, letting
        # GC/shuffle/python threads leak onto other cores and inflate
        # the small-N baseline
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    m = re.search(r"SCALE_RESULT (\{.*\})", r.stdout)
    if not m:
        return {"error": (r.stdout + r.stderr)[-500:]}
    return json.loads(m.group(1))


def bench_scaling() -> dict:
    """Two-parallelism-level throughput (the north-rule evidence).

    The levels run INTERLEAVED over a FIXED three rounds (N, 4N, N, 4N,
    N, 4N; each subprocess does a warmup build + timed builds) and each
    level's throughput is the minimum timed build across all rounds: this
    box is a shared VM with minute-scale steal-time bursts, so two
    back-to-back single-pass levels can sample different noise windows and
    skew the ratio either way (observed 0.72-0.96 for identical code).
    Interleaving + per-level min makes the ratio a contention-free
    software-scaling estimate; all raw times are reported."""
    levels: dict[str, dict] = {}

    def one_round() -> dict | None:
        # the 4N level gets 2 timed builds per pass — its builds are 3-4x
        # cheaper and its min is the ratio's numerator, so it deserves the
        # denser sampling
        for cores, timed in ((SCALE_N, 1), (SCALE_N * 4, 2)):
            res = _scale_run(cores, timed=timed)
            if not res or "error" in res:
                return res or {"error": "no output"}
            key = str(cores)
            if key in levels:
                levels[key]["all_times"] += res["all_times"]
                levels[key]["steal_pcts"] += res.get(
                    "steal_pcts", [0.0] * len(res["all_times"])
                )
            else:
                res.setdefault("steal_pcts", [0.0] * len(res["all_times"]))
                levels[key] = res
        return None

    def summarize() -> dict:
        for key, lv in levels.items():
            pairs = sorted(zip(lv["all_times"], lv["steal_pcts"]))
            lv["all_times"] = [t for t, _ in pairs]
            lv["steal_pcts"] = [s for _, s in pairs]
            lv["build_wall_s"] = pairs[0][0]
            lv["steal_pct_at_min"] = pairs[0][1]
            lv["files_per_sec"] = round(SCALE_FILES / lv["build_wall_s"], 1)
        lo, hi = levels[str(SCALE_N)], levels[str(SCALE_N * 4)]
        eff = hi["files_per_sec"] / (4.0 * lo["files_per_sec"])
        out = {
            "n_cores": SCALE_N,
            "4n_cores": SCALE_N * 4,
            "files": SCALE_FILES,
            "files_per_sec_n": lo["files_per_sec"],
            "files_per_sec_4n": hi["files_per_sec"],
            "efficiency": round(eff, 3),
            "rounds": rounds,
            "detail": levels,
        }
        if max(lo["steal_pct_at_min"], hi["steal_pct_at_min"]) > 5.0:
            # hypervisor co-tenants stole >5% of the VM's CPU during even
            # the FASTEST sample of a level: the ratio is contaminated by
            # work that is not ours — flag it machine-readably
            out["steal_contaminated"] = True
        return out

    def _min_steals_high() -> bool:
        return any(
            min(lv["steal_pcts"] or [0.0]) > 5.0 for lv in levels.values()
        )

    # FIXED round count (ADVICE r02: the old loop resampled only while the
    # ratio was below the bar — a one-sided stopping rule that could only
    # bias the reported efficiency upward). Three interleaved rounds
    # always run; the ratio comes from ALL samples' per-level minima, and
    # every raw time is reported in `detail`. Up to two EXTRA rounds run
    # only when every sample of a level measured >5% hypervisor steal —
    # a retry keyed on an EXTERNAL signal (stolen CPU), not on the
    # measured ratio, so it cannot bias the efficiency in either
    # direction; all samples (including the stolen ones) stay reported.
    rounds = 0
    for _ in range(3):
        err = one_round()
        if err:
            return err
        rounds += 1
    extra = 0
    while _min_steals_high() and extra < 2:
        print(
            "bench: every sample of a level saw >5% hypervisor steal; "
            "running an extra interleaved round",
            file=sys.stderr,
            flush=True,
        )
        err = one_round()
        if err:
            return err
        rounds += 1
        extra += 1
    return summarize()


def _other_busy_processes() -> list[str]:
    """Other Spark/pytest work of this box that would pollute the timing
    window (VERDICT r03: a concurrent test run blew two BENCH_r03 entries
    up 9-11x and cost the round its headline evidence). Our own process
    tree (ancestors — the driver invoking us) is excluded; the scaling
    subprocesses don't exist yet when this runs."""
    me = os.getpid()
    ancestors = {me}
    pid = me
    try:
        while pid > 1:
            with open(f"/proc/{pid}/status") as f:
                pid = int(re.search(r"PPid:\s*(\d+)", f.read()).group(1))
            ancestors.add(pid)
    except OSError:
        pass
    hits = []
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) in ancestors:
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
        except OSError:
            continue
        if not cmd:
            continue
        if (
            "pytest" in cmd
            or "org.apache.spark" in cmd
            or "pyspark" in cmd
            or ("python" in cmd and "/root/repo" in cmd)
        ):
            hits.append(f"{d}: {cmd[:160]}")
    return hits


def _clean_window_guard() -> list[str]:
    """Wait (up to ~60s) for competing Spark/pytest processes to drain;
    warn LOUDLY on stderr if they don't, and return the offenders so the
    output JSON records the window as contended — driver-run numbers must
    always be attributable to a clean or flagged window."""
    offenders: list[str] = []
    for attempt in range(4):
        offenders = _other_busy_processes()
        if not offenders:
            return []
        if attempt < 3:
            print(
                f"bench: waiting 20s for {len(offenders)} competing "
                f"process(es): {offenders[:3]}",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(20)
    print(
        "bench: WARNING — timing window is CONTENDED, results will be "
        f"flagged; offenders: {offenders[:5]}",
        file=sys.stderr,
        flush=True,
    )
    return offenders


def _membw_probe_s() -> float:
    """Time one 200 MB numpy stream op — the BASELINE.md diagnostic for
    the host's memory-bandwidth-contended mode, which hypervisor-steal
    counters MISS (same code has measured 0.04 s vs ~20 s minutes apart
    at 0% steal). Recorded at window start and end so every BENCH
    artifact carries its own contention context: ≲0.1 s = clean,
    ≫0.5 s = the contended host mode (numbers inflated through no fault
    of the engine)."""
    import numpy as np

    a = np.zeros(200 * 1024 * 1024 // 8)
    t0 = time.time()
    a * 1.5
    return round(time.time() - t0, 3)


def main() -> None:
    from elasticsearch_jdbc_spark.session import get_spark

    contended = _clean_window_guard()
    membw_start = _membw_probe_s()
    t_total = time.time()
    spark = get_spark("bench", cores=CPUS)
    queries, queries_steal = bench_queries(spark)
    index = bench_index(spark)
    spark.stop()
    scaling = {} if os.environ.get("SPARK_GRAFT_BENCH_SKIP_SCALING") else bench_scaling()
    total = round(time.time() - t_total, 2)
    result = {
        "metric": "headline wall seconds (sum) + index files/sec + N->4N scaling efficiency",
        "value": round(sum(queries.values()) + index["build_s"], 3),
        "unit": "sec",
        "queries": queries,
        "queries_steal_pct": queries_steal,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "index_build": index,
        "scaling": scaling,
        "bench_total_s": total,
        "membw_probe_s": {"start": membw_start, "end": _membw_probe_s()},
    }
    if contended:
        result["contended_window"] = contended[:5]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
