#!/usr/bin/env python3
"""Headline benchmark: runs representative engine queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead).  The flagship metric is total wall seconds across
the headline set.

Timing methodology (r7, session-isolated): the headline set is split into
chunks of <= SPARK_GRAFT_BENCH_CHUNK_SIZE (default 25) queries and EACH
CHUNK RUNS IN ITS OWN FRESH SUBPROCESS/JVM.  r5/r6 measured that a single
73-query session accumulates JVM/GC state that moves unchanged-code medians
2-6x (same-query medians 3.5 s -> 9.7 s across sessions; in-run spreads up
to 3.5x on the GC-sensitive pair joins).  Fresh-JVM chunks bound that
accumulation so round-over-round deltas reflect code, not session history.
Within a chunk, each query runs one UNTIMED warmup execution (r8: the first
repeat in a fresh JVM pays JIT/codegen/shuffle-service warmup that was
inflating min/max spreads >1.5x on 35 queries while leaving medians sound)
and then REPEATS (default 3; 7 for the iterative/GC-sensitive subset) timed
runs; the reported number is the MEDIAN of the timed (warm) runs, with
per-query warm min/max spread recorded in BENCH_DETAIL.json.

Host-drift normalization (r11): every chunk session also times the
CODE-FROZEN ``calibration_probe`` (warmup + 3 repeats, median + warm
spread recorded).  BENCH_DETAIL.json carries ``calibration_wall``,
per-session probe medians/spreads, and ``queries_normalized`` (each query
divided by ITS session's probe median, unitless).  Cross-round
comparisons should read the normalized numbers — r10's 1.14-1.30x
fleet-wide host drift divides out, and a spread outlier is only
suspicious if its session's probe stayed tight (SCALE.md §6c).

Output contract (r7, relaxed r11): the LAST stdout line is a <=256-byte
summary — {"metric","value","unit","sf","n_queries","repeats",
"iter_repeats","n_sessions","calib","hl_norm"} — with NO per-query map,
guarded by a hard length assert.  Two rounds running (r5, r6) the
per-query map outgrew the driver's 2,000-char stdout tail window and the
flagship number shipped machine-unreadable ("parsed: null").  The full
per-query map + spreads are printed on an EARLIER stdout line and written
to BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "doc_zipf_slope",
    "doc_sorted_neighborhood",
    "rel_audience_overlap",
    "doc_ks_drift",
    "emb_hard_negatives",
    "eth_fee_oracle",
    "doc_ppjoin_pairs",
    "doc_count_cosine_pairs",
    "rel_bucketed_join",
    # session-3 statistics + clustering family
    "rel_gini_revenue",
    "rel_chisq_independence",
    "doc_token_burstiness",
    "rel_conversion_latency",
    "eth_whale_clusters",
    "emb_jl_rerank_topk",
    "eth_khop_reachability",
    "doc_simhash_recall",
    "rel_weighted_median",
    "rel_pricing_summary",
    "rel_regional_revenue",
    "rel_top_customers",
    "rel_window_topn",
    "rel_event_deltas",
    "rel_set_ops",
    "rel_rollup_revenue",
    "rel_shipping_priority",
    "doc_exact_dedup",
    "doc_winnow_fps",
    "doc_top_terms",
    "doc_pack_sequences",
    "doc_chunk_windows",
    "doc_repetition",
    "doc_corpus_shuffle",
    "rel_large_orders",
    "emb_norms",
    "emb_ivf_topk",
    "emb_similar_pairs",
    "eth_erc20_movement",
    "eth_tx_pagerank",
    "rel_funnel_steps",
    "doc_weighted_sample",
    "doc_bm25_topk",
    # round-4/5 operator families (graph variants, sketches, temporal,
    # TPC-H Q8 shape, streaming top-k, refined-codebook ANN) — timed so a
    # perf regression there is visible round-over-round
    "eth_tx_hits",
    "eth_tx_pagerank_weighted",
    "doc_cms_token_counts",
    "rel_bloom_prefilter",
    "rel_gap_fill",
    "rel_ohlc_bars",
    "rel_market_share",
    "stream_trending_topk",
    "emb_ivf_recall_refined",
    # round-5 additions: corpus-global boilerplate removal + hashed linear
    # quality gate
    "doc_chunk_dedup_filter",
    "doc_quality_classifier",
    # round-5 additions: pigeonhole fuzzy linkage + mergeable HLL rollup
    "doc_fuzzy_hamming_pairs",
    "rel_hll_partial_merge",
    # round-6 additions: asymmetric containment dedup, cosine range query,
    # cross-media duplicate-frame stats
    "doc_containment_pairs",
    "emb_range_search",
    "multimodal_frame_dedup",
    "emb_knn_join_ivf",
    "rel_data_quality_report",
    "rel_mad_anomalies",
    "doc_collocations_pmi",
    "rel_twap",
    # round-6 late additions: integer-exact OLS trend, sweep-line peak
    # concurrency, zero-shuffle collision entropy, lossless edit-distance
    # linkage, single-shuffle MERGE, dyadic EWMA
    "rel_revenue_trend",
    "rel_max_concurrency",
    "doc_token_entropy",
    "doc_edit_distance_pairs",
    "rel_merge_upsert",
    "rel_ewma_value",
    # round-6 continuation: journey transitions, nearest as-of, LSH-recall
    # report over the exact-Jaccard truth, incremental state merge
    "rel_markov_transitions",
    "rel_asof_nearest",
    "doc_minhash_recall",
    "rel_incremental_agg",
    # round-7 additions: SQ8 quantized serving, KMV sketch + set algebra,
    # RAKE keyphrases, Benford audit, posting-list skew profile, lexical
    # diversity, IVF silhouette + OOD screen
    "emb_sq8_topk",
    "rel_kmv_distinct",
    "rel_kmv_set_ops",
    "doc_rake_keywords",
    "rel_benford_deviation",
    "doc_shingle_df_profile",
    "doc_lexical_diversity",
    "emb_silhouette",
    "emb_outlier_scores",
    # round-8 additions: sampled health-check variants of the two heaviest
    # pair joins, streaming KMV distinct sketch
    "doc_containment_pairs_sampled",
    "doc_ppjoin_pairs_sampled",
    "stream_kmv_distinct",
    # round-8 session-2 additions: mergeable histogram quantiles (batch +
    # streaming), IVF nprobe / LSH band tuning curves, byte-level corrupt
    # screen
    "rel_histogram_quantiles",
    "stream_value_histogram",
    "emb_ivf_probe_curve",
    "emb_lsh_band_curve",
    "multimodal_bytes_profile",
    "doc_quality_survival_curve",
    "emb_codebook_drift",
    "doc_minhash_band_curve",
]

# HEADLINE is FROZEN per round: round-over-round BENCH comparisons are 1:1
# on the frozen set — no more shared-subset arithmetic.  New queries bench
# in INCOMING (timed identically, reported separately as
# incoming_total_wall) and graduate into HEADLINE only by an explicit
# freeze bump recorded here, never silently.
#
# r10 freeze bump: the 14 round-9 INCOMING entries graduate (below); the
# first 93 names remain exactly the r9-frozen set, so the r9-comparable
# subtotal is still reported (r9_headline_subtotal in BENCH_DETAIL.json).
R9_HEADLINE_N = 93
HEADLINE += [
    # graduated r9 incoming (order preserved from the r9 INCOMING list)
    "stream_heavy_hitters",
    "stream_session_window",
    "emb_kmeans_convergence",
    "rel_window_distinct_range",
    "emb_triplet_mining",
    "doc_tfidf_topk",
    "doc_dup_rate_by_source",
    "rel_listagg_topk",
    "doc_minhash_calibration",
    "emb_power_iteration",
    "rel_salted_skew_join",
    "rel_text_formats_roundtrip",
    "emb_prefix_dim_recall",
    "eth_erc20_balances",
]
HEADLINE_FREEZE = "r12"
# r11 freeze bump: the 13 round-10 INCOMING entries graduate (below); the
# first R10_HEADLINE_N names are exactly the r10-frozen set, so the
# r10-comparable subtotal is still reported (r10_headline_subtotal).
R10_HEADLINE_N = len(HEADLINE)
HEADLINE += [
    # graduated r10 incoming (order preserved from the r10 INCOMING list)
    "eth_balance_snapshot_merge",
    "eth_log_topic_profile",
    "stream_ewma_user",
    "stream_funnel_firsts",
    "multimodal_shard_pack",
    "multimodal_pack_blobs",
    "rel_decile_lift",
    "emb_knn_label_purity",
    "eth_selector_gas_economics",
    "emb_dup_threshold_curve",
    "stream_erc20_balance_upsert",
    "doc_shingle_novelty",
    "doc_source_vocab_overlap",
]
# r12 freeze bump: the 14 round-11 INCOMING entries graduate (below); the
# first R11_HEADLINE_N names are exactly the r11-frozen set, so the
# r11-comparable subtotal (raw + probe-normalized) is still reported.
R11_HEADLINE_N = len(HEADLINE)
HEADLINE += [
    # graduated r11 incoming (order preserved from the r11 INCOMING list)
    "stream_balance_rpc_tail",
    "multimodal_png_decode_stats",
    "multimodal_png_corrupt_screen",
    "stream_png_ingest",
    "rel_welch_ttest",
    "rel_mann_whitney_auc",
    "rel_basket_lift",
    "emb_bucket_balance",
    "doc_code_prose_screen",
    "doc_boundary_leakage",
    "eth_fee_burn_split",
    "multimodal_wav_decode_stats",
    "rel_rfm_segments",
    "rel_percentile_cont",
]
INCOMING: list[str] = [
    # round-12: full-range exact uint256 balance ledger (5-limb decode)
    "eth_erc20_balances_u256",
    # round-12: durable kill-and-resume for the balance pipeline
    "stream_balance_restart",
    # round-12: server-side single-token address pushdown
    "eth_single_token_tail",
    # round-12: u256 family extensions + streaming u256 state
    "eth_u256_top_holders",
    "eth_u256_supply",
    "stream_u256_balance_upsert",
    # round-12: correlated LATERAL subquery
    "rel_lateral_topn",
    # round-12: time-travel u256 ledger checkpoints
    "eth_u256_balance_asof",
    # round-12: whale-alert top-k straight off the wire (no value decode)
    "eth_u256_largest_transfers",
]

# Iterative / stateful / micro-batch entries carry multi-job session state
# (shuffle-service reuse, streaming state stores) that makes a 3-sample
# median unstable (r5: driver vs idle-box medians disagreed >2x on
# pagerank/funnel; stream_trending_topk spread 3.5x in-run).  The inverted-
# index pair joins are the most GC-sensitive entries (r6: same-query medians
# moved 3.5s -> 9.7s across sessions).  Extra samples keep medians honest.
ITERATIVE = {
    # stateful micro-batch entries (applyInPandasWithState + memory-sink
    # settle) carry streaming state-store session state — same class as
    # stream_trending_topk below
    "stream_kmv_distinct",
    "stream_value_histogram",
    "stream_heavy_hitters",
    "stream_session_window",
    "stream_ewma_user",
    "stream_funnel_firsts",
    "stream_erc20_balance_upsert",
    "stream_balance_rpc_tail",
    "stream_png_ingest",
    "stream_balance_restart",
    "stream_u256_balance_upsert",
    # kmeans_convergence collects a codebook per Lloyd round (multi-job)
    "emb_kmeans_convergence",
    "eth_tx_pagerank",
    "eth_tx_pagerank_weighted",
    "eth_tx_hits",
    "rel_funnel_steps",
    "stream_trending_topk",
    "emb_ivf_recall_refined",
    "doc_containment_pairs",
    "doc_chunk_dedup_filter",
    "doc_ppjoin_pairs",
    "doc_count_cosine_pairs",
    # r9 (VERDICT r8 task #3): the five remaining >1.5x warm-spread
    # outliers, adjudicated as the same allocator-pause class as the
    # pair joins above — each spread is a single max spike over an
    # otherwise tight sample (BENCH_DETAIL r8: emb_hard_negatives
    # min=0.485 med=0.486 max=0.761; rel_incremental_agg 0.256/0.287/
    # 0.401 — a 0.15 s pause on a 0.29 s query).  Per-repeat GC drains +
    # 7 samples land the pause between samples, as r8 did for
    # doc_ppjoin_pairs/doc_repetition.
    "doc_minhash_band_curve",
    "doc_minhash_recall",
    "doc_collocations_pmi",
    "emb_hard_negatives",
    "rel_incremental_agg",
    "rel_kmv_distinct",
}


def calibration_probe(spark) -> None:
    """CODE-FROZEN host-speed probe (r11; never edit — a changed probe
    breaks every cross-round normalized comparison).  One full 8M-row
    sort + one 8M-row grouped aggregate over a hash-generated constant
    DataFrame: pure JVM compute + shuffle, zero I/O, zero Python workers,
    deterministic by construction.  Timed in EVERY bench session; each
    query's normalized time is raw/probe for ITS session, so VM/CPU-steal
    session drift (r10: a uniform 1.14-1.30x fleet-wide factor on
    unchanged code) divides out of round-over-round comparisons."""
    from pyspark.sql import functions as F

    base = spark.range(0, 8_000_000, 1, 32).select(
        (F.hash(F.col("id")) % 997).alias("k"),
        (F.hash(F.col("id") * 2654435761) % 1_000_000).alias("v"),
    )
    base.orderBy("v", "k").write.mode("overwrite").format("noop").save()
    base.groupBy("k").agg(
        F.sum("v"), F.count("*"), F.avg("v"), F.max("v")
    ).write.mode("overwrite").format("noop").save()


def run_chunk(names: list[str], sf_dir: str, repeats: int, iter_repeats: int) -> dict:
    """Child-process entry: time ``names`` in THIS fresh JVM, return maps."""
    from presto_ethereum_spark.plans import battery
    from presto_ethereum_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = battery.queries()

    # Warm the JVM/parquet-footers once with a trivial action so the first
    # measured query doesn't pay session spin-up, and warm the Python/Arrow
    # worker pool (a one-time ~3s daemon fork that would otherwise be billed
    # to whichever measured query first touches a pandas UDF).  Footer reads
    # + a count per table keep the measured numbers about query compute, not
    # first-touch file metadata.
    qs["rel_having"](spark, sf_dir).write.mode("overwrite").format("noop").save()
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        battery.t(spark, sf_dir, name).write.mode("overwrite").format("noop").save()
    qs["eth_erc20_movement"](spark, sf_dir).limit(1).write.mode("overwrite").format(
        "noop"
    ).save()
    # warm the chain fixture scan + tx explode the same way the relational
    # tables are warmed above (footer + decode, full pass)
    from presto_ethereum_spark.plans.battery import _eth_tables

    _eth_tables(spark).table("transaction").write.mode("overwrite").format(
        "noop"
    ).save()
    # IVF/PQ codebook construction is a one-time INDEX-BUILD step (a
    # driver-side collect of 8 seed rows); prime the memoized codebook so
    # the measured ANN queries reflect steady-state serving, not index build
    from presto_ethereum_spark.operators.similarity import seed_centroids

    seeds = seed_centroids(battery.t_spread(spark, sf_dir, "embeddings"), n_cells=8)
    battery._IVF_CODEBOOKS[sf_dir] = seeds
    battery._IVF_CODEBOOKS[("pq", sf_dir)] = seeds[:4]

    # Session calibration: warm once, time 3 fixed repeats (NOT governed by
    # the repeats env — the probe methodology is frozen with the probe code),
    # keep the median.  Runs after the table/UDF warmups so it measures the
    # same steady-state JVM the queries see.
    calibration_probe(spark)
    calib_samples: list[float] = []
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        calibration_probe(spark)
        calib_samples.append(round(time.perf_counter() - t0, 3))
    calib = round(statistics.median(calib_samples), 3)
    calib_samples.sort()

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        n = iter_repeats if name in ITERATIVE else repeats
        # WARM-MEDIAN CONTRACT (r8): one untimed warmup execution per query
        # before the timed repeats.  r7 measured 35 non-iterative queries
        # with >1.5x min->max in-chunk spread purely because the FIRST
        # repeat pays per-query JIT/shuffle-service/codegen warmup that
        # min/max then records; medians were already trustworthy, spreads
        # were not.  The warmup run is identical to a timed run, just not
        # recorded — spreads in BENCH_DETAIL.json are warm-only.
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        # GC DRAIN (r8): collect the PREVIOUS query's (and the warmup's)
        # garbage before timing starts, so an allocator pause triggered by
        # old-gen debt someone else ran up is not billed to a random repeat
        # of THIS query.  For the GC-sensitive iterative/pair-join set the
        # drain runs before EVERY timed repeat — their own repeats generate
        # enough garbage to trip a collection mid-sample (r8 warm spreads:
        # doc_ppjoin_pairs 2.2x, doc_repetition 3.9x on a single max
        # spike).  Standard inter-iteration hygiene (JMH does the same);
        # the pause still exists, it just lands between samples.
        # LOCAL-MODE ASSUMPTION: System.gc() via _jvm collects the DRIVER
        # JVM only — exactly right on local[32] where every executor thread
        # lives in that one JVM, but a silent no-op for executors on a real
        # cluster (a cluster bench would drain via a dummy all-executor job
        # that calls System.gc in each task).  The r8 methodology change is
        # flagged in BENCH_DETAIL.json provenance ("gc_drain").
        spark.sparkContext._jvm.System.gc()
        samples: list[float] = []
        for _ in range(n):
            if name in ITERATIVE:
                spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        times[name] = round(statistics.median(samples), 3)
        spread[name] = [samples[0], samples[-1]]
    return {
        "queries": times,
        "spread": spread,
        "calibration": calib,
        # the probe's OWN warm spread: a frozen constant plan with zero
        # I/O — any in-session spread here is pure host/GC noise floor,
        # the denominator for adjudicating per-query spread outliers
        "calibration_spread": [calib_samples[0], calib_samples[-1]],
    }


def adjudication_queue(
    times: dict[str, float], prev: dict[str, float]
) -> list[str]:
    """SCALE.md §6d's adjudication policy, SELF-EXECUTING (VERDICT r12
    #2): any headline entry whose cross-round RAW ratio exceeds 2x AND
    whose current median exceeds 2 s is queued for
    ``scripts/adjudicate_movers.py --queries <q> --baseline <prev round's
    closing commit>``.  Sub-2 s entries stay un-queued however hard they
    swing — the measured same-day noise floor (§6e/§6f: single-query
    swings to 2.97x on identical code) makes paired sessions on them pure
    cost; multi-second 2x movers are exactly the class r11's
    `eth_tx_hits` fell into, where only the paired protocol separates
    environment drift from a real regression."""
    return [
        name
        for name in HEADLINE
        if name in times
        and prev.get(name)
        and times[name] > 2.0
        and times[name] / prev[name] > 2.0
    ]


def _refresh_baseline() -> tuple[int | None, dict[str, float]]:
    """Cross-round comparison base for the adjudication queue.

    The driver's BENCH_r{N}.json records only a 2,000-char stdout tail —
    the per-query map lives in BENCH_DETAIL.json, which every bench run
    OVERWRITES.  So the first bench run after a new BENCH_r{N} appears
    (i.e. the first run of round N+1, while the on-disk DETAIL is still
    round N's committed closing copy) snapshots that map into
    BENCH_BASELINE.json tagged with N; every later run this round
    compares against the snapshot, giving a stable round-over-round base
    instead of run-over-run drift."""
    import re

    here = Path(__file__).resolve().parent
    rounds = [
        int(m.group(1))
        for f in here.glob("BENCH_r*.json")
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f.name))
    ]
    n = max(rounds, default=None)
    bpath = here / "BENCH_BASELINE.json"
    try:
        cur = json.loads(bpath.read_text())
    except (OSError, json.JSONDecodeError):
        cur = {}
    if cur.get("round") != n:
        try:
            detail = json.loads((here / "BENCH_DETAIL.json").read_text())
        except (OSError, json.JSONDecodeError):
            return n, {}
        cur = {
            "round": n,
            "note": "closing per-query medians of the round named above,"
            " snapshotted from its committed BENCH_DETAIL.json by the"
            " first bench run of the following round",
            "queries": detail.get("queries", {}),
        }
        bpath.write_text(json.dumps(cur, indent=1) + "\n")
    return cur.get("round"), cur.get("queries", {})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    # local[32] runs every "executor" thread inside the ONE driver JVM; the
    # 8g default heap that is fine for unit tests turns a bench session into
    # a GC storm (measured: repeat-to-repeat spreads of 0.7 s -> 5.5 s on
    # the same query once the heavy graph/stream entries joined the headline
    # set).  48g on the 128 GiB box keeps per-session old-gen occupancy far
    # from the collector's trigger; on a real cluster driver memory is a
    # submit-time setting and this default is inert (executors hold data).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    iter_repeats = max(
        repeats, int(os.environ.get("SPARK_GRAFT_BENCH_ITER_REPEATS", "7"))
    )

    chunk_env = os.environ.get("SPARK_GRAFT_BENCH_CHUNK")
    if chunk_env is not None:
        # ---- child mode: one fresh JVM per chunk -------------------------
        names = json.loads(chunk_env)
        result = run_chunk(names, sf_dir, repeats, iter_repeats)
        Path(os.environ["SPARK_GRAFT_BENCH_OUT"]).write_text(json.dumps(result))
        return

    # ---- parent mode: orchestrate fresh-JVM chunks, aggregate ------------
    chunk_size = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK_SIZE", "25"))
    allq = HEADLINE + INCOMING
    chunks = [allq[i : i + chunk_size] for i in range(0, len(allq), chunk_size)]
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    session_calib: dict[str, float] = {}  # query -> its session's probe time
    calibs: list[float] = []  # per-session probe medians, chunk order
    calib_spreads: list[list[float]] = []  # per-session probe [min, max]
    here = Path(__file__).resolve().parent
    for i, chunk in enumerate(chunks):
        out = here / f".bench_chunk_{i}.json"
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_CHUNK"] = json.dumps(chunk)
        env["SPARK_GRAFT_BENCH_OUT"] = str(out)
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve())],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if proc.returncode != 0 or not out.exists():
            print(
                json.dumps(
                    {"metric": "headline_total_wall", "value": None, "unit": "sec",
                     "sf": sf, "error": f"chunk {i} rc={proc.returncode}"}
                ),
                file=sys.stderr,
            )
            sys.exit(1)
        part = json.loads(out.read_text())
        times.update(part["queries"])
        spread.update(part["spread"])
        calibs.append(part["calibration"])
        calib_spreads.append(part["calibration_spread"])
        for name in part["queries"]:
            session_calib[name] = part["calibration"]
        out.unlink()
        print(
            f'# chunk {i + 1}/{len(chunks)}: {len(chunk)} queries, '
            f'{round(sum(part["queries"].values()), 3)} s, '
            f'calib {part["calibration"]} s',
            flush=True,
        )

    headline_wall = round(sum(times[n] for n in HEADLINE), 3)
    incoming_wall = round(sum(times[n] for n in INCOMING), 3)
    # Normalized times: each query divided by ITS OWN session's probe median
    # (unitless multiples of the frozen calibration_probe).  Cross-round,
    # compare these — host-session speed divides out.
    times_norm = {
        n: round(t / session_calib[n], 3) for n, t in times.items()
    }
    calibration_wall = round(statistics.median(calibs), 3)
    detail = {
        "metric": "headline_total_wall",
        # `value` is the FROZEN headline set only (1:1 round-over-round);
        # INCOMING entries are timed identically but totaled separately
        "value": headline_wall,
        "incoming_total_wall": incoming_wall,
        # 1:1 comparability with BENCH_r09/r10: name prefixes are exactly
        # the respective frozen sets
        "r9_headline_subtotal": round(
            sum(times[n] for n in HEADLINE[:R9_HEADLINE_N]), 3
        ),
        "r10_headline_subtotal": round(
            sum(times[n] for n in HEADLINE[:R10_HEADLINE_N]), 3
        ),
        "r11_headline_subtotal": round(
            sum(times[n] for n in HEADLINE[:R11_HEADLINE_N]), 3
        ),
        "r11_headline_norm_subtotal": round(
            sum(times_norm[n] for n in HEADLINE[:R11_HEADLINE_N]), 3
        ),
        "headline_freeze": HEADLINE_FREEZE,
        "incoming": INCOMING,
        "unit": "sec",
        "queries": times,
        # host-drift-immune numbers (r11, VERDICT r10 #1): the frozen
        # calibration_probe's per-session median + per-query times in
        # probe units; headline_norm is the sum over the frozen set.
        "queries_normalized": times_norm,
        "spread": spread,
        # small calibration scalars AFTER the big maps: the driver's
        # 2,000-char stdout tail then shows them alongside the summary line
        "calibration_wall": calibration_wall,
        "calibration_per_session": calibs,
        "calibration_spread_per_session": calib_spreads,
        "headline_norm": round(sum(times_norm[n] for n in HEADLINE), 3),
        "incoming_norm": round(sum(times_norm[n] for n in INCOMING), 3),
        "repeats": repeats,
        "iter_repeats": iter_repeats,
        "n_sessions": len(chunks),
        "sf": sf,
        # provenance: warm-median contract since r8; the inter-sample GC
        # drain collects the driver JVM only (all executors in local mode),
        # so spreads are not comparable to <=r7 recordings
        "gc_drain": "driver-jvm-only (local mode); warm-median since r8",
    }
    # §6d policy made self-executing: compare against the newest
    # driver-recorded round and queue multi-second >2x raw movers for the
    # paired-worktree protocol.  Recorded in the detail artifact (the
    # judge and the next round's builder both read it) and echoed to
    # stderr so an interactive run can't miss it.
    prev_round, prev_times = _refresh_baseline()
    queue = adjudication_queue(times, prev_times)
    detail["adjudicate_vs_round"] = prev_round
    detail["adjudicate_queue"] = queue
    if queue:
        print(
            f"# ADJUDICATE (>2x raw vs r{prev_round}, >2s median): "
            f"{','.join(queue)} -> python3 scripts/adjudicate_movers.py "
            f"--queries {','.join(queue)} --baseline <r{prev_round} commit>",
            file=sys.stderr,
        )
    out_path = here / "BENCH_DETAIL.json"
    out_path.write_text(json.dumps(detail, indent=1) + "\n")
    # Full per-query map on an EARLIER line for humans/logs ...
    print(json.dumps(detail))
    sys.stdout.flush()
    # ... and the LAST line is the tiny machine-readable summary.  The
    # driver captures only a 2,000-char stdout tail; r5 and r6 both shipped
    # "parsed: null" because the per-query map pushed the front of the final
    # line out of the window.  Hard assert keeps this contract honest.
    summary = {
        "metric": "headline_total_wall",
        "value": detail["value"],
        "incoming_wall": incoming_wall,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(HEADLINE),
        "repeats": repeats,
        "iter_repeats": iter_repeats,
        "n_sessions": len(chunks),
        "calib": calibration_wall,
        "hl_norm": detail["headline_norm"],
    }
    line = json.dumps(summary)
    # 256B cap (r11: was 200B; +calib/hl_norm fields).  The real constraint
    # is the driver's 2,000-char stdout tail — the final line must stay far
    # inside it so the whole summary parses; 256B leaves ~1.7KB of the
    # preceding detail line visible in the tail as well.
    assert len(line) <= 256, f"final bench line {len(line)}B > 256B contract"
    print(line)


if __name__ == "__main__":
    main()
