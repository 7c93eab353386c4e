#!/usr/bin/env python3
"""Headline benchmark: runs representative engine queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead).  The flagship metric is total wall seconds across
the headline set.

Timing methodology: each query runs REPEATS (default 3; 7 for the
iterative/stateful subset) times in-session and the reported number is the
MEDIAN, with per-query min/max spread recorded under "spread".  Single-run
sub-second samples on a 32-thread local JVM move ±30% from scheduler/JIT
jitter alone; the median keeps real regressions from hiding in (or being
invented by) that band.

Output contract: the LAST stdout line is the compact parseable record
(metric/value/unit/queries/repeats/sf, no spread map) sized to survive the
driver's finite stdout tail capture; the full detail including spreads is
printed on an earlier line AND written to BENCH_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from presto_ethereum_spark.plans import battery  # noqa: E402
from presto_ethereum_spark.session import get_spark  # noqa: E402

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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    # local[32] runs every "executor" thread inside the ONE driver JVM; the
    # 8g default heap that is fine for unit tests turns the 37-query bench
    # session into a GC storm (measured: repeat-to-repeat spreads of 0.7 s
    # -> 5.5 s on the same query once the heavy graph/stream entries
    # joined the headline set).  48g on the 128 GiB box keeps full-session
    # old-gen occupancy far from the collector's trigger; on a real
    # cluster driver memory is a submit-time setting and this default is
    # inert (executors hold the data).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
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

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # Iterative / stateful / micro-batch entries carry multi-job session
    # state (shuffle-service reuse, streaming state stores) that makes a
    # 3-sample median unstable (r5: driver vs idle-box medians disagreed
    # >2x on pagerank/funnel; stream_trending_topk spread 3.5x in-run).
    # Give that subset more samples so its median converges.
    ITERATIVE = {
        "eth_tx_pagerank",
        "eth_tx_pagerank_weighted",
        "eth_tx_hits",
        "rel_funnel_steps",
        "stream_trending_topk",
        "emb_ivf_recall_refined",
        # not iterative, but the inverted-index pair joins are the most
        # GC-sensitive entries in the set (r6: same-query medians moved
        # 3.5s -> 9.7s across sessions); extra samples keep their medians
        # honest
        "doc_containment_pairs",
        "doc_chunk_dedup_filter",
        # same GC-sensitive inverted-index pair-join class (r6 session 3:
        # ppjoin spread [7.2, 22.0] on 3 samples)
        "doc_ppjoin_pairs",
        "doc_count_cosine_pairs",
    }
    iter_repeats = max(repeats, int(os.environ.get("SPARK_GRAFT_BENCH_ITER_REPEATS", "7")))
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    import statistics

    for name in HEADLINE:
        n = iter_repeats if name in ITERATIVE else repeats
        samples: list[float] = []
        for _ in range(n):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        times[name] = round(statistics.median(samples), 3)
        spread[name] = [samples[0], samples[-1]]

    detail = {
        "metric": "headline_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "spread": spread,
        "repeats": repeats,
        "iter_repeats": iter_repeats,
        "sf": sf,
    }
    # Full detail (incl. per-query spread) goes to a FILE and an early
    # stdout line; the driver's stdout tail capture is finite and r5's
    # 37-query single line outgrew it ("parsed: null" — the round shipped
    # without its headline number).  The LAST stdout line is therefore the
    # complete parseable record WITHOUT the spread map (~1.4 KB at 41
    # queries, well inside the tail window); spreads live in the file.
    out_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    out_path.write_text(json.dumps(detail, indent=1) + "\n")
    print(json.dumps(detail))
    sys.stdout.flush()
    compact = {k: v for k, v in detail.items() if k != "spread"}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
