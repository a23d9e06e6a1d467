"""Measure query wall time across the driver's three scale factors.

Produces the SCALE.md "Measured scaling" table: warm best-of-2 seconds at
sf0.001 / sf0.01 / sf0.1 for a representative query per operator family.
Run from the repo root: ``python tools/scale_probe.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "daily_event_stats",
    "calendar_ymd_events",
    "event_sessions",
    "doc_minhash_lsh_pairs",
    "doc_near_dup_drop",
    "emb_knn_bruteforce",
    "emb_lsh_near_dup_pairs",
    "doc_text_stats",
    "event_type_pivot",
    "doc_chunks",
    "doc_tfidf_terms",
    "emb_quantize",
    "doc_pii_scrub",
    "user_funnel",
    "user_cohort_retention",
    "doc_vocab_stats",
    "doc_repetition_signals",
    "emb_knn_recall",
    "emb_ivf_recall_curve",
    "doc_hybrid_search",
    "user_funnel_windowed",
    "doc_dedup_recall",
    "rt_search_catalog",
    "doc_segment_dedup",
    "doc_token_rarity",
    "doc_hll_tokens",
    "doc_leakage_safe_split",
    "doc_temperature_mix",
    "mm_pcm_stats",
    "emb_ivf_cluster_quality",
    "emb_knn_ivfpq",
    "emb_pq_codes_refined",
    "events_hll_users_incremental",
    "doc_cms_token_freq",
    "doc_bloom_screen",
    "orders_cdc_upsert",
    "user_event_type_scd2",
    "customer_rfm_scores",
    "event_type_daily_zscore",
    "doc_bigram_lm",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from gdutils_spark.queries import QUERIES
    from gdutils_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in NAMES:  # warm codegen once per plan shape
        QUERIES[n](spark, SFS[0]).collect()
    print(f"| query | sf0.001 | sf0.01 | sf0.1 | 100× data costs |")
    print("|---|---|---|---|---|")
    for n in NAMES:
        row = []
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[n](spark, sf).collect()
                best = min(best, time.perf_counter() - t0)
            row.append(best)
        a, _, c = row
        print(
            f"| {n} | {row[0]:.2f} | {row[1]:.2f} | {row[2]:.2f} | {c / a:.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
