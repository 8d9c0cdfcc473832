"""Scale-factor sweep: times representative queries at sf0.001/0.01/0.1
(100× data range) and prints a markdown table with the 0.01→0.1 time
ratio — direct evidence of how each plan's cost grows with data volume
(a 10× data step costing ~≤10× time = the linear-scan/shuffle regime;
super-linear ratios flag quadratic candidate generation).

    python tools/scaling_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nzwirelessmap_fetch_spark.plans import registry  # noqa: E402
from nzwirelessmap_fetch_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
QUERIES = [
    "p2p_links",              # broadcast join pipeline (scan-bound)
    "agg_pricing_summary",    # partial-agg shuffle
    "text_stats",             # zero-shuffle scan
    "dedup_exact",            # one keyed shuffle
    "dedup_minhash_lsh",      # signature agg + band join
    "dedup_simhash_hamming",  # banded pair generation
    "sim_lsh_banded",         # LSH candidate join + verify
    "sim_ivf_pq",             # IVF+PQ ANN
    "corpus_span_dedup",      # span fan-out + narrow-key shuffle
    "corpus_bm25_topk",       # inverted-index retrieval
    "events_funnel",          # one user-exchange window chain
    "multimodal_phash_dedup", # Arrow hash + banded pairs
    "corpus_containment",     # Σdf² index self-join (explicit-width fix)
    "corpus_winnowing",       # fingerprint index self-join (explicit-width fix)
    "events_pattern_match",   # CEP carries: one user-keyed exchange
    "table_merkle_checksum",  # scan → 64-group manifest agg
    "dedup_sorted_neighborhood",  # SNM: (W-1)·n candidates by construction
    "text_dup_ngram_frac",    # row-local dup-n-gram fractions (zero shuffle)
    "embedding_random_projection",  # JL per-row dots (zero shuffle)
    "layout_zorder_key",      # mask-spread ladder + 256-tile rollup
    "sql_recursive_cte",      # native recursive CTE (frontier shrinks 10×/level)
    "agg_t_closeness",        # QI/bucket-grain aggs + bucket-domain NLJ
    "ml_target_encode_loo",   # one category agg + broadcast row-local encode
    "ml_quantile_binning",    # histogram sketch + aggregated-grain cumsum
    "sim_maxsim_late_interaction",  # query-tokens broadcast MaxSim re-rank
    "parts_croston_demand",   # per-part fold (parts are the parallel unit)
    "text_bpe_merge_step",    # pair-count shuffle + map-only merge apply
    # round-5 additions
    "corpus_containment_capped",  # df-capped prefix-filtered index join
    "geo_grid_neighbor_join",     # grid-cell stencil spatial join
    "catalog_profile",            # one-scan multi-distinct profile
    "agg_kmv_distinct",           # bottom-k sketch + TakeOrdered merge
    "ml_calibration_bins",        # bounded-domain reliability table
    "embedding_matryoshka_eval",  # dual-cosine scan + two rank windows
    # round-6 additions
    "dedup_snm_multipass",        # 3 sort-key passes, 3(W-1)·n candidates
    "graph_louvain_one_level",    # degree joins + struct-max sweep
    "graph_louvain_two_level",    # + contraction + weighted sweep
    "table_txn_log",              # two logged commits + diff counts
    "corpus_span_scrub",          # covered-position anti-join + doc rebuild
    "stream_jvm_running_totals",  # unbounded update-mode agg
]


def main() -> None:
    spark = get_spark("scaling-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    spark.range(1000).count()
    qs = registry.queries()
    results: dict[str, dict[str, float]] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            results.setdefault(name, {})[sf] = el
            spark.catalog.clearCache()
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio (10× data) |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        r = results[name]
        ratio = r["0.1"] / max(r["0.01"], 1e-9)
        print(
            f"| {name} | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {ratio:.1f}× |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
