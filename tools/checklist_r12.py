"""Append the 77-row disposition checklist to OPTIMIZATION_r12.md.

Reads the round-start idle baseline (BENCH_LOCAL_r12.json) and the
round-end idle suite (BENCH_LOCAL_r12_final.json) and emits one table
row per bench query with its disposition tag.

Usage: python tools/checklist_r12.py >> OPTIMIZATION_r12.md
"""

import json
import math

BASE = json.load(open("BENCH_LOCAL_r12.json"))["queries"]
FINAL = json.load(open("BENCH_LOCAL_r12_final3_merged.json"))["queries"]

FAMILY = {
    # §1 dedup
    "dedup_minhash_lsh": "§1", "dedup_minhash_incremental": "§1",
    "cluster_soft_dedup": "§1", "banded_minhash_compaction": "§1",
    "cluster_near_dups": "§1", "curation_funnel": "§1",
    # §2 graph/ivf/pq/bpe build jobs (+§8 pagerank fold kernel)
    "centrality_rank_suppliers": "§2, §8 (kernel reverted, gate kept)", "pagerank_scale": "§2",
    # §3 sketches
    "cms_heavy_hitters": "§3", "bloom_prune_join": "§3",
    "approx_distinct_orders": "§3",
    # §4 ER
    "er_match_scale": "§4",
    # §5 BPE
    "bpe_train_merges": "§5", "bpe_encode_corpus": "§5",
    # §6 media
    "binary_video_fingerprint": "§6", "binary_audio_fingerprint": "§6",
    "binary_image_ahash": "§6", "banded_simhash_dedup": "§6",
    "fingerprint": "§6", "fp_winnow": "§6",
    # §7 vectors (+§9 brute-force cosine kernel, +§10 norm hoist)
    "ann_pq_adc": "§7", "ann_pq_recall": "§7, §9", "ann_ivfpq_topk": "§7",
    "ann_ivfpq_refine": "§7", "ann_recall_audit": "§7, §9, §10",
    "ann_ivf_sqrt_lists": "§7, §10", "ann_ivf_append": "§7, §10",
    "ann_ivf_filtered": "§7, §10", "ann_filtered_recall": "§7, §9, §10",
    "ann_int8_recall": "§7, §9", "ann_hybrid_rrf": "§7, §9",
    "knn_ivf": "§7, §10",
    "knn_ivf_serve": "§7, §10", "semantic_dedup_scale": "§7",
    "ann_ivf_arrow": "§7, §10", "knn_bruteforce": "§7, §9",
    "ivf_probe_deltas_0": "§7, §10", "ivf_probe_deltas_8": "§7, §10",
    "ivf_probe_deltas_32": "§7, §10",
}
INHERITS = {
    "cluster_weighted_epoch", "curation_pipeline_scale",
    "benchmark_eval_overlap", "decontam_testset", "coverage_dup_spans",
    "cleanup_span_rewrite", "benchmark_decontam_semantic",
}


def tag(name):
    if name in FAMILY:
        return f"optimized ({FAMILY[name]})"
    if name in INHERITS:
        return "inherits optimized stages"
    return "examined, already tight"


def main():
    rows = []
    for name, b in BASE.items():
        f = FINAL.get(name)
        r = (f / b) if (f and b) else float("nan")
        rows.append((name, b, f, r))
    rows.sort(key=lambda t: -(t[1] or 0))
    print("\n## Checklist (baseline -> final, idle sf0.1 min-of-3)\n")
    print("| query | start | end | ratio | disposition |")
    print("|---|---|---|---|---|")
    for name, b, f, r in rows:
        print(f"| {name} | {b:.2f} | {f:.2f} | {r:.2f}x | {tag(name)} |")
    ratios = [r for _, _, _, r in rows if not math.isnan(r)]
    g = math.exp(sum(math.log(x) for x in ratios) / len(ratios))
    tot_b = sum(b for _, b, _, _ in rows)
    tot_f = sum(f for _, _, f, _ in rows if f)
    print(
        f"\nSuite {tot_b:.1f}s -> {tot_f:.1f}s; per-row geomean "
        f"{g:.2f}x over {len(ratios)} rows."
    )


if __name__ == "__main__":
    main()
