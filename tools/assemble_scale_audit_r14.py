#!/usr/bin/env python
"""Assemble SCALE_AUDIT_r14.json from the round's probe artifacts:
.scale/probe100_r14.json (ivf_production / decontam_small /
decontam_large / bpe_train_5_merges) + .scale/ab_cc_r14.json (the
semantic-dedup CC forest-reduction A/B)."""
import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

probe = json.load(open(os.path.join(REPO, ".scale", "probe100_r14.json")))
ab = json.load(open(os.path.join(REPO, ".scale", "ab_cc_r14.json")))
seam = json.load(open(os.path.join(REPO, ".scale", "probe_seam_r14.json")))

ivf = probe["ivf_production"]
out = {
    "round": 14,
    "method": "interleaved t01(sf0.1)/t30/t100, single session, "
              "3 rounds, medians; CC A/B adjacent-run 3/2 medians",
    "ivf_production_r14": {
        "what": "Spark ML k-means ivf_index + write_ivf_partitioned + "
                "ivf_topk_from_storage (VERDICT r13 #2 — the production "
                "path; only the pivot variant was probed before)",
        "build_medians_sec": {
            s: ivf[s]["build_median_sec"] for s in ("t01", "t30", "t100")
        },
        "list_balance_max_over_median": {
            s: ivf[s]["max_over_median_balance"]
            for s in ("t01", "t30", "t100")
        },
        "partition_filters_t100": ivf["t100"]["partition_filters"],
        "partitions_read_of_16": {
            s: ivf[s]["partitions_read_of_16"]
            for s in ("t01", "t30", "t100")
        },
        "segment_alpha_30_100": ivf["segment_alpha_30_100"],
        "full_alpha_0p1_100": ivf["full_alpha_0p1_100"],
        # the probe ran twice: series 1 measured builds on a quiet box
        # (but used the wrong pruning instrument); series 2 fixed the
        # pruning measurement but its t100 build samples drifted
        # 17.1->26.8s mid-series (load). Both on the record; the build
        # exponent claim uses the quiet series.
        "build_series1_quiet_box": {
            "medians_sec": {"t01": 2.1968, "t30": 5.6455, "t100": 14.299},
            "segment_alpha_30_100": 0.772,
            "balance": {"t01": 1.326, "t30": 1.375, "t100": 1.234},
        },
        "measurement_note": "DataFrame.inputFiles() ignores filters and "
                            "cannot observe pruning; the executed scan's "
                            "PartitionFilters + numPartitions metric is "
                            "the instrument (first attempt got this "
                            "wrong, corrected on the record)",
        "verdict": (
            "build alpha(30->100) 0.772 on the quiet series (%s on the "
            "load-drifted rerun); list balance %s-%s; probe reads "
            "%s/16 partitions at every scale (file-listing-level "
            "pruning engaged)" % (
                ivf["segment_alpha_30_100"],
                min(ivf[s]["max_over_median_balance"]
                    for s in ("t01", "t30", "t100")),
                max(ivf[s]["max_over_median_balance"]
                    for s in ("t01", "t30", "t100")),
                ivf["t100"]["partitions_read_of_16"],
            )
        ),
    },
    "decontaminate_r14": {
        "what": "shingle-hash anti-join vs a benchmark corpus, small "
                "(broadcast) and corpus-sized (AQE shuffle) sides "
                "(VERDICT r13 #7 — the one unprobed op class)",
        "small_bench": {
            "medians_sec": probe["decontam_small"]["medians"],
            "survivors": probe["decontam_small"]["survivors"],
            "executed_joins": probe["decontam_small"]["executed_joins"],
            "segment_alpha_30_100":
                probe["decontam_small"]["segment_alpha_30_100"],
        },
        "corpus_sized_bench": {
            "medians_sec": probe["decontam_large"]["medians"],
            "survivors": probe["decontam_large"]["survivors"],
            "executed_joins": probe["decontam_large"]["executed_joins"],
            "segment_alpha_30_100":
                probe["decontam_large"]["segment_alpha_30_100"],
        },
        "verdict": (
            "small bench stays BroadcastHashJoin at every scale (alpha "
            "%s); corpus-sized bench flips BHJ->SortMergeJoin at t100 "
            "under AQE (alpha %s) — the plan flip the docstring "
            "promises, recorded from executed plans" % (
                probe["decontam_small"]["segment_alpha_30_100"],
                probe["decontam_large"]["segment_alpha_30_100"],
            )
        ),
    },
    "bpe_train_r14": {
        "what": "per-merge-round cost of the new distributed BPE loop "
                "(VERDICT r13 #4); corpus read once, rounds run over "
                "the distinct-word table",
        "total_medians_sec_5_merges":
            probe["bpe_train_5_merges"]["medians"],
        "per_round_sec": probe["bpe_train_5_merges"]["per_round_sec"],
        "segment_alpha_30_100":
            probe["bpe_train_5_merges"]["segment_alpha_30_100"],
        "first_merges_t100":
            probe["bpe_train_5_merges"]["first_merges"]["t100"],
        "verdict": "per-round alpha(30->100) %s — sublinear; 0.65 s per "
                   "round at 500k docs" % (
                       probe["bpe_train_5_merges"]["segment_alpha_30_100"]
                   ),
    },
    "semantic_dedup_cc_forest_r14": {
        "what": "A/B: plain label-propagation CC vs spanning-forest "
                "edge reduction (per-partition union-find) on the "
                "semantic_dedup workload (VERDICT r13 #8)",
        "plain_medians_sec": {s: ab[s]["plain"]["median"] for s in ab},
        "forest2_medians_sec": {s: ab[s]["forest2"]["median"] for s in ab},
        "survivors": {s: ab[s]["forest2"]["survivors"] for s in ab},
        "plain_alpha_30_100": round(
            math.log(ab["t100"]["plain"]["median"]
                     / ab["t30"]["plain"]["median"])
            / math.log(100 / 30), 3),
        "forest_alpha_30_100": round(
            math.log(ab["t100"]["forest2"]["median"]
                     / ab["t30"]["forest2"]["median"])
            / math.log(100 / 30), 3),
        "verdict": "t100 122.5s -> 52.6s (-57%), t30 35.1 -> 19.6s "
                   "(-44%), survivors exactly 2000 at every scale, "
                   "alpha 1.04 -> 0.82; forest_reduce_passes=2 is now "
                   "the semantic_dedup default (VERDICT target t100 "
                   "< 100s at alpha <= 0.873: landed)",
    },
    "geography_seam_r14": {
        "what": "antimeridian seam legs in spatial_join_geography (the "
                "r14 dateline fix): generated near-seam band (lon "
                "178..182 wrapped, lat 30-40), 1 km self-join at "
                "100k/1M/3M rows per side",
        "sides": seam["sides"],
        "alpha_rows_1_30": seam["alpha_1_30"],
        "pairs_ratio_30": seam["pairs_ratio_30"],
        "verdict": "seam legs present in the executed plan (%s Unions) "
                   "at every scale; 3M x 3M near-seam join finds %s "
                   "pairs in %ss; wall alpha(1->30 rows) %s while the "
                   "PAIR count grew %sx (quadratic) — the boundary-"
                   "strip design holds" % (
                       seam["sides"]["t30"]["seam_unions_in_plan"],
                       seam["sides"]["t30"]["pairs"],
                       seam["sides"]["t30"]["median_sec"],
                       seam["alpha_1_30"],
                       seam["pairs_ratio_30"],
                   ),
    },
}
with open(os.path.join(REPO, "SCALE_AUDIT_r14.json"), "w") as f:
    json.dump(out, f, indent=1)
print("wrote SCALE_AUDIT_r14.json")
