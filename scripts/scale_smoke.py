#!/usr/bin/env python
"""Scale-smoke for the dedup/ANN candidate generators: synthesize an
N× documents+embeddings corpus, run the banded-join pipelines at both
scales, and report wall clock + candidate/output rows + shuffle bytes.

Replication must not fabricate cross-replica near-duplicates, or the
OUTPUT (pair lists) grows quadratically by data construction and the
measurement says nothing about the algorithm:

- documents: each replica gets a per-(replica, doc_id) deterministic
  word shuffle — a permuted word sequence shares almost no word
  n-grams with the original, so shingle/MinHash candidates stay
  within a replica — PLUS a per-replica suffix tag on a deterministic
  third of the words: SimHash fingerprints are bag-of-words-invariant
  (a shuffle alone leaves them identical, which merged clusters
  10-fold and grew d4b's pair output 101× in the first measurement),
  so the token SET itself must differ across replicas for the
  true-pair count to scale linearly.
- embeddings: each replica multiplies dimensions by an md5-derived
  ±1 sign vector — norm-preserving, and distinct replicas get
  ~orthogonal sign patterns, so cross-replica cosines collapse toward
  0 regardless of any structure in the corpus (a cyclic roll was
  measured insufficient: rolled copies of this corpus stayed
  near-duplicates and inflated v4's pair output 104×).

IDs shift by ``replica * (max_id + 1)`` so joins never collide.

Usage:
    python scripts/scale_smoke.py [--sf-dir /root/testdata/sf0.1]
        [--replicas 10] [--out /tmp/scale_smoke_10x] [--runs 2]

Prints one JSON line per query per scale, then a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "d3_minhash_lsh_pairs",
    "d2b_jaccard_capped_shingles",
    "d4b_simhash_pairs",
    "v4_srp_lsh_pairs",
    "v4_srp_bits8",  # smoke-only: index width scaled for the 10x corpus
    "v4b_srp_multiprobe",  # 8-bit buckets + Hamming-1 probe (recall recovery)
    "x1_text_quality",
    "d5_dedup_clusters",
    # r3 additions: the shard-prep composite (fixed token budget → the
    # BUDGETED output stays ~constant; the wall measures the full
    # gate/dedup pipeline over the grown corpus) and batch retrieval
    "c1_training_prep",
    "v5_batch_topk",
    # r4 additions: lexical retrieval (word-count shuffle shapes),
    # decontamination (broadcast semi-join vs a probe set that grows
    # with the corpus here), deterministic sampling (pure scan filter),
    # repetition signals (in-row grams + keyed top-word agg), and the
    # int8-quantized ANN shortlist
    "x6_tfidf_topk",
    "x7_bm25_search",
    "d6_decontamination",
    "c2_stratified_sample",
    "x8_repetition_signals",
    "v6_sq_topk",
    "x9_vocab_stats",
    "c3_curation_record",
    "v7_embedding_outliers",
    "c5_quality_audit",
    "c6_mixture_report",
    # r6 additions: the stateful-registry replays (two ingests against a
    # throwaway registry; within/cross-batch anti-joins + hash-prefix
    # partition pruning are the scale surface) and the amortized PQ read
    # path (codebooks memoized after the first call)
    "i1_incremental_dedup_replay",
    "i2_incremental_lsh_replay",
    "v8b_pq_query_path",
    # r6 additions (late): corpus segment-dedup rewrite (segment-keyed
    # window + per-doc rebuild), bigram LM (two count shuffles + pair
    # join), merit-ordered budget selection (range shuffle + offsets)
    "d7_segment_dedup_rewrite",
    "x14_bigram_logprob",
    "c12_quality_budget_select",
    # two-pass sketch top-k (bounded summaries + candidate recount) and
    # the keyed-window count sampler
    "x15_heavy_hitters",
    "c13_per_group_sample",
    # r6 addition: nucleus selection (two keyed windows on one exchange;
    # output grows with the corpus since it keeps a MASS fraction)
    "c14_top_p_select",
    # r7 additions (VERDICT r6 item 5): the events-table sync/
    # regularization family — the corpus now replicates events too
    # (user_id-shifted replicas; every query here partitions by
    # user_id, so work scales in #keys with no cross-replica
    # interference; j12's cross-user overlap join keeps a fixed top-20
    # reference side, so its output also grows linearly)
    "j10_cdc_apply",
    "j11_snapshot_diff",
    "j12_interval_overlap",
    "w11_scd2_intervals",
    "t10_gap_fill_ffill",
    "t11_time_weighted_avg",
    # r7 additions: sessionized funnel + retention cohorts (events,
    # user-keyed → linear), the ANN recall-verdict (one 10×N cosine
    # pass + k-means), and the streaming dedup replay (state bounded
    # by the horizon; two AvailableNow runs of fixed cost)
    "t12_funnel_conversion",
    "a17_retention_cohorts",
    "v10_ivf_recall_verdict",
    "i5_stream_dedup_replay",
    # r7 cont.: SCD2 lookup (as-of reduction), EWMA + rolling median
    # (keyed daily-grid windows), DSIR scoring (two broadcast LMs),
    # weighted sampling (k-bounded top-k)
    "j14_scd2_lookup",
    "w12_ewma_halflife",
    "w13_rolling_median_7d",
    "x16_dsir_importance",
    "c15_weighted_sample",
    "d8_containment_pairs",
    "t13_seasonal_naive_backtest",
    # r7: versioned-CDC two-batch replay (events; change-window + key
    # join per batch, parquet roundtrip between batches)
    "i7_cdc_versioned_replay",
    # r7: power iteration over the event graph (3 × join+agg rounds)
    "g1_pagerank",
    # r8 (VERDICT r7 item 3): the 9 r7 entries measured plan-only so
    # far — CUBE grouping sets (orders), exact percentile bands
    # (lineitem; the cost IS the per-group sort), mergeable HLL rollup
    # (events; daily sketches → weekly union, no rescan), MMR re-rank
    # + memoized-IVF serving (embeddings), CSV roundtrip (nation),
    # CUSUM / lag-1 autocorrelation / seasonal decomposition (events,
    # keyed daily-grid windows)
    "a18_cube_volumes",
    "a19_percentile_bands",
    "a20_sketch_rollup",
    "o7_mmr_rerank",
    "v10b_ivf_query_path",
    "s8_csv_roundtrip",
    "t14_cusum_drift",
    "t15_autocorr_lag1",
    "w14_seasonal_decompose",
    # r8 additions: salted hot-key aggregate / salted skew join
    # (events + nation; the hot key grows 10× and must spread over the
    # fixed 16 salt buckets) and the block-carry EWMA (events)
    "k1_salted_hot_key_agg",
    "k2_salted_skew_join",
    "w15_ewma_blocked",
    # r8: Bloom decontamination — the probe set (doc_id % 23 == 0)
    # grows with the corpus here, but the positions artifact is
    # capped at m_bits rows, so the broadcast side stays bounded
    "d9_bloom_decontaminate",
    # r8: co-bucketed fact-fact join (orders/lineitem replicas; the
    # bucketed write is memoized per corpus, best-of-2 records the
    # exchange-free join read)
    "j15_bucketed_colocated_join",
    # r8: custom-stateful-operator replay (events; user-keyed state,
    # two AvailableNow runs of fixed cost + per-key O(1) state)
    "i8_stream_runs_replay",
    # r8: RRF hybrid fusion (documents + embeddings; both rankings
    # k-bounded before the fuse, so only the input scans grow)
    "o8_rrf_hybrid",
    # r9: graph family — the node space is BOUNDED (1009 slots) by
    # design, so 10× events saturate the edge generators and the wall
    # should flatten: cost scales with the edge scan, never with the
    # closure (the claim under test)
    "g2_connected_components",
    "g3_bfs_hops",
    # r9: HDR quantile sketch (events; 10× users → 10× bounded
    # sketches, one map-side-combinable groupBy + tiny windows),
    # z-order tile rollup (events; output fixed at 256 tiles),
    # schema-evolution roundtrip (orders; two writes + merged read),
    # Holt grouped-map smoothing (events; 10× independent user groups)
    "a21_hdr_quantile_sketch",
    "z1_zorder_layout",
    "s9_schema_evolution",
    "t16_holt_linear",
    # r9: trigram backoff (documents; three LM count shuffles + the
    # n-gram-keyed scoring joins — the x14 shape one level up) and
    # nDCG eval (documents + embeddings; both rankings k-bounded, so
    # only the input scans grow)
    "x17_trigram_backoff",
    "o9_ndcg_eval",
    # r9 cont.: triangle counting (bounded 1009-node space like g2 —
    # 10× events saturate the generators, wall should flatten);
    # count-min sketch (documents; cells capped at 4×1024 whatever the
    # token volume — the build scan is the only thing that grows);
    # temperature mix (documents; one keyed agg, stratum-cardinality
    # output); sliding distinct users (events; the explode is 7× the
    # DEDUPED user-day pairs, not the event stream); partition-pruned
    # scan (events; the pruned week is a fixed fraction of the month,
    # so the read grows with the slice, the layout write with volume)
    "g4_triangle_count",
    "a22_countmin_sketch",
    "c16_temperature_mix",
    "w16_sliding_distinct_users",
    "s10_partition_pruned_scan",
    # r9: left-outer stream join replay (events; state bounded by
    # watermark + gap both sides like i4 — the fixed state-store setup
    # dominates at replay scale, so the wall should be near-flat)
    "i9_stream_outer_join_replay",
    # r9: Holt-Winters grouped-map (events; 10× independent user
    # groups like t16 — one exchange, then parallel per-key scans)
    "t17_holt_winters",
    # r9: k-core peeling (bounded 1009-node space; 10× saturates the
    # dense generator so the peel converges in ROUND 1 — wall should
    # flatten like g2/g4)
    "g5_kcore",
    # r9: Heaps fit (documents; the prefix sums are over PER-DOC rows,
    # the heavy shuffle is the term-keyed first-seen agg — linear);
    # keyset page (orders; filter + top-k, output fixed at 20)
    "x18_heaps_law",
    "o10_keyset_pagination",
    # r9: PERMISSIVE JSON parse (events; pure in-row assemble + parse,
    # zero shuffles — wall tracks the scan)
    "s11_corrupt_tolerant_json",
    # r9: Theil-Sen (events; pairwise join quadratic IN THE GROUP but
    # the group is calendar-bounded, so 10× users = 10× groups, linear)
    "m16_theil_sen",
    # r9: Bloom-pruned join (orders/lineitem replicas; the positions
    # broadcast grows with the DIM subset, the fact never shuffles
    # before the prune — wall should track the two scans)
    "j16_bloom_pruned_join",
    # r9: HLL audience overlap (events; sketches are bounded artifacts,
    # wall tracks the two filtered scans)
    "a23_hll_audience_overlap",
    # r10: KS drift (events; ties collapse to distinct value points —
    # the prefix-sum input grows sublinearly as replicas re-hit the
    # same value grid); PSI (documents; lang×bin agg — bounded output);
    # token entropy (documents; explode + two keyed aggs, linear);
    # prefix-dim rerank (embeddings; first pass scans 16/64 dims of
    # the grown corpus, shortlist fixed at 50); LPA communities
    # (events; bounded 1009-node space like g2 — wall should flatten)
    "a24_ks_two_sample",
    "c17_psi_drift",
    "x19_token_entropy",
    "v11_prefix_dim_rerank",
    "g6_label_propagation",
    # r10 cont.: Zipf fit (documents; vocab-sized rank input — already
    # sublinear by Heaps' own fit); weighted median (lineitem; keyed
    # agg + per-group window); rolling correlation (events; one
    # user-keyed exchange, bounded 14-row frames)
    "x21_zipf_fit",
    "a25_weighted_median",
    "w18_rolling_corr",
    # r10 cont.: image aHash near-dup (documents; assembly+decode are
    # in-row Arrow batches, pairing is the d4b banded equi-join —
    # replicas share the doc_id%4 family structure shifted by id, so
    # true pairs stay within a replica and scale linearly)
    "mm6_image_ahash_neardup",
    # r10 cont.: cluster-safe split (documents; d3 pair graph + CC
    # rounds dominate — both already measured; the split is in-row)
    "c18_cluster_safe_split",
    # r10 cont.: stream-static enrichment replay (events; the
    # state-store fixed cost dominates like i3/i9 — wall near-flat)
    "i10_stream_static_enrich_replay",
    # r10 cont.: KWIC snippets (documents; ranking scan grows, the
    # snippet join is k-bounded at 10 rows)
    "o12_kwic_snippets",
    # r10 cont.: audio near-dup (documents; same shape as mm6 — linear
    # assemble+decode, banded pair join)
    "mm7_audio_energyhash_neardup",
    # r10 cont.: higher moments (events; one keyed agg — flat) and
    # Mann-Kendall (events; m16's calendar-bounded pair-join shape)
    "a28_higher_moments",
    "t18_mann_kendall",
    # r10 cont.: langid eval (documents; in-row scorer + class aggs)
    "x23_langid_eval",
    # r11: calibration eval (documents; in-row scorer + 10-row bin agg
    # — the x23 shape, output fixed at the bin count)
    "x24_calibration_ece",
    # r11: AUC eval (documents; in-row scorer -> score histogram ->
    # prefix sum over score-cardinality rows; output one row)
    "x25_auc_discrimination",
    # r11: Poisson bootstrap (events; 32 in-row weights per row, agg
    # collapses to types x 32 — wall tracks the 32x weight compute)
    "a29_poisson_bootstrap",
    # r11: MRR/hit serving audit (embeddings; FIXED 10-query benchmark
    # set broadcast against the corpus — eval linear in N)
    "o13_mrr_hit_eval",
    # r11: isotonic calibration (documents; the x24 scan + bounded
    # B^2 segment algebra — wall tracks the scan)
    "m17_isotonic_calibration",
    # r11: split-leakage audit (documents; d3 pair graph + CC + two
    # pair-classification joins — the c18 shape plus bounded joins)
    "c19_split_leakage_audit",
    # r11: Good-Turing (documents; vocab agg -> frequency histogram —
    # the x9 shape, output fixed at 10 rows)
    "x28_good_turing",
    # r11: sliding distinct via daily HLL (events; one scan -> 30
    # daily sketches -> 7-row unions; day count fixed)
    "w19_sliding_distinct_hll",
    # r11: effective-token report (documents; d3 pairs + CC + in-row
    # token counts -> one row)
    "c20_effective_tokens",
    # r11: hot-key report (events; keyed count agg -> top-10 of a
    # key-cardinality frame)
    "k3_hot_key_report",
    # r11: trimmed mean (events; one keyed exchange shared by the
    # rank window and the agg)
    "a31_trimmed_mean",
    # r11: seasonal strength (events; the w14 user-keyed exchange +
    # per-user moment agg — output = user count)
    "t19_seasonal_strength",
    # r11: norm-pruned MIPS (embeddings; bound pass + contender dots;
    # prune honestly ~0 on random embeddings, reported per run)
    "v12_mips_norm_pruned",
    # r11: mixture allocator (documents; one supply scan -> 5-row
    # water-filling algebra)
    "c21_mixture_waterfill",
    # r12: generation-diversity audit (documents; n-gram explode ->
    # two keyed aggs -> source-cardinality report)
    "x29_distinct_ngram_diversity",
    # r12: unigram JS drift (documents; vocab aggs -> sources x vocab
    # contribution frame -> source-cardinality report)
    "x30_unigram_js_source_drift",
    # r12: tokenizer fertility (documents; in-row BPE projection ->
    # lang-keyed agg, output = language cardinality)
    "x31_tokenizer_fertility",
    # r12: degree power-law (events; degree agg -> fof agg -> top-10
    # of the degree-cardinality frame)
    "g7_degree_powerlaw",
    # r12: leave-last-out temporal split (events; one user-keyed
    # exchange -> 2-row split report + certificate)
    "c22_leave_last_out_split",
    # r12: winsorized mean (events; the a31 one-exchange rank window
    # with tail clamp)
    "a32_winsorized_mean",
    # r12: changepoint (events; one user-keyed exchange, prefix-sum
    # closed-form gains + argmax)
    "t20_binary_segmentation",
    # r12: range-partition planner (orders; cell histogram -> bounded
    # crossing-cell selection -> in-row bucket assignment)
    "k4_range_partition_planner",
    # r12: source-contamination matrix (documents; distinct grams ->
    # gram-keyed self-join bounded by source-count^2 fanout)
    "c23_source_contamination_matrix",
    # r12: PMI collocations (documents; in-row bigrams -> one (w1,w2)
    # groupBy; c1/c2/T derived from the bigram-cardinality frame)
    "x32_pmi_collocations",
    # r12: MAD robust scale (events; one keyed exchange, two rank
    # windows on the same partitioning + broadcast medians)
    "a33_mad_robust_scale",
    # r12: MAP/P/R serving audit (embeddings; the o13 fixed-query
    # broadcast shape — eval linear in N)
    "o14_map_precision_recall",
    # r12: HITS (events; 6 half-steps of node-keyed join + DECIMAL
    # agg over the g1 graph — work scales with the edge scan)
    "g8_hits",
    # r12: Ljung-Box (events; one user-keyed exchange: daily agg +
    # centering window + 7 LAGs + moment agg)
    "t21_ljung_box",
    # r12: kappa (documents; the x23 in-row scorer + class-
    # cardinality aggs + 1-row integer reduction)
    "x33_judge_agreement_kappa",
    # r12: BH-FDR (events; t15 one-exchange kernel + BH on the
    # key-cardinality frame in one bounded window)
    "t22_bh_fdr",
    # r12: centroid drift (embeddings; posexplode -> (label,dim)
    # agg, then label-count^2 pair algebra on the centroid frame)
    "v13_centroid_drift_matrix",
    # r12: minhash calibration (documents; d3 banded candidates +
    # candidate-only exact shingle verify join)
    "d11_minhash_calibration",
    # r12: grouped mode (events; (key,category) groupBy then rank on
    # the category-cardinality frame, one data-sized exchange)
    "a35_grouped_mode",
    # r12: context-budget curve (documents; one scan, broadcast x4
    # context fanout, 4-group partial-agg reduction)
    "c25_context_budget_curve",
    # r12: scene cuts (documents; Arrow 1->N demux fan-out + in-row
    # byte fold + one video-keyed lag window)
    "mm8_scene_cuts",
    # r12: Gopher rule verdicts (documents; one scan, all flags
    # in-row, zero shuffles)
    "x34_gopher_quality_rules",
    # r12: seasonal MK (events; (user, weekday)-keyed bounded pair
    # join + integer variance numerators)
    "t23_seasonal_mann_kendall",
    # r12: Bradley-Terry (events; lag-window comparisons collapse to
    # the item-pair matrix; 5 MM steps of bounded algebra)
    "o15_bradley_terry_strengths",
]


def _v4_bits8(spark, sf_dir):
    """SRP-LSH with an 8-bit bucket (256 buckets/table vs the catalog
    query's 16): bucket width must grow ~log2(N) or random collisions
    make the candidate set quadratic — the 10x lesson under test."""
    from garmin_performance_analysis_spark.pipelines.similarity import srp_lsh_pairs
    from garmin_performance_analysis_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return srp_lsh_pairs(emb, "vec_id", "embedding", dim=64, tables=4, bits=8, threshold=0.4)


def synthesize(sf_dir: str, out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    doc_stride = int(docs["doc_id"].max()) + 1
    vec_stride = int(emb["vec_id"].max()) + 1

    doc_parts = []
    for r in range(replicas):
        part = docs.copy()
        part["doc_id"] = part["doc_id"] + r * doc_stride
        if r > 0:
            def shuffle_words(row):
                words = row["text"].split()
                rng = np.random.RandomState((r * 1_000_003 + int(row["doc_id"])) % (2**31))
                rng.shuffle(words)
                # decorrelate order-invariant token-set signatures too
                # (crc32: deterministic across processes, unlike hash())
                words = [
                    w if (zlib.crc32(w.encode()) + r) % 3 else f"{w}~{r}"
                    for w in words
                ]
                return " ".join(words)

            part["text"] = part.apply(shuffle_words, axis=1)
        doc_parts.append(part)
    big_docs = pd.concat(doc_parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big_docs, preserve_index=False),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb_parts = []
    for r in range(replicas):
        part = emb.copy()
        part["vec_id"] = part["vec_id"] + r * vec_stride
        if r > 0:
            import hashlib

            dim = len(emb["embedding"].iloc[0])
            signs = np.array(
                [
                    1.0
                    if hashlib.md5(f"{r}:{i}".encode()).hexdigest()[0] in "01234567"
                    else -1.0
                    for i in range(dim)
                ],
                dtype=np.float32,
            )
            part["embedding"] = part["embedding"].map(
                lambda v: (np.asarray(v, dtype=np.float32) * signs).tolist()
            )
        emb_parts.append(part)
    big_emb = pd.concat(emb_parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big_emb, preserve_index=False),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    # events: replicate by shifting user_id (every sync-family query
    # partitions by user_id, so replicas never interact) and event_id
    # by a multiple of lcm(2,3,10)=30 so the parity/modulo classes the
    # CDC/diff queries carve (event_id%2 base/changes, %3 snapshots,
    # %10 tombstones) are IDENTICAL in every replica.  Timestamps stay
    # as-is: per-user day spans and session shapes repeat per replica,
    # which is exactly the many-more-keys axis a 100 TB event store
    # grows along.
    events = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    epdf = events.to_pandas()
    user_stride = int(epdf["user_id"].max()) + 1
    event_stride = ((int(epdf["event_id"].max()) // 30) + 1) * 30
    ev_parts = []
    for r in range(replicas):
        part = epdf.copy()
        part["user_id"] = part["user_id"] + r * user_stride
        part["event_id"] = part["event_id"] + r * event_stride
        ev_parts.append(part)
    big_ev = pd.concat(ev_parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big_ev, preserve_index=False).cast(events.schema),
        os.path.join(out_dir, "events.parquet"),
    )

    # orders/lineitem/nation (r8): the a18 CUBE, a19 exact-percentile
    # bands, and s8 CSV roundtrip read these.  Keys shift by replica
    # stride (l_orderkey uses the ORDERS stride so order↔lineitem joins
    # stay consistent); the low-cardinality dimension columns (status,
    # priority, returnflag…) repeat per replica, so grouped outputs
    # keep the same groups with 10× the rows — the rollup axis a
    # 100 TB fact table actually grows along.  Nation keys shift by 25;
    # only replica 0 matches the fact-side key domain (inner joins are
    # unaffected), while s8's export grows 10×.
    for tbl, key_cols in (
        ("orders", ["o_orderkey"]),
        ("lineitem", ["l_orderkey"]),
        ("nation", ["n_nationkey"]),
    ):
        t = pq.read_table(os.path.join(sf_dir, f"{tbl}.parquet"))
        tp = t.to_pandas()
        if tbl == "nation":
            stride = 25
        elif tbl == "orders":
            stride = int(tp["o_orderkey"].max()) + 1
            orders_stride = stride
        else:
            stride = orders_stride  # keep l_orderkey aligned with orders
        parts = []
        for r in range(replicas):
            part = tp.copy()
            for kc in key_cols:
                part[kc] = part[kc] + r * stride
            parts.append(part)
        big = pd.concat(parts, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(big, preserve_index=False).cast(t.schema),
            os.path.join(out_dir, f"{tbl}.parquet"),
        )


def run(sf_dir: str, label: str, runs: int, spark) -> list[dict]:
    from garmin_performance_analysis_spark.harness.catalog import CATALOG
    from garmin_performance_analysis_spark.plans import checks

    results = []
    for name in QUERIES:
        fn = _v4_bits8 if name == "v4_srp_bits8" else CATALOG[name].fn
        best = float("inf")
        for _ in range(runs):
            # fn() INSIDE the timer: replay-style entries (i1/i2) run
            # their work eagerly at call time and return a checkpointed
            # frame — timing only the force would record ~0 for them
            # (same protocol as bench.py)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        df = fn(spark, sf_dir)
        rec = {
            "query": name,
            "scale": label,
            "wall_sec": round(best, 3),
            "out_rows": df.count(),
            # static plan property: scale-INDEPENDENT shuffle count is
            # the claim under test (same plan shape at both scales)
            "n_exchanges": checks.count_shuffles(df),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_smoke_10x")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--only",
        default="",
        help="comma-separated substring filters; run only matching queries",
    )
    args = ap.parse_args()
    if args.only:
        pats = [s for s in args.only.split(",") if s]
        QUERIES[:] = [q for q in QUERIES if any(p in q for p in pats)]

    manifest_path = os.path.join(args.out, "manifest.json")
    # corpus v3 adds orders/lineitem/nation (a18/a19/s8/k2 need them)
    manifest = {
        "sf_dir": os.path.abspath(args.sf_dir),
        "replicas": args.replicas,
        "corpus_version": 3,
    }
    cached = None
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            cached = json.load(fh)
    if cached != manifest or not all(
        os.path.exists(os.path.join(args.out, f"{t}.parquet"))
        for t in (
            "documents", "embeddings", "events", "orders", "lineitem", "nation"
        )
    ):
        # manifest mismatch = stale corpus from a different sf_dir or
        # replica count; silently reusing it would mislabel every row
        print(f"synthesizing {args.replicas}x corpus into {args.out}...", flush=True)
        synthesize(args.sf_dir, args.out, args.replicas)
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)

    from garmin_performance_analysis_spark.session import get_spark

    spark = get_spark("scale-smoke")
    base = run(args.sf_dir, "1x", args.runs, spark)
    big = run(args.out, f"{args.replicas}x", args.runs, spark)

    print(f"\n{'query':32s} {'1x wall':>8s} {'Nx wall':>8s} {'ratio':>6s} "
          f"{'1x rows':>9s} {'Nx rows':>9s} {'1x exch':>7s} {'Nx exch':>7s}")
    for b, g in zip(base, big):
        ratio = g["wall_sec"] / b["wall_sec"] if b["wall_sec"] else float("nan")
        print(
            f"{b['query']:32s} {b['wall_sec']:8.2f} {g['wall_sec']:8.2f} "
            f"{ratio:6.1f} {b['out_rows']:9d} {g['out_rows']:9d} "
            f"{b['n_exchanges']:7d} {g['n_exchanges']:7d}"
        )


if __name__ == "__main__":
    main()
