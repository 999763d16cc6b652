#!/usr/bin/env python3
"""Assemble BENCH_sf1.json reproducibly (dev-only tooling; the shipped
engine is the Scala tree under src/).

Runs the headline-query slice through graft.Bench at sf0.1 and at the
GenScale sf1 replica (full per-query artifacts via
SPARK_GRAFT_BENCH_OUT), runs graft.tools.GateCheck at both SFs for the
forced-path medians, and writes BENCH_sf1.json. SCALING.md's slope
table renders FROM that artifact (graft.tools.RenderScaling), so this
script is the one producer of every number in it.

Usage: python3 tools/mk_sf1.py  (from the repo root; ~15 min)
"""
import json
import os
import subprocess
import sys

QUERIES = [
    "q_beh_attribution", "q_cur_curriculum", "q_cur_epoch_shards",
    "q_cur_shuffle",
    "q_cur_upsample", "q_dedup_canonical", "q_dedup_crossmodal",
    "q_dedup_groups", "q_dedup_matrix", "q_dedup_semantic",
    "q_dedup_substring", "q_dedup_content_chunks",
    "q_dq_observe", "q_etl_cdf", "q_etl_cdf_bucketed", "q_etl_cdf_apply",
    "q_etl_cdf_apply_sum", "q_etl_cdf_apply_max", "q_etl_compact",
    "q_stream_mv",
    "q_etl_scale_cdc", "q_g1_triangles", "q_g2_pagerank",
    "q_g3_components", "q_g4_degrees", "q_g5_kcore", "q_g6_labelprop", "q_g7_ppr",
    "q_j12_asof_exec", "q_j7_asof", "q_knn_batch",
    "q_knn_hardneg", "q_knn_ivf", "q_knn_ivfpq", "q_knn_pca",
    "q_knn_filtered", "q_knn_hybrid", "q_cur_group_split", "q_cur_weighted_sample", "q_cur_stratified_pps",
    "q_sk_kmv", "q_src_jsonl", "q_src_jsonl_gz", "q_src_orc",
    "q_src_schema_evo",
    "q_stream_dedup_wm",
    "q_stream_join", "q_stream_join_rocksdb", "q_stream_jsonl",
    "q_stream_jsonl_gz",
    "q_stream_lsh_pairs",
    "q_stream_session", "q_stream_session_append",
    "q_stream_state_dedup", "q_stream_tumbling", "q_stream_tws_dedup",
    "q_text_bm25", "q_text_bpe_encode",
    "q_text_bpe_train", "q_text_cooc", "q_text_novelty", "q_text_tfidf",
    "q_text_vocab_oov", "q_text_repetition", "q_tpch_q18", "q_tpch_q21",
    "q_tpch_q3",
    "q_tpch_q5", "q_tpch_q8", "q_tpch_q9", "q_w_concurrency",
    "q_j13_smb_join", "q_src_partitioned", "q_stream_part_sink",
    "q_maint_compaction", "q_maint_mv_merge", "q_maint_skipping",
]

NOTE = (
    "Round-19 refresh: the slice completes the CDF/MV family's sf1 "
    "story - q_etl_cdf_apply_sum and q_etl_compact get their first "
    "recorded slopes (added to the slice in round 18 after that "
    "round's sweep), and the round-19 rows ride along: "
    "q_etl_cdf_bucketed (the zero-exchange feed, now with its own "
    "CORRECTNESS row), q_etl_cdf_apply_max (the MAX refresh decision "
    "kernel's forced-rescan branch), and q_stream_mv (continuous "
    "foreachBatch MV maintenance over a 3-version commit log). "
    "q_etl_compact stages 8 fragments (was 24) and pins the retain "
    "contract with n_rows_prev; Directory.compact now repartitions "
    "round-robin so the file count is structurally ceil(rows/target). "
    "Round-18 refresh: forced_paths gains cdf_plain/cdf_bucketed (the "
    "zero-exchange bucketed CDF A/B - classification equality asserted "
    "by GateCheck, plan pinned by BucketedCdfSpec) and carries per-path "
    "mins for every row. The slice gains q_etl_cdf_apply_sum (the "
    "retraction kernel's SUM twin) and q_etl_compact (oracle-gated "
    "snapshot-store compaction) from the sweep after the round-18 "
    "artifact. The render step is now --render-only: the sweep "
    "re-renders SCALING.md for ITS artifact without promoting whatever "
    "BENCH_LAST.json happens to be in the tree. "
    "Round-17 second refresh: the slice gains the snapshot-CDF family "
    "- q_etl_cdf (two-version change-data-feed, one dn-keyed "
    "full-outer join) and q_etl_cdf_apply (incremental MV maintenance "
    "with retractions: |MV| + |changes| work, never a table rescan) - "
    "and forced_paths gains per-path mins (GateCheck _mins), "
    "completing the min-next-to-every-median property across the "
    "whole artifact. "
    "Round-17 refresh: (1) per-row MIN alongside every median "
    "(sf01_min/sf1_min/slope_min, min-of-reps like BENCH_r16's mins "
    "map) so a contended sweep is adjudicable from this artifact "
    "alone - the round-16 end-of-round auto-re-sweep committed "
    "q_stream_session at 52.2 s (slope 24.18) with no in-artifact "
    "evidence it was contention; median >> min rows now self-report "
    "(slow_tail per SF). (2) mk_sf1.py now ends by invoking "
    "graft.tools.RenderScaling, so the artifact and SCALING.md's "
    "generated tables can never desync again, including under an "
    "automated re-sweep. (3) q_stream_session's replay drains in 2 "
    "triggers (was 4): the complete-mode final table - and the shared "
    "batch oracle - is trigger-count-invariant, but each trigger "
    "re-emits the whole accumulated session table, so the old count "
    "paid ~2x the write amplification the contrast row needs to "
    "demonstrate; the row still prices complete-mode re-emission "
    "against q_stream_session_append's emit-once shape. "
    "Round-16 second refresh: adds the table-maintenance / physical-"
    "layout family to the slice - q_j13_smb_join (sort-merge-bucket "
    "join: write-time bucketBy on both sides, zero exchanges below "
    "the join; the write is part of the op so the row prices "
    "write+join), q_src_partitioned (partitionBy-month sink + "
    "partition-pruned read), q_stream_part_sink (streaming "
    "date-partitioned file sink, exactly-once manifest), "
    "q_maint_compaction (metadata-scale "
    "bin-fill planner), q_maint_mv_merge (delta-slice partial-"
    "aggregate merge), q_maint_skipping (3-layout zone-map audit). "
    "Round-16 refresh: (1) recorded decision on the 26.5 s sf1 "
    "q_stream_join_rocksdb contrast row: KEPT as-is. The per-trigger-"
    "constant hypothesis was measured false (a 2-trigger drain via "
    "EventStream.readEvents' drainTriggers knob moved the row only "
    "26.5 -> 25.7 s), so the cost is RocksDB write-path work "
    "proportional to state volume - the exact deployment trade the "
    "A/B prices against the HDFS-heap q_stream_join row; cutting its "
    "data would cut the evidence, and the shared trigger schedule "
    "keeps the A/B like-for-like. (2) forced_paths gains "
    "pagerank10r_local/_distributed: 10 forced rounds of the "
    "exchange-free iteration, crossing the new iterPersistEvery=8 "
    "plan-depth persist boundary (GraphOps.pagerankN; bit-equality "
    "with the 10-round CSR kernel asserted in GateCheck) - near-linear "
    "cost vs the 3-round pagerank_distributed row is the measured "
    "multi-round point for the one-combinable-shuffle-per-round "
    "claim. "
    "Round-15 refresh: the labelprop/pagerank/ppr distributed "
    "iterations restructured onto persisted key-partitioned graph "
    "frames with exchange-free per-round joins (PlanShapeSpec pins the "
    "plan shape; see SCALING.md's graph section) - labelprop's forced "
    "sf1 row drops from the round-14 outlier into family with the "
    "other graph twins. forced_paths also gains bpe local+distributed "
    "rows: the BPE trainer was the one remaining budget gate "
    "(graft.bpe.localWords) without forced sf1 pricing - the fixture "
    "vocabularies never cross the 500k-word budget, so GateCheck now "
    "forces both sides and asserts the merge tables identical (the "
    "dedup CC loop shares the components rows' graft.cc.localEdges "
    "path). No new queries this round. "
    "Round-14 refresh: adds q_text_repetition (intra-document "
    "repetition signals - zero-shuffle row-local expressions) and "
    "q_stream_join_rocksdb (the stream-stream "
    "join under the RocksDB state-store provider with changelog "
    "checkpointing and numRowsTotal tracking off - the tuned "
    "production deployment settings, see SCALING.md - pricing the "
    "provider swap against the HDFS-store q_stream_join row), re-prices "
    "q_text_bm25/q_knn_hybrid on the round-13/14 capped integer "
    "arithmetic, and extends forced_paths with ppr/kcore/labelprop "
    "local+distributed rows (GateCheck now forces BOTH sides of every "
    "broadcast-edge-budget gate). "
    "Round-12 base (62 headline queries; the round-12 additions in "
    "the sweep: asof-exec vs window asof, labelprop, kcore, ivfpq, pca, "
    "kmv, tws dedup, concurrency, novelty, cross-source matrix, "
    "attribution, streaming LSH, BM25, group split, filtered ANN, ORC, "
    "schema-evolution read, systematic PPS weighted sampling, RRF hybrid retrieval, content-defined chunking, personalized pagerank, per-stratum PPS, observed-metrics telemetry, "
    "and the fact-broadcast-inversion TPC-H rows q3/q5/q8). "
    "sf1 = 10x sf0.1 via graft.tools.GenScale (shard-replicated, "
    "disjoint key ranges). Medians of 3 timed reps after one untimed "
    "warm-up, storage drop + GC drain outside each timed window, "
    "local[32], same Bench config as BENCH_LAST; assembled by "
    "tools/mk_sf1.py. Round-12 changes measured here: (1) TPC-H Q21's "
    "EXISTS decorrelated to a countDistinct multi-supplier "
    "pre-aggregation - the fact-wide inequality-semi build (slope 4.5) "
    "is gone; (2) the graph family's affinity edge list is derived once "
    "per session (GraphOps.affinityEdges memo) with the pair expansion "
    "in a native kernel (SortedPairsExpr) - the per-query graph rows "
    "now price the analytics, and the derive-once cost is priced by the "
    "forced_paths edges_build row; (3) substring-overlap dedup "
    "restructured to one grouped pass (WindowHash64Expr kernel + "
    "size-capped sorted collect) - one token-wide shuffle instead of "
    "three; (4) semantic dedup's quantizer is TRAINED k-means (2 exact "
    "integer Lloyd rounds, memoized per corpus) - recall vs first-k "
    "seeds gated >= by SemanticQuantizerSpec (round-12 sf0.01 run: 189 "
    "vs 165 dup witnesses); (5) the driver-side graph kernels "
    "(labelprop/pagerank/triangles/kcore) moved onto one primitive CSR "
    "adjacency - the boxed-Map solves were the top of the previous "
    "slope table (labelprop 12.4x) despite trivial plans - and the "
    "local-triangle budget re-sized to 2M edges for the 10x-faster "
    "kernel; (6) the fact-broadcast estimate inversion fixed across "
    "q3/q5/q8/q9/q10 (stats broadcast a full fact against the reduced "
    "side; each site now co-shuffles with the reduced side as build, "
    "plan-pinned). forced_paths times the budget-gated graph "
    "operators with BOTH gate sides forced (graft.tools.GateCheck, same "
    "rep protocol): the *_distributed rows are the plans that run at "
    "100 TB, and edges_build is the memo-bypassed one-time derivation. "
    "NOTE on forced-local rows: with the round-12 edge-list memo the "
    "forced rows time the SOLVE alone (derivation excluded), so the "
    "*_local slopes expose the driver-solve's true growth - exactly why "
    "the budget gate flips to the distributed plans at scale; "
    "all_under_12x refers to the headline query slopes."
)

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.bench/sf1"


def run_bench(sfdir, out):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
               SPARK_GRAFT_BENCH_OUT=out)
    print(f"[mk_sf1] bench {sfdir} ...", flush=True)
    log = out + ".log"
    with open(log, "w") as lf:
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                       check=True, stdout=lf, stderr=subprocess.STDOUT)
    if not os.path.exists(out):
        sys.exit(f"bench at {sfdir} wrote no {out} - see {log} "
                 "(BENCH_OUT write failure is only reported there)")
    with open(out) as f:
        return json.load(f)


def run_gatecheck(sfdir):
    print(f"[mk_sf1] gatecheck {sfdir} ...", flush=True)
    p = subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.GateCheck {sfdir}"],
        capture_output=True, text=True, check=True)
    for line in p.stdout.splitlines():
        if "GATECHECK_JSON" in line:
            return json.loads(line.split("GATECHECK_JSON ", 1)[1])
    sys.exit(f"no GATECHECK_JSON line from GateCheck at {sfdir}")


def main():
    a01 = run_bench(SF01, "/tmp/graft_sf01_sweep.json")
    a1 = run_bench(SF1, "/tmp/graft_sf1_sweep.json")
    if a01["failed"] or a1["failed"]:
        sys.exit(f"failed queries: {a01['failed']} / {a1['failed']}")
    g01 = run_gatecheck(SF01)
    g1 = run_gatecheck(SF1)
    sf01, sf1 = a01["queries"], a1["queries"]
    # per-row min-of-reps (the plan's floor) from the full artifact's
    # spread map - the same self-diagnosis BENCH_r16 added for sf0.1:
    # a contended sweep shows median >> min on unchanged plans, a real
    # regression moves both together. Adjudicable from this file alone.
    m01 = {k: v[0] for k, v in a01["spread"].items()}
    m1 = {k: v[0] for k, v in a1["spread"].items()}

    # ratio maps with a zero-denominator guard: per-row values come
    # from the artifact's r3-rounded maps, so a sub-0.5 ms rep
    # serializes as 0.000 and a bare division would abort the whole
    # ~15-minute double sweep at the very end; skip + log instead
    def slopes(num, den, tag):
        out, dropped = {}, []
        for k in sorted(den):
            if k in num and den[k] > 0:
                out[k] = round(num[k] / den[k], 2)
            else:
                dropped.append(k)
        if dropped:
            print(f"[mk_sf1] {tag}: dropped zero/missing-denominator "
                  f"rows: {dropped}", flush=True)
        return out

    slope = slopes(sf1, sf01, "slope")
    slope_min = slopes(m1, m01, "slope_min")
    fp01 = {k: v for k, v in g01.items() if k not in ("sf", "_mins")}
    fp1 = {k: v for k, v in g1.items() if k not in ("sf", "_mins")}
    fslope = slopes(fp1, fp01, "forced slope")
    # forced-path mins (round 17: GateCheck emits them nested so this
    # stays backward-compatible with a pre-round-17 GateCheck build)
    fm01, fm1 = g01.get("_mins", {}), g1.get("_mins", {})
    fslope_min = slopes(fm1, fm01, "forced slope_min")
    out = {
        "metric": "scaling_slope_sf0.1_to_sf1",
        "unit": "sec",
        "note": NOTE,
        "sf01": sf01,
        "sf1": sf1,
        "sf01_min": m01,
        "sf1_min": m1,
        "slope": slope,
        "slope_min": slope_min,
        "slow_tail": {"sf01": a01.get("slow_tail", []),
                      "sf1": a1.get("slow_tail", [])},
        "forced_paths": {"sf01": fp01, "sf1": fp1, "slope": fslope,
                         "sf01_min": fm01, "sf1_min": fm1,
                         "slope_min": fslope_min},
        "max_slope": max(slope.values()),
        "max_slope_min": max(slope_min.values()),
        "max_forced_slope": max(fslope.values()),
        "all_under_12x": all(v < 12 for v in slope.values()),
        "all_under_12x_min": all(v < 12 for v in slope_min.values()),
    }
    with open("BENCH_sf1.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    # artifact -> doc atomically: the round-16 end-of-round auto-sweep
    # overwrote BENCH_sf1.json without re-rendering and shipped a red
    # ScalingDocSpec; rendering HERE makes desync structurally
    # impossible for every future producer of this artifact.
    # --render-only: the sweep must NOT promote — a default render
    # would copy any untracked BENCH_LAST.json (possibly a stale or
    # contended full-fleet run) over the committed BENCH_DOC.json as a
    # side effect; promotion stays an explicit act after a quiet
    # full-fleet bench.
    print("[mk_sf1] wrote BENCH_sf1.json; rendering SCALING.md ...",
          flush=True)
    subprocess.run(["sbt", "-batch",
                    "runMain graft.tools.RenderScaling --render-only"],
                   check=True)
    print("[mk_sf1] BENCH_sf1.json + SCALING.md consistent")


if __name__ == "__main__":
    main()
