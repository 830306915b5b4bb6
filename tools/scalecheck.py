#!/usr/bin/env python3
"""Standing per-round 10x scale gate -> SCALECHECK_rN.json (round-9
directive #2: the full-suite 10x rehearsal ran once, by hand, in round 9;
this makes it a per-round artifact the judge can diff like CORRECTNESS).

Pipeline (all steps resumable via --skip-* flags):
  0. `tools/datacheck.py --round N` — the testdata contract preflight
     (r10's events.ts NANOS->MICROS flip class). A contract change
     aborts the run before any JVM starts.
  1. `sbt Test/runMain graft.tools.SuiteRehearsal --json` — synthesizes
     the 10x tier (10 id-shifted copies of every scalable sf0.1 table),
     runs all 82 queries at sf0.1 AND 10x through the adaptive executor,
     records per-query timings and final-plan operator-histogram diffs.
  2. `graft.Verify <tier10x>` over all tractable-oracle queries in ONE
     fresh JVM (fresh relative to the rehearsal so q28's
     fit-at-verify-time stash sees exactly one sfDir and stays
     unambiguous), then `tools/check_oracle.py` replays the oracles in
     DuckDB at 10x (one fresh DuckDB connection per oracle).
  3. Merge into SCALECHECK_rN.json: per query
       tenx_ran / sf01_s / tenx_s / plan_flip / flip_audited /
       result_verified / class
     where class is one of:
       scale_path          — runs AND result-verified at 10x
       oracle_intractable  — the SPARK side ran at 10x; the ORACLE's SQL
                             shape (brute cross joins, recursive CTE,
                             all-pairs sort) is what cannot scale; still
                             hash-gated at sf0.01 (driver) and sf0.1
       same_size_by_design — inputs don't grow at 10x (full published
                             HAR size at every tier; nation-synth
                             series); scaling covered by dedicated
                             ScaleRehearsal cases
  A plan flip with no audit note fails the run (exit 1): every flip must
  be audited (read the final plans via `SuiteRehearsal <q> --explain`)
  and recorded in AUDITED_FLIPS before the artifact goes green.

Usage:
  python3 tools/scalecheck.py --round 10 [--skip-rehearsal] [--skip-verify]

Wall-clock: ~15 min rehearsal + ~20-40 min 10x verify on local[32].
"""
import argparse, json, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIER10 = "/tmp/graft_suite10x/sf0.1x10"
WORK = "/tmp/graft_scalecheck"

# The oracle (not the operator) is the scale limit. Re-probed round 10
# with per-query 600 s caps against the fresh 10x tier: the embeddings
# cross-join family turned out tractable (q9 18 s, q10 19 s, q11 20 s,
# q29 283 s, q78 29 s — moved to the verified set), while q38 and q65
# hit a MEASURED disk wall (DuckDB temp-spill ENOSPC at ~80 GB free,
# 517 s / 512 s) and the text pair-explosion oracles (q15/q22 brute
# jaccard over shingle sets, q60 edit distance, q27 recursive-CTE
# transitive closure over 500k docs) remain past the 600 s cap.
# Each stays hash-gated at sf0.01 (driver) and sf0.1.
#
# Round 11 re-probed the two then-unargued entries at an 1800 s cap
# (tools/probe_q27_q60.py) and both are now STRUCTURALLY evidenced:
#   q60: capped at 1800 s. The blocked levenshtein pair set is measured
#        157,661 pairs at sf0.1 -> 15,991,100 at 10x (101x: the tier's
#        9 exact duplicates per doc share lang and length, so every
#        block's pair count grows quadratically), each pair an O(297^2)
#        DP — ~1.4e12 DP cells, >3x the cap by construction.
#   q27: one-shot capped at 1800 s; the verdict-suggested staged
#        formulation (materialized edges + iterative min-label
#        propagation replacing the all-pairs recursive closure) shows
#        shingling takes 4.5 s and the EDGES stage alone consumes the
#        full 1800 s — the bottleneck is the same all-pairs jaccard
#        shape whose structural blowup (1.25e9 pairs at 10x, hot-shingle
#        inverted-index explosion measured r10) is already q15/q22's
#        documented class. q27 inherits that argument; the closure was
#        never the problem.
ORACLE_INTRACTABLE = {
    "q15_ngram_jaccard", "q22_minhash_pairs", "q27_dedup_clusters",
    "q38_ksweep", "q60_editdist_pairs", "q65_kfold_cv",
}

# Per-query structural arguments for WHY each oracle cannot verify at
# 10x/100x (r16 directive #4: the artifact must carry the per-query
# evidence, not just the class label). Each is a MEASURED probe result
# (rounds 10/11), and the blowup is super-linear in the tier factor, so
# every argument strengthens at 100x. The SPARK side of each query runs
# and is wall-clock/byte-censused at scale; it is the ORACLE's SQL
# shape that cannot.
ORACLE_INTRACTABLE_NOTES = {
    "q15_ngram_jaccard":
        "brute all-pairs shingle jaccard: the oracle joins the exploded "
        "shingle inverted index with itself — measured r10 at 10x: "
        "~1.25e9 candidate pairs (hot-shingle buckets grow quadratically "
        "with the tier's 9 exact copies per doc); past the 600 s probe "
        "cap. At 100x: ~1.25e13 pairs. Spark side is LSH-bucketed and "
        "linear; hash-gated at sf0.01 + sf0.1.",
    "q22_minhash_pairs":
        "same oracle shape as q15 by construction (the LSH result is "
        "verified against the brute jaccard pair set) — inherits q15's "
        "measured ~1.25e9-pair blowup at 10x, ~1.25e13 at 100x.",
    "q27_dedup_clusters":
        "r11 staged probe (tools/probe_q27_q60.py, 1800 s cap): "
        "shingling takes 4.5 s; the EDGES stage alone (all-pairs "
        "jaccard, q15's class) consumes the full cap at 10x — the "
        "recursive-CTE closure was never the bottleneck. Quadratic pair "
        "blowup; worse at 100x.",
    "q38_ksweep":
        "MEASURED disk wall at 10x: DuckDB temp-spill ENOSPC at ~80 GB "
        "free after 517 s (r10 probe) — the oracle's all-pairs "
        "distance sort spills the full pair matrix. 100x pair matrix is "
        "100x larger; structurally past any local disk.",
    "q60_editdist_pairs":
        "r11 probe (1800 s cap): blocked levenshtein pair set measured "
        "157,661 pairs at sf0.1 -> 15,991,100 at 10x (101x growth: "
        "copies share lang+length blocks), each pair an O(297^2) DP -> "
        "~1.4e12 DP cells, >3x the cap by construction; ~1.4e16 at 100x.",
    "q65_kfold_cv":
        "same disk wall as q38 (r10 probe: ENOSPC-class spill, 512 s at "
        "10x) — the oracle recomputes the all-pairs distance matrix per "
        "fold (5x q38's shape).",
}

# Inputs pinned at every tier: the HAR cascade family runs the FULL
# published dataset size regardless of sfDir (its scaling has the
# dedicated `ScaleRehearsal har` case), and q44/q46 run nation-synth
# constant series (fixed-size TPC-H dimension).
SAME_SIZE = {
    "q25_knn_dtw_pruned", "q26_har_model2_1nn", "q31_har_accuracy",
    "q33_knn_pruned_band0", "q44_fastdtw_1nn", "q46_dtw_unconstrained_1nn",
}

# ---- tier100 (round-14, r13 directive #5): one more decade for the
# DuckDB hash gate. The 100x tier (TierSynth; 60M lineitem / 15M orders
# / 10M events / 1.5M customer / 500k documents) holds only the tables
# the linear scale-path families read — embeddings/supplier/part are
# absent by design (the ANN/KNN families have dedicated decade cases in
# ScaleRehearsal, and the HAR family is same-size at every tier).
# A query is hash-verified at 100x when (a) its tables live in the
# tier, (b) its oracle shape is tractable (same classes as the 10x
# gate), and (c) its RESULT fits the python-level row compare
# (check_oracle materializes both sides as python tuples; a ~15-27M-row
# linear result is DuckDB-tractable but not compare-tractable — those
# stay hash-gated at 10x, wall-clock-censused at 100x by
# `ScaleRehearsal tier100`, and byte-censused by ShuffleCensus).
TIER100 = "/tmp/graft_tier100/sf0.1x100"
TIER100_TABLES = "region,nation,customer,orders,lineitem,events,documents"
TIER100_VERIFY = [
    # documents (500k docs): the text/dedup linear family
    "q14_dedup_exact", "q16_token_count", "q17_quality", "q18_langid",
    "q19_fingerprint", "q43_vocab", "q50_tfidf", "q61_normalize",
    "q72_pii_redact", "q73_repetition", "q79_decontaminate",
    # events (10M rows): temporal/relational linear family
    "q47_asof_join", "q49_range_join", "q52_percentiles", "q53_pivot",
    "q55_setops", "q56_json", "q57_daily", "q5_mode", "q7_argmin",
    "q8_accuracy", "q76_partitioned_prune",
    # lineitem (60M rows) / orders+customer: aggregate + join family
    "q4_agg", "q51_rollup", "q59_cube", "q54_semi_anti", "q63_bloom_semi",
]
# linear queries over tier tables whose RESULT is itself linear
# (~2-60M rows at 100x) — the python row compare, not the oracle, was
# the limit. r17: verified at 100x through check_oracle's hashed mode
# (ORACLE_HASHED_MIN_ROWS): schema+type checks unchanged, values via
# count + order-insensitive multiset hash computed INSIDE DuckDB over
# both sides (the spark parquet output and the oracle result), so no
# multi-M-row python materialization. Row ORDER is the one property the
# hashed mode does not check — it is covered by each query's full
# ordered compare at the 10x tier. Results under the threshold (q35's
# nation-rooted 2.5k rows) take the plain full compare automatically.
TIER100_VERIFY_HASHED = [
    "q1_filter_project", "q2_join", "q37_vector_assembler",
    "q40_salted_join", "q41_bucketed_join", "q42_sessionize",
    "q3_window_topk", "q58_moving_window", "q64_sample", "q35_rowid",
]
HASHED_MIN_ROWS = "2000000"
# excluded families with their own scale evidence, documented per class
TIER100_EXCLUDED_CLASS = {
    **{q: "streaming_replay (bounded replay harness; sustained-state "
          "scaling measured by ScaleRehearsal stream/streamrecovery)"
       for q in ["q67_stream_window", "q68_stream_dedup", "q69_stream_state",
                 "q70_stream_interval_join", "q71_stream_asof",
                 "q78_stream_knn"]},
    **{q: "multimodal_codec (per-frame JDK codec cost is the intrinsic "
          "bound; frame-count scaling measured in MetamorphicMultimodal "
          "+ bomb guards)"
       for q in ["q32_multimodal_ann", "q32b_multimodal_wav",
                 "q32c_multimodal_video"]},
    **{q: "source_format_conversion (CSV/JSONL/ORC conversion probes; "
          "format reading is size-independent plumbing)"
       for q in ["q74_csv_source", "q75_jsonl_source", "q77_orc_source"]},
}

# Every known plan flip must carry an audit note (from reading the final
# executed plans via `SuiteRehearsal <query> --explain`). A flip seen in
# the rehearsal but absent here fails the gate.
AUDITED_FLIPS = {
    "q22_minhash_pairs":
        "Measured-size degrade at the 10x tier (round-17 single-pass LSH "
        "persist): the bucket self-join's broadcast gate is exact "
        "rowcount x numBands x ~48 B over the warmed shingle-table count; "
        "at the tier's banded row count it exceeds the 64 MB cap and that "
        "one join plans partitioned sort-merge over slim (band, bucket, "
        "id) triples — the designed corpus-scale shape (the two verify "
        "join-backs stay measured-size broadcast: BHJ 3->2, SMJ 0->1). "
        "Generate 2->1 is the persist folding the duplicate band-explode "
        "into one evaluation. Size-driven at exactly the cap boundary; "
        "audited round 17.",
    "q32_multimodal_ann":
        "IVF probe join BuildLeft->BuildRight at 10x: planner swaps the "
        "broadcast side to the (smaller, localCheckpoint-measured) corpus "
        "side; pulls the probe-explode Generate into its own codegen span "
        "(4->5). Size-driven, both sides broadcast-eligible at both tiers; "
        "at 1000x neither fits and the join degrades to the shuffle-on-cell "
        "plan (measured: ScaleRehearsal ivfshuffle). Audited round 9.",
    "q32b_multimodal_wav": "same flip as q32_multimodal_ann (shared IVF tail).",
    "q32c_multimodal_video": "same flip as q32_multimodal_ann (shared IVF tail).",
}


def run(cmd, env=None, timeout=None):
    print(f"[scalecheck] $ {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout,
                          capture_output=True, text=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip-rehearsal", action="store_true",
                    help="reuse existing rehearsal.json")
    ap.add_argument("--skip-verify", action="store_true",
                    help="reuse existing 10x verify outputs + check log")
    ap.add_argument("--skip-tier100", action="store_true",
                    help="skip the 100x hash-gate section entirely")
    ap.add_argument("--skip-tier100-verify", action="store_true",
                    help="reuse existing 100x verify outputs + check log")
    args = ap.parse_args()

    # Step zero: the testdata contract preflight. Everything downstream
    # (rehearsal tier synth, Verify, DuckDB oracles) reads /root/testdata;
    # a silent physical-schema change there turns into dozens of
    # misleading downstream failures (r10: 18 test failures before the
    # NANOS->MICROS flip was located).
    # --repo pinned to this script's own REPO: datacheck's default is
    # /root/repo, which would read/write another checkout's artifacts
    # if this repo lives elsewhere
    r = run(["python3", "tools/datacheck.py", "--round", str(args.round),
             "--repo", REPO])
    print(r.stdout, end="")
    if r.returncode != 0:
        print(r.stderr, end="")
        sys.exit("datacheck preflight failed — testdata contract changed; "
                 "fix the load contract before running the scale gate")

    os.makedirs(WORK, exist_ok=True)
    rehearsal_json = f"{WORK}/rehearsal.json"
    verify_dir = f"{WORK}/verify10x"
    check_log = f"{WORK}/check10x.log"

    if not args.skip_rehearsal:
        r = run(["sbt", "-batch",
                 f"Test/runMain graft.tools.SuiteRehearsal --json {rehearsal_json}"],
                env={"SPARK_DRIVER_MEM": "48g"}, timeout=7200)
        sys.stdout.write("\n".join(
            l for l in r.stdout.splitlines() if "[suite10x]" in l) + "\n")
        if r.returncode != 0:
            print(r.stdout[-3000:]); print(r.stderr[-3000:])
            sys.exit(f"rehearsal failed rc={r.returncode}")
    rehearsal = json.load(open(rehearsal_json))

    verifiable = sorted(set(rehearsal) - ORACLE_INTRACTABLE - SAME_SIZE)
    if not args.skip_verify:
        r = run(["sbt", "-batch", f"runMain graft.Verify {TIER10} {verify_dir}"],
                env={"SPARK_GRAFT_ONLY": ",".join(verifiable),
                     "SPARK_GRAFT_CPUS": "16"}, timeout=7200)
        if r.returncode != 0:
            print(r.stdout[-3000:]); print(r.stderr[-3000:])
            sys.exit(f"10x verify failed rc={r.returncode}")
        failed = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l]
        for l in failed:
            print(l)
        r = run(["python3", "tools/check_oracle.py", TIER10, verify_dir],
                timeout=7200)
        open(check_log, "w").write(r.stdout + r.stderr)
        print(r.stdout)
    if not os.path.exists(check_log):
        sys.exit(f"--skip-verify given but {check_log} does not exist — "
                 "run once without --skip-verify first (the resume flags "
                 "only reuse artifacts from a prior run in the same WORK dir)")
    check = open(check_log).read()

    verified = set(re.findall(r"^(\S+): OK \(\d+ rows\)", check, re.M))
    mismatched = set(re.findall(
        r"^(\S+): (?:MISMATCH|SCHEMA MISMATCH|TYPE MISMATCH|ORACLE SQL ERROR|NO OUTPUT)",
        check, re.M))

    # ---- tier100 hash gate ----
    verified100, verified100_hashed, mismatched100 = set(), set(), set()
    tier100_all = TIER100_VERIFY + TIER100_VERIFY_HASHED
    if not args.skip_tier100:
        verify100 = f"{WORK}/verify100x"
        check100_log = f"{WORK}/check100.log"
        if not args.skip_tier100_verify:
            if not os.path.exists(f"{TIER100}/lineitem.parquet"):
                r = run(["sbt", "-batch",
                         "Test/runMain graft.tools.TierSynth 100 "
                         f"{TIER100} {TIER100_TABLES}"],
                        env={"SPARK_DRIVER_MEM": "24g"}, timeout=7200)
                if r.returncode != 0:
                    print(r.stdout[-3000:]); print(r.stderr[-3000:])
                    sys.exit(f"tier100 synth failed rc={r.returncode}")
            r = run(["sbt", "-batch", f"runMain graft.Verify {TIER100} {verify100}"],
                    env={"SPARK_GRAFT_ONLY": ",".join(tier100_all),
                         "SPARK_GRAFT_CPUS": "16",
                         "SPARK_DRIVER_MEM": "24g"}, timeout=14400)
            if r.returncode != 0:
                print(r.stdout[-3000:]); print(r.stderr[-3000:])
                sys.exit(f"100x verify failed rc={r.returncode}")
            for l in (r.stdout + r.stderr).splitlines():
                if "[verify]" in l:
                    print(l)
            r = run(["python3", "tools/check_oracle.py", TIER100, verify100],
                    env={"ORACLE_HASHED_MIN_ROWS": HASHED_MIN_ROWS},
                    timeout=14400)
            open(check100_log, "w").write(r.stdout + r.stderr)
            print(r.stdout)
        if not os.path.exists(check100_log):
            sys.exit(f"--skip-tier100-verify given but {check100_log} missing")
        check100 = open(check100_log).read()
        verified100 = set(re.findall(r"^(\S+): OK \(\d+ rows\)", check100, re.M))
        verified100_hashed = set(re.findall(
            r"^(\S+): OK-HASHED \(\d+ rows\)", check100, re.M))
        mismatched100 = set(re.findall(
            r"^(\S+): (?:MISMATCH|SCHEMA MISMATCH|TYPE MISMATCH|HASH MISMATCH|ORACLE SQL ERROR|NO OUTPUT)",
            check100, re.M))

    out, problems = {}, []
    for name in sorted(rehearsal):
        rec = dict(rehearsal[name])
        if name in ORACLE_INTRACTABLE:
            cls, rv = "oracle_intractable", None
            rec["oracle_note"] = ORACLE_INTRACTABLE_NOTES[name]
        elif name in SAME_SIZE:
            cls, rv = "same_size_by_design", None
        else:
            cls = "scale_path"
            rv = name in verified
            if name in mismatched or (not rv and name in verifiable):
                problems.append(f"{name}: 10x result NOT verified (see {check_log})")
        flip = rec.get("plan_flip")
        if flip:
            rec["flip_audited"] = name in AUDITED_FLIPS
            if name in AUDITED_FLIPS:
                rec["flip_audit"] = AUDITED_FLIPS[name]
            else:
                problems.append(f"{name}: UNAUDITED plan flip: {flip}")
        if not rec.get("tenx_ran"):
            problems.append(f"{name}: failed at 10x")
        rec["result_verified"] = rv
        rec["class"] = cls
        # tier100 annotation: verified / verified_hashed / FAILED /
        # documented per-query intractability
        if args.skip_tier100:
            rec["tier100"] = "skipped (--skip-tier100)"
        elif name in tier100_all:
            if name in verified100:
                rec["tier100"] = "verified"
            elif name in verified100_hashed:
                rec["tier100"] = (
                    "verified_hashed (count + order-insensitive multiset "
                    "hash computed inside DuckDB over both sides; schema+"
                    "type checks unchanged; row ORDER covered by this "
                    "query's full ordered compare at 10x)")
            else:
                rec["tier100"] = "FAILED"
                # mismatched100 splits the failure class: a compare line
                # means the query RAN and the result is wrong; no line
                # means the run died before comparing (crash/timeout)
                kind = ("compare-line failure" if name in mismatched100
                        else "no compare line — run died before comparing")
                problems.append(
                    f"{name}: 100x result NOT verified — {kind} "
                    "(see check100.log)")
        elif name in ORACLE_INTRACTABLE:
            rec["tier100"] = ("oracle_intractable: "
                              + ORACLE_INTRACTABLE_NOTES[name])
        elif name in SAME_SIZE:
            rec["tier100"] = "same_size_by_design"
        elif name in TIER100_EXCLUDED_CLASS:
            rec["tier100"] = TIER100_EXCLUDED_CLASS[name]
        else:
            rec["tier100"] = ("tables_not_in_tier (embeddings/supplier/part "
                              "family; dedicated decade cases in "
                              "ScaleRehearsal)")
        out[name] = rec

    n_ver = sum(1 for r in out.values() if r["result_verified"])
    summary = {
        "queries": len(out),
        "tenx_ran": sum(1 for r in out.values() if r.get("tenx_ran")),
        "plan_flips": sum(1 for r in out.values() if r.get("plan_flip")),
        "result_verified_10x": n_ver,
        "oracle_intractable": len(ORACLE_INTRACTABLE),
        "same_size_by_design": len(SAME_SIZE),
        "tier100_verified": sum(1 for r in out.values()
                                if str(r.get("tier100", "")).startswith("verified")),
        "tier100_verified_full": sum(1 for r in out.values()
                                     if r.get("tier100") == "verified"),
        "tier100_verified_hashed": sum(
            1 for r in out.values()
            if str(r.get("tier100", "")).startswith("verified_hashed")),
        "tier100_attempted": 0 if args.skip_tier100 else len(tier100_all),
        "problems": problems,
        "tier": TIER10,
        "tier100_dir": TIER100,
    }
    path = f"{REPO}/SCALECHECK_r{args.round:02d}.json"
    json.dump({"summary": summary, "queries": out}, open(path, "w"), indent=1)
    print(f"\n[scalecheck] wrote {path}")
    print(f"[scalecheck] {summary['tenx_ran']}/{len(out)} ran at 10x, "
          f"{n_ver} result-verified, {summary['plan_flips']} plan flips, "
          f"tier100 {summary['tier100_verified']}/{summary['tier100_attempted']} "
          f"verified, {len(problems)} problems")
    for p in problems:
        print(f"[scalecheck] PROBLEM {p}")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
