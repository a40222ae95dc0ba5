#!/usr/bin/env python3
"""Build the full-registry 100x ledger (r18 verdict item 1 / r19 item 1).

Reads BENCH_sf10.json, resolves for EVERY registered query either
  - its latest measured 100x point (later blocks supersede earlier ones:
    e.g. q234 resolves to the r18 screened 8.6x, not the r16 71.4x), or
  - an explicit one-line family adjudication naming the measured anchor
    it rides,
then writes the result back as the `r19_full_100x_ledger` block.

Validation: every registered query appears exactly once; every named
anchor is itself measured; every measured ratio > 15x carries its own
adjudication line. The script FAILS (exit 1) if any row is missing —
the ledger can never silently under-cover the registry.

Query list: pass the Verify dump dir (default /tmp/vout_r19) or a file
with one query name per line via --names.
"""
import json, os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, "BENCH_sf10.json")

# ---------------------------------------------------------------- anchors
# Family adjudications: short -> (anchor_short, one-line reason).
# Anchors MUST be measured (validated below). Reasons state the shared
# scale shape, not a vague "similar".
A = {}
def fam(anchor, reason, members):
    for m in members.split():
        assert m not in A, f"duplicate adjudication {m}"
        A[m] = (anchor, reason)

fam("q01", "per-row scalar/generator pipeline over one scan, no corpus "
    "shuffle beyond the pushed-down read - the measured scan-family shape",
    "q21 q22 q23 q24 q25 q31 q32 q33 q34 q42 q44 q46 q52 q55 q69 q99 "
    "q125 q131 q133 q144 q152 q166 q171 q173 q174 q175 q192 q211")
fam("q02", "one corpus-keyed exchange with map-side partial aggregation, "
    "model-sized output - the measured shuffle-agg shape",
    "q45 q54 q61 q68 q100 q104 q105 q113 q117 q119 q123 q134 q135 q142 "
    "q148 q150 q153 q156 q167 q168 q172 q180 q182 q183 q184 q185 q187 "
    "q188 q190 q196 q197 q198 q199 q200 q202 q207 q210 q214 q231 q232 "
    "q63 q64 q65 q91 q93 q15 q16 q17 q18 q43 q160 q162 q195 q208 q221 q132")
fam("q243", "n-gram vocabulary aggregation on the Heaps corpus - "
    "vocab-sized grouped state, measured 13.2x",
    "q89 q96 q118")
fam("q06", "corpus-to-corpus shuffled set operation - growth tracks "
    "shuffle bytes, measured sublinear at 21.6x for 100x data",
    "q19 q20")
fam("q07", "hash-split + anti-join over corpus keys, the measured "
    "anti-join shuffle shape", "q98")
fam("q03", "star-shaped corpus join with broadcast dims; salting only "
    "re-buckets the same exchange volume", "q51")
fam("q10", "as-of/event-time ordered join - per-key ordered exchange, "
    "the measured as-of shape", "q141 q161")
fam("q13", "grouping-set expansion over one grouped exchange, the "
    "measured rollup shape", "q159")
fam("q11", "sort/percentile over grouped numeric state, the measured "
    "approx-percentile shape", "q209")
fam("q30", "hash-key exact dedup: one grouped exchange on the digest, "
    "measured 4.0x", "q94 q145 q169 q181")
fam("q49", "pair frame + iterative connected-components label "
    "propagation, measured 2.1x (df-bounded candidates on the Heaps "
    "corpus)", "q88 q92 q212 q218 q219")
fam("q115", "prefix-filter/window/df-BOUNDED candidate pair join - "
    "candidate volume is capped by construction, measured 2.2x",
    "q35 q56 q87 q95 q101 q108 q109 q126 q155 q165 q201")
fam("q38", "banded-LSH bucket join with df caps - bucketed, never "
    "all-pairs; q38 is the r19-measured minhash point",
    "q39 q47 q48 q81 q97 q122")
fam("q60", "curation/export/layout family: per-row key compute + "
    "grouped manifest agg, measured 7.5x",
    "q57 q58 q59 q76 q82 q102 q103 q110 q120 q151 q158 q163 q164 "
    "q178 q191")
fam("q75", "BM25 postings join from the inverted index - candidate "
    "volume bounded by query-term document frequency; q75 is the "
    "r19-measured retrieval point",
    "q66 q67 q83 q112 q189")
fam("q129", "per-key event-time ordered window over the events corpus; "
    "q129 is the r19-measured sessionization point",
    "q26 q27 q28 q29 q85 q86 q127 q128 q130 q154 q177 q186 q193 q194 "
    "q203 q220")
fam("q205", "broadcast-model tokenizer/trainer family: training "
    "aggregates model-sized candidate tables, encode is per-row "
    "linear, measured 14.3x",
    "q78 q79 q116 q136 q206")
fam("q121", "corpus-shingle grouped aggregation with min-id first-"
    "occurrence attribution, measured 12.3x", "q124")
fam("q222", "fixed-size mergeable sketch state, map-side combined - "
    "sketch families scale with registers, not rows", "q146 q223 q224")
fam("q228", "fan-out sketch explosion into a geometry-sized grouped "
    "state (depth*reps counters), re-measured r16", "q147 q157")
fam("q229", "bloom bit-frame build + broadcast probe, measured 3.7x",
    "q70")
fam("q106", "per-row JDK codec decode + banded signature join, the "
    "measured multimodal shape", "q40 q41 q107 q114 q137")
fam("q179", "centroid sum-vector aggregation + broadcast-back scoring, "
    "measured 5.2x", "q90")
fam("q234", "trained-quantizer cell-bucketed pair stage with the "
    "certified SQ8 screen, measured 8.6x", "q37 q62")
fam("q277", "fixed-probe-budget brute/IVF evaluation - budget x corpus "
    "linear, measured 4.7x", "q36 q50 q71")
fam("q241", "IVF-PQ candidate generation with broadcast codebooks, "
    "measured 4.8x", "q72")
fam("q267", "SQ8-coded ANN path, measured 4.05x", "q204")
fam("q233", "trained-quantizer routed candidate join at cells "
    "~targetCell, measured 13.6x", "q215")
fam("q264", "survival/at-risk ordered aggregation, measured 2.9x",
    "q213")
fam("q216", "the suffix-array pass IS the cost: q225 cuts spans from "
    "q216's mined repeat frame (the session-handoff contract), "
    "measured 29.6x with its adjudication", "q225")
fam("q80", "range-exchange + two-pass contiguous numbering (seqByOrder); "
    "q80 is the r19-measured zip point",
    "q53 q73 q74 q143 q176")
fam("q252", "IVF-routed cross-corpus margin mining with trained "
    "centroids; q252 is the r19-measured bitext point", "q170")

# ---------------------------------------------------------- over-15 notes
OVER15 = {
    "q06": "semi-join: both sides corpus-scale shuffle; growth tracks "
        "shuffle bytes, sublinear vs 100x data (r15 adjudication)",
    "q07": "anti-join: same shuffle-byte tracking as q06",
    "q14": "cube over orders: the 4-way grouping-set Expand multiplies "
        "rows per set - the workload itself; still 2x sublinear vs data",
    "q77": "full corpus self-graph on the FLAT tier: auto-derived cells "
        "bound per-probe candidates at ~nProbe*targetCell (the r15 fix; "
        "pinned 16 measured 521x), but flat assignment is n*k = "
        "n^2/1024 dots - the documented flat-tier trade; the production "
        "tier is the trained two-level path with 2n*sqrt(k) assignment "
        "(q233, 13.6x)",
    "q149": "flat-tier semantic dedup: same n*k assignment term as q77; "
        "production path is q234 (trained two-level + SQ8 screen, 8.6x)",
    "q138": "per-frame JDK GIF decode is linear per row; at sf10 the "
        "100x decode bill plus local job latency dominates (r16 "
        "adjudication: cluster-amortized)",
    "q139": "per-row JDK audio decode, same class as q138",
    "q140": "cross-modal: both codec decodes back-to-back, same class "
        "as q138/q139",
    "q245": "per-source KS: per-source sorted passes over the grouped "
        "corpus (r16 adjudication: source-parallel on a cluster)",
    "q228": "depth*reps fan-out explosion is the workload; re-measured "
        "r16 after the repartition fix",
    "q216": "log-round global sorts over one row per CHARACTER - "
        "byte-bound, sublinear vs 100x data; measured after the r19 "
        "round fusion (see r19_new_100x adjudication)",
    "q38": "128-perm minhash per-doc linear + df-capped banded join; "
        "16.8x tracks shingle bytes x permutations, sublinear vs 100x "
        "data (see r19_new_100x adjudication)",
}

def main():
    names_file = None
    dump_dir = "/tmp/vout_r19"
    args = sys.argv[1:]
    if args and args[0] == "--names":
        names_file = args[1]
    elif args:
        dump_dir = args[0]
    if names_file:
        names = [l.strip() for l in open(names_file) if l.strip()]
    else:
        names = sorted(d for d in os.listdir(dump_dir)
                       if d.startswith("q") and d != "oracle_sql.json")
    short2full = {}
    for n in sorted(set(names)):
        short2full[n.split("_")[0]] = n

    d = json.load(open(SF10))
    measured = {}   # short -> (block, ratio); later blocks win
    def grab(block, name):
        for rk in ("ratio", "ratio_100x"):
            if rk in block:
                for q, v in block[rk].items():
                    measured[q] = (name, v)
    grab(d, "relational_core")
    for k, v in d.items():
        if k == "r19_full_100x_ledger":
            continue
        if isinstance(v, dict):
            grab(v, k)

    ledger, errors = {}, []
    for s in sorted(short2full, key=lambda x: int(x[1:])):
        if s in measured:
            blk, ratio = measured[s]
            row = {"ratio_100x": ratio, "source": blk}
            if ratio > 15:
                note = OVER15.get(s)
                if not note:
                    errors.append(f"{s}: measured {ratio}x > 15 with no "
                                  "adjudication")
                else:
                    row["adjudication"] = note
            ledger[s] = row
        elif s in A and A[s][0] in measured:
            anchor, why = A[s]
            if not why:
                errors.append(f"{s}: empty adjudication reason")
            ledger[s] = {"anchor": anchor,
                         "anchor_ratio_100x": measured[anchor][1],
                         "why": why}
        elif s in A:
            errors.append(f"{s}: anchor {A[s][0]} is not measured")
        else:
            errors.append(f"{s}: no measurement and no adjudication")
    if errors:
        print("LEDGER INCOMPLETE:\n  " + "\n  ".join(errors))
        sys.exit(1)

    # The registry only grows: a rebuild that yields FEWER rows than the
    # committed ledger means the names source is a STALE Verify dump
    # (the exact mistake this guard was added after - rebuilding against
    # a pre-q280/q281 dump silently dropped two rows). Point the script
    # at a fresh dump (or --names) instead.
    prev = d.get("r19_full_100x_ledger", {}).get("rows", 0)
    if len(ledger) < prev:
        print(f"REFUSING: rebuild has {len(ledger)} rows but the committed "
              f"ledger has {prev} - the names source looks stale")
        sys.exit(1)

    n_meas = sum(1 for r in ledger.values() if "ratio_100x" in r)
    d["r19_full_100x_ledger"] = {
        "note": "r19 (verdict item 1): EVERY registered query has either "
            "a measured 100x point (latest block wins - e.g. q234 reads "
            "the r18 screened 8.6x, not the r16 71.4x) or a one-line "
            "family adjudication naming its measured anchor. Built by "
            "scripts/mk_100x_ledger.py, which fails on any uncovered "
            "row or any >15x point without an adjudication.",
        "rows": len(ledger),
        "measured": n_meas,
        "adjudicated": len(ledger) - n_meas,
        "ledger": ledger,
    }
    with open(SF10, "w") as f:
        json.dump(d, f, indent=1)
    print(f"ledger: {len(ledger)} rows ({n_meas} measured, "
          f"{len(ledger)-n_meas} adjudicated) -> BENCH_sf10.json")

if __name__ == "__main__":
    main()
