#!/usr/bin/env python3
"""Assemble BENCH_sf1.json from two BENCH_FULL-format sweeps (dev tool).

Usage: mk_bench_sf1.py <sf01_full.json> <sf1_full.json> <note>
Writes BENCH_sf1.json in the repo root with per-query ratios, the slow
tail, and the rerun self-adjudication columns carried through.
"""
import json, statistics, sys


def main():
    sf01 = json.load(open(sys.argv[1]))
    sf1 = json.load(open(sys.argv[2]))
    note = sys.argv[3]
    q0, q1 = sf01["queries"], sf1["queries"]
    ratios = {k: round(q1[k] / q0[k], 2)
              for k in sorted(q0) if k in q1 and q0[k] > 0 and q1[k] > 0}
    vals = list(ratios.values())
    vals.sort()
    out = {
        "note": note,
        "sf1_total_s": round(sf1["value"], 1),
        "sf1_cpu_total_s": round(sf1.get("cpu_total", 0), 1),
        "sf01_total_s": round(sf01["value"], 1),
        "n_queries": len(ratios),
        "total_ratio": round(sf1["value"] / sf01["value"], 2),
        "median_ratio": round(statistics.median(vals), 2),
        "p90_ratio": round(vals[int(0.9 * (len(vals) - 1))], 2),
        "errors": {"sf01": sf01.get("errors", []), "sf1": sf1.get("errors", [])},
        "rerun_sf1": sf1.get("rerun", {}),
        "over_8x": {k: {"ratio": v, "sf01_s": q0[k], "sf1_s": q1[k],
                        "rerun_s": sf1.get("rerun", {}).get(k)}
                    for k, v in sorted(ratios.items(), key=lambda kv: -kv[1])
                    if v > 8.0},
        "ratios": ratios,
    }
    json.dump(out, open("BENCH_sf1.json", "w"), indent=1)
    print("total", out["total_ratio"], "median", out["median_ratio"],
          "p90", out["p90_ratio"], "over8x", len(out["over_8x"]))


if __name__ == "__main__":
    main()
