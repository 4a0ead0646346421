#!/usr/bin/env python3
"""Merge two Bench detail JSONs (uniform vs skew leg) into the
BENCH_sf1_skew.json artifact format. Usage:
  mk_skew.py uniform.json skew.json out.json "<note>"
"""
import json, sys

def main():
    u = json.load(open(sys.argv[1]))
    s = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    uq, sq = u["queries"], s["queries"]
    common = sorted(set(uq) & set(sq))
    ratios = {k: round(sq[k] / uq[k], 3) for k in common if uq[k] > 0}
    if not ratios:
        sys.exit("mk_skew: no common timed query between the two legs - "
                 "check the query filters of the uniform and skew runs")
    mx = max(ratios, key=ratios.get)
    out = {
        "metric": "skew_gate",
        "unit": "ratio",
        "note": note,
        "uniform_total": round(sum(uq[k] for k in common), 3),
        "skew_total": round(sum(sq[k] for k in common), 3),
        "uniform": {k: uq[k] for k in common},
        "skew": {k: sq[k] for k in common},
        "uniform_spread": {k: u.get("spread", {}).get(k) for k in common},
        "skew_spread": {k: s.get("spread", {}).get(k) for k in common},
        "ratio_skew_over_uniform": ratios,
        "max_ratio": ratios[mx],
        "max_ratio_query": mx,
        "errors_uniform": u.get("errors", {}),
        "errors_skew": s.get("errors", {}),
        "reps": u.get("reps"),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"max ratio {ratios[mx]} at {mx}; "
          f"totals {out['uniform_total']} -> {out['skew_total']}; "
          f"errors u={len(out['errors_uniform'])} s={len(out['errors_skew'])}")
    top = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    for k, v in top:
        print(f"  {v:6.3f}  {k}  ({uq[k]:.2f}s -> {sq[k]:.2f}s)")

if __name__ == "__main__":
    main()
