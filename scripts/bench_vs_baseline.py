#!/usr/bin/env python3
"""Self-evidencing bench-vs-baseline table: reads BENCH_FULL_local.json
(written by graft.Bench) and prints the nearest-shape comparison against
the reference's recorded notebook wall times (BASELINE.md — the reference
publishes no formal benchmark, only stored %%time outputs).

The mapping below pairs each reference measurement with the registered
query of the MOST SIMILAR shape at the same-or-larger data scale; ratios
under 1.0 mean this engine is faster than the reference's single-node
C++/pandas pipeline on comparable work.

Usage: python3 scripts/bench_vs_baseline.py [BENCH_FULL_local.json]
"""
import json
import sys

# (query, reference seconds, reference shape description)
PAIRS = [
    ("pipeline_fit_predict", 137 + 85,
     "example0 fit+predict, 2023 seqs k=2 (137s + 85s)"),
    ("predict_anomaly", 85, "example0 predict, 2023 seqs"),
    ("cluster_kmeans", 3.6, "example1 fit, 55 seqs k=5 reduce_clusters"),
    ("cluster_pluggable", 3.5, "example3 FeatureAgglomeration fit, 55 seqs"),
    ("stream_fit_predict", 5874, "Agitation layer-1 StreamingDetection (1h37m54s)"),
    ("multilevel_pipeline", 5874 + 11.1, "Agitation both layers"),
]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL_local.json"
    bench = json.loads(open(path).read().strip())
    qs = bench["queries"]
    norm = bench.get("queries_norm", {})
    print(f"bench artifact: {path}  sf={bench.get('sf')}  "
          f"calib_s={bench.get('calib_s')}  steal={bench.get('steal_pct')}%")
    print(f"{'query':24} {'ours(s)':>8} {'norm(x)':>8} {'ref(s)':>8} "
          f"{'ratio':>8}  reference shape")
    ratios = []
    missing = []
    for q, ref, desc in PAIRS:
        if q not in qs:
            print(f"{q:24} {'MISSING':>8}")
            missing.append(q)
            continue
        ours = qs[q]
        # calibration-normalized multiple (seconds / calib_s): the
        # round-over-round comparable number — box-speed drift cancels
        nval = norm.get(q)
        nstr = f"{float(nval):8.4f}" if nval is not None else f"{'-':>8}"
        ratio = ours / ref
        ratios.append(ratio)
        print(f"{q:24} {ours:8.2f} {nstr} {ref:8.1f} {ratio:8.4f}  {desc}")
    if ratios:
        gm = 1.0
        for r in ratios:
            gm *= r
        gm **= 1.0 / len(ratios)
        # the gate verdict covers ALL pairs: a missing measurement is a
        # CHECK, never a pass computed over the subset that happened to run
        verdict = "PASS" if max(ratios) < 2 and not missing else "CHECK"
        print(f"\ngeometric-mean ratio over {len(ratios)}/{len(PAIRS)} pairs: "
              f"{gm:.4f}  (2x gate, max ratio {max(ratios):.4f}: {verdict})")
        if missing:
            print(f"missing measurements: {', '.join(missing)}")


if __name__ == "__main__":
    main()
