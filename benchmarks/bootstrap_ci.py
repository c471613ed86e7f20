"""Bootstrap confidence intervals over the per-image compression results.

VERDICT r4 weak #4: the flagship RL-vs-pretrain product delta (0.9803 ->
0.9795 out/orig) rests on a point estimate over 128 images with no error
bars. This resamples IMAGES with replacement (the corpus is the random
quantity; per-image bytes are deterministic given the image) and reports
percentile CIs for each mode's out/orig ratio and for pairwise mode
DELTAS matched on the same resampled images — the paired design cancels
per-image difficulty exactly, which is what makes small deltas decidable.

Usage:
  python benchmarks/bootstrap_ci.py per_image.jsonl [--n-boot 10000]
       [--pairs learned_r4_rl_fallback,learned_r4_fallback]
"""

from __future__ import annotations

import argparse
import collections
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", help="per-image log from bench_compression.py "
                                  "--per-image (modes may span several runs "
                                  "appended to one file)")
    ap.add_argument("--n-boot", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pairs", help="comma-separated modeA,modeB[;modeC,"
                                    "modeD...] to difference (A - B)")
    args = ap.parse_args()

    by_mode: dict[str, dict[str, tuple[int, int]]] = collections.defaultdict(
        dict)
    with open(args.jsonl) as f:
        for line in f:
            r = json.loads(line)
            by_mode[r["mode"]][r["stem"]] = (r["orig_bytes"], r["out_bytes"])

    rng = np.random.default_rng(args.seed)
    report = {}
    for mode, rows in sorted(by_mode.items()):
        orig = np.array([v[0] for v in rows.values()], np.float64)
        out = np.array([v[1] for v in rows.values()], np.float64)
        n = len(orig)
        idx = rng.integers(0, n, (args.n_boot, n))
        ratios = out[idx].sum(1) / orig[idx].sum(1)
        report[mode] = {
            "n_images": n,
            "ratio": round(float(out.sum() / orig.sum()), 4),
            "ci95": [round(float(np.percentile(ratios, 2.5)), 4),
                     round(float(np.percentile(ratios, 97.5)), 4)],
        }
        print(json.dumps({"mode": mode, **report[mode]}))

    for pair in (args.pairs or "").split(";"):
        if "," not in pair:
            continue
        a, b = pair.split(",")
        stems = sorted(set(by_mode[a]) & set(by_mode[b]))
        orig = np.array([by_mode[a][s][0] for s in stems], np.float64)
        out_a = np.array([by_mode[a][s][1] for s in stems], np.float64)
        out_b = np.array([by_mode[b][s][1] for s in stems], np.float64)
        n = len(stems)
        idx = rng.integers(0, n, (args.n_boot, n))
        # paired: same resampled images in both modes' ratio
        deltas = (out_a[idx].sum(1) - out_b[idx].sum(1)) / orig[idx].sum(1)
        point = float((out_a.sum() - out_b.sum()) / orig.sum())
        lo, hi = (float(np.percentile(deltas, 2.5)),
                  float(np.percentile(deltas, 97.5)))
        print(json.dumps({"delta": f"{a} - {b}", "n_images": n,
                          "point": round(point, 5),
                          "ci95": [round(lo, 5), round(hi, 5)],
                          "significant": bool(hi < 0 or lo > 0)}))


if __name__ == "__main__":
    main()
