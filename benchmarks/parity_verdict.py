"""Render the privacy-parity verdict from a privacy_parity JSON artifact.

Answers the round-3/4 open question with measurements: does the
REFERENCE'S OWN torch trainer (/root/reference/model/cloak_models.py,
training loop semantics of training_cloak.py) reproduce the erratic
full-scale reference-mode privacy curve (emotion collapse at ratio 20,
adversary recovery at high ratios — benchmarks/privacy_demo.json), or is
that curve a framework divergence?

Prints, per arm pair (torch vs fw, cloak and grl):
- the two sweeps side by side per ratio (emotion/adversary UAR);
- paired per-fold deltas (the fold-variation-cancelling statistic);
- curve-shape agreement: does each arm show the same qualitative moves
  (drop at 20, partial recovery, adversary rebound)?
- sigma-trajectory overlay stats: per (fold, ratio), max |log mean sigma
  delta| between the torch and fw trajectories at matched epochs.

Usage: python benchmarks/parity_verdict.py [path/to/privacy_parity.json]
"""

import json
import sys

import numpy as np


def main(path):
    d = json.load(open(path))
    folds = d["protocol"].get("folds") or d["protocol"].get("folds_by_arm")
    print(f"preset={d['protocol']['preset']} folds={folds} "
          f"epochs={d['protocol']['num_epochs']} corpus={d['corpus']}")
    print(f"clean: {({k: round(v, 3) for k, v in d['clean'].items()})}")

    for tag in ("cloak", "grl"):
        a = d["arms"].get(f"torch_{tag}")
        b = d["arms"].get(f"fw_{tag}")
        if not (a and b):
            print(f"\n[{tag}] missing arm(s); skipping")
            continue
        print(f"\n=== {tag}: torch (reference modules) vs framework ===")
        print(f"{'ratio':>6} | {'emo torch':>9} {'emo fw':>7} | "
              f"{'adv torch':>9} {'adv fw':>7} | {'paired |d| emo/adv':>18}")
        comp = d["comparison"].get(tag, {})
        for rk in sorted(a, key=lambda s: int(s.split("_")[1])):
            if rk not in b:
                continue
            c = comp.get(rk, {})
            pe = c.get("paired_emotion_mean_abs")
            pa = c.get("paired_adversary_mean_abs")
            print(f"{rk.split('_')[1]:>6} | "
                  f"{a[rk]['emotion_uar']:9.3f} {b[rk]['emotion_uar']:7.3f} | "
                  f"{a[rk]['adversary_uar']:9.3f} {b[rk]['adversary_uar']:7.3f}"
                  f" | {pe if pe is None else round(pe, 3)!s:>8} /"
                  f" {pa if pa is None else round(pa, 3)!s:>8}"
                  f"  {'OK' if c.get('within_spread') else 'DIVERGES'}")

        # curve-shape agreement on the open question's three features
        def feats(arm):
            e = {int(k.split("_")[1]): arm[k]["emotion_uar"] for k in arm}
            v = {int(k.split("_")[1]): arm[k]["adversary_uar"] for k in arm}
            return {
                "emo_drop_at_20": e[0] - e.get(20, e[0]),
                "emo_recovery_40_vs_20": e.get(40, 0) - e.get(20, 0),
                "adv_rebound_80_vs_20": v.get(80, 0) - v.get(20, 0),
            }

        fa, fb = feats(a), feats(b)
        print("  curve shape (torch / fw):")
        for k in fa:
            same = (fa[k] > 0.05) == (fb[k] > 0.05)
            print(f"    {k}: {fa[k]:+.3f} / {fb[k]:+.3f}"
                  f"  -> {'same direction' if same else 'DIFFERENT'}")

        # sigma-trajectory overlay
        st = d.get("sigma_log_mean_trajectories", {})
        ta, tb = st.get(f"torch_{tag}", {}), st.get(f"fw_{tag}", {})
        deltas = []
        for fk in ta:
            if fk not in tb:
                continue
            for rk in ta[fk]:
                if rk not in tb[fk]:
                    continue
                x = np.asarray(ta[fk][rk], float)
                y = np.asarray([v for v in tb[fk][rk] if v is not None],
                               float)
                n = min(len(x), len(y))
                if n:
                    deltas.append(float(np.max(np.abs(x[:n] - y[:n]))))
        if deltas:
            print(f"  sigma trajectories: {len(deltas)} (fold,ratio) pairs, "
                  f"max |d log mean sigma| = {max(deltas):.4f}, "
                  f"median = {float(np.median(deltas)):.4f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "benchmarks/privacy_parity.json")
