"""Curve-by-curve comparison of our results pickles vs the reference's
committed ones (same (ebno_arr, BERs, BLERs) format, keys
('System Name', num_tx, mcs_idx) — reference evaluate.py:203-206).

For every label given (or every label present in BOTH results dirs),
overlays BLER curves (ours solid, reference dashed) and computes the
horizontal dB shift at BLER targets 1e-1 and 1e-2 (ours minus reference;
negative = we need less SNR = better). Emits PNG per label plus a
markdown summary table.

Usage: python scripts/compare_results.py [--labels nrx_rt ...]
       [--ours results] [--ref /root/reference/results]
       [--out results/compare]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load(path):
    """Load any of the three committed pickle layouts:
    - standard: [ebno, BERs, BLERs]
    - depth sweep: [ebno, BERs, BLERs, GPs] (GPs dropped here)
    - mixed-MCS: [ebno, BLERs_same, BLERs_mixed], 2-tuple keys —
      re-keyed ('same'/'mixed' + key) into one BLER dict."""
    with open(path, "rb") as f:
        d = pickle.load(f)
    ebno = np.asarray(d[0])
    if len(d) >= 3 and isinstance(d[1], dict) and isinstance(d[2], dict):
        k1 = next(iter(d[1]), None)
        k2 = next(iter(d[2]), None)
        if (k1 is not None and len(k1) == 2) or \
                (k2 is not None and len(k2) == 2):
            blers = {}
            for scen, dd in (("same", d[1]), ("mixed", d[2])):
                for k, v in dd.items():
                    blers[(f"{k[0]} [{scen}]", 0, k[1])] = v
            return ebno, {}, blers
    return ebno, d[1], d[2]


def snr_at_bler(ebno, bler, target):
    """SNR where the (monotone-interpolated) curve crosses `target`;
    NaN if the curve never brackets it."""
    b = np.asarray(bler, np.float64)
    ok = np.isfinite(b)
    e, b = ebno[ok], b[ok]
    for i in range(len(b) - 1):
        lo, hi = b[i], b[i + 1]
        if (lo - target) * (hi - target) <= 0 and lo != hi and \
                lo > 0 and hi > 0:
            # log-linear interpolation
            t = (np.log(target) - np.log(lo)) / (np.log(hi) - np.log(lo))
            return float(e[i] + t * (e[i + 1] - e[i]))
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", nargs="*", default=None)
    ap.add_argument("--ours", default="results")
    ap.add_argument("--ref", default="/root/reference/results")
    ap.add_argument("--out", default="results/compare")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.labels is None:
        ours = {f[:-len("_results.pkl")] for f in os.listdir(args.ours)
                if f.endswith("_results.pkl")}
        refs = {f[:-len("_results")] for f in os.listdir(args.ref)
                if f.endswith("_results")}
        labels = sorted(ours & refs)
        # imported-reference-weight curves: ours "<label>_ref" compares
        # against the reference's own "<label>" curve (same weights on
        # both sides — the RX-parity overlay)
        labels += sorted(f"{l}_ref" for l in
                         {o[:-4] for o in ours if o.endswith("_ref")}
                         & refs)
    else:
        labels = args.labels
    if not labels:
        print("no labels present in both results dirs")
        return

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for label in labels:
        e_o, _, bl_o = _load(os.path.join(args.ours,
                                          f"{label}_results.pkl"))
        ref_label = label[:-4] if label.endswith("_ref") else label
        e_r, _, bl_r = _load(os.path.join(args.ref,
                                          f"{ref_label}_results"))
        keys = sorted(set(bl_o) & set(bl_r))
        if not keys:
            print(f"{label}: no common keys "
                  f"(ours {sorted(bl_o)[:3]}..., ref {sorted(bl_r)[:3]}...)")
            continue
        fig, ax = plt.subplots(figsize=(7, 5))
        colors = plt.cm.tab10.colors
        for i, k in enumerate(keys):
            c = colors[i % 10]
            # early-stopped sweeps store fewer measured points than the
            # SNR grid (or vice versa): align on the common prefix
            n_o = min(len(e_o), len(bl_o[k]))
            n_r = min(len(e_r), len(bl_r[k]))
            eo, blo = e_o[:n_o], np.asarray(bl_o[k][:n_o])
            er, blr = e_r[:n_r], np.asarray(bl_r[k][:n_r])
            ktail = "/".join(str(x) for x in k[1:])
            ax.semilogy(eo, blo, "-o", color=c, ms=3,
                        label=f"{k[0]} {ktail} (ours)")
            ax.semilogy(er, blr, "--s", color=c, ms=3, alpha=0.6,
                        label="(reference)")
            for tgt in (1e-1, 1e-2):
                s_o = snr_at_bler(eo, blo, tgt)
                s_r = snr_at_bler(er, blr, tgt)
                rows.append((label, k[0], ktail, tgt, s_o, s_r,
                             s_o - s_r))
        ax.set_xlabel("Eb/No [dB]")
        ax.set_ylabel("TBLER")
        ax.set_ylim(1e-4, 1.0)
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=6)
        ax.set_title(f"{label}: ours vs reference")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{label}_compare.png"),
                    dpi=140)
        plt.close(fig)
        print(f"{label}: plotted {len(keys)} curve pairs")

    md = os.path.join(args.out, "summary.md")
    with open(md, "w") as f:
        f.write("| label | system | key | BLER | ours dB | ref dB "
                "| delta dB |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]:.0e} "
                    f"| {r[4]:.2f} | {r[5]:.2f} | {r[6]:+.2f} |\n")
    print(f"summary -> {md} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
