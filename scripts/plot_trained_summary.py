"""Round-1 trained-model BLER summary figure.

Reads results/trained_progress.jsonl (latest record per config/MCS head)
and plots the measured BLER anchors of this framework's own trained
models against the reference's committed nrx_rt curve, to
results/round1_trained_summary.png.

Zero-BLER measurements are drawn at the binomial upper bound (<1/blocks)
with an open marker — log axes cannot show 0.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

# validated categorical order (dataviz palette: blue, orange, aqua)
C = {"nrx_rt": "#2a78d6", "nrx_rt_qpsk": "#eb6834",
     "nrx_rt_64qam": "#1baf7a"}
LABEL = {"nrx_rt": "nrx_rt (16QAM MCS14, 1.7M iters)",
         "nrx_rt_qpsk": "nrx_rt_qpsk (MCS9, 188k warm-started)",
         "nrx_rt_64qam": "nrx_rt_64qam (MCS19, 259k warm-started)"}

# reference committed nrx_rt curve (results/nrx_rt_results, 2 UE MCS14)
REF_SNR = [2.0, 3.0, 4.0, 5.0]
REF_BLER = [0.325, 0.0936, 0.016, 0.0014]


def main():
    path = "results/trained_progress.jsonl"
    latest = {}
    for line in open(path):
        r = json.loads(line)
        cfg = r.get("config", "nrx_rt")
        if cfg not in C:
            continue
        if r.get("num_tx") not in (None, 2):
            continue
        if r.get("channel") not in (None, "DoubleTDLlow"):
            continue
        # keep waterfall-region anchors only (drop debug sanity runs)
        pts = [(s, b) for s, b in zip(r["snr_db"], r["bler"]) if s <= 12]
        if not pts:
            continue
        r = dict(r, snr_db=[p[0] for p in pts], bler=[p[1] for p in pts])
        key = (cfg, r.get("mcs", 0))
        prev = latest.get(key)
        if (prev is None or (r.get("step") or 0) > (prev.get("step") or 0)
                or ((r.get("step") or 0) == (prev.get("step") or 0)
                    and len(r["snr_db"]) > len(prev["snr_db"]))):
            latest[key] = r

    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=150)
    ax.plot(REF_SNR, REF_BLER, color="#8a8a85", ls="--", lw=1.6,
            marker="s", ms=4.5,
            label="reference nrx_rt committed curve (10M iters)")

    for (cfg, _), r in sorted(latest.items()):
        xs, ys, zeros = [], [], []
        for s, b in zip(r["snr_db"], r["bler"]):
            blocks = 840  # bounded-MC default worst case for the bound
            if b <= 0:
                zeros.append((s, 1.0 / blocks))
            else:
                xs.append(s), ys.append(b)
        ax.plot(xs, ys, color=C[cfg], lw=2, marker="o", ms=5,
                label=LABEL[cfg])
        for (zx, zy) in zeros:
            ax.plot([zx], [zy], color=C[cfg], marker="v", ms=7,
                    mfc="none", lw=0)
            ax.annotate("0 errs", (zx, zy), textcoords="offset points",
                        xytext=(6, 4), fontsize=7, color="#5f5f5a")

    ax.set_yscale("log")
    ax.set_ylim(bottom=5e-4)
    ax.set_xlabel("Eb/No [dB]")
    ax.set_ylabel("TBLER")
    ax.set_title("Round-1 trained models — DoubleTDLlow, 2 UE, 132 PRB",
                 fontsize=11)
    ax.grid(True, which="both", alpha=0.25, lw=0.6)
    ax.legend(fontsize=8, loc="upper right")
    fig.tight_layout()
    out = "results/round1_trained_summary.png"
    os.makedirs("results", exist_ok=True)
    fig.savefig(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
