"""Controlled A/B of LS channel-estimation interpolation variants.

Root-causes the +0.64 dB favorable shift of our LS/lin+LMMSE baseline
vs the reference's committed curve (VERDICT round-2, weak #3): the
reference's Sionna LinearInterpolator EXTRAPOLATES past the first/last
pilot in time and frequency (slope of the nearest pilot pair), while
our "lin" clamps to the edge pilot value. Under 400 Hz Doppler, OFDM
symbols 0-1 and 12-13 (4 of 14) are extrapolated, where slope
extrapolation amplifies estimation noise.

On FIXED channel/noise realizations this script measures, per variant
(nn / lin / lin_extrap):
  - chest MSE vs the true effective channel, split per OFDM symbol
  - optional bounded BLER through the full LS+LMMSE receiver (--bler)

Usage:
  python scripts/chest_ab.py [--config nrx_rt] [--ebno 4] [--batch 8]
       [--iters 4] [--bler] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="nrx_rt")
    ap.add_argument("--ebno", type=float, default=4.0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--bler", action="store_true",
                    help="also run bounded BLER through the full "
                         "LS+LMMSE receiver per variant")
    ap.add_argument("--bler-iters", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from neural_rx_tpu.sim.config import Parameters
    from neural_rx_tpu.sim.baseline_e2e import BaselineE2EModel
    from neural_rx_tpu.phy.chest import LSChannelEstimator
    from neural_rx_tpu.phy.misc import binary_source

    p = Parameters(args.config, system="nrx", training=False)
    model = BaselineE2EModel(p, "baseline_lslin_lmmse")
    rg = model.rg
    ests = {name: LSChannelEstimator(rg, itype)
            for name, itype in (("nn", "nn"), ("lin", "lin"),
                                ("lin_extrap", "lin_extrap"))}
    w = jnp.asarray(model.w[:, :, 0])

    n_sym = rg.pilot_mask.shape[0]
    sq = {k: np.zeros(n_sym) for k in ests}
    pw = np.zeros(n_sym)
    n_acc = 0
    for it in range(args.iters):
        key = jax.random.fold_in(jax.random.PRNGKey(1234), it)
        keys = jax.random.split(key, 8)
        bits = binary_source(
            keys[1], (args.batch, p.max_num_tx,
                      model.transmitters[0].tb_size))
        x = model.transmitters[0](bits)
        no = model._noise_variance(args.ebno)
        y, h = model._channel(keys[4], args.batch, x, no)
        h_eff = jnp.einsum("batpsc,tp->batsc", h, w)  # [b,ant,T,14,sc]
        for name, est in ests.items():
            h_hat, _ = est(y, no)
            err = np.asarray(jnp.abs(h_hat - h_eff) ** 2)
            sq[name] += err.mean(axis=(0, 1, 2, 4)) * args.batch
        pw += np.asarray(jnp.abs(h_eff) ** 2).mean(
            axis=(0, 1, 2, 4)) * args.batch
        n_acc += args.batch

    print(f"\nchest MSE per OFDM symbol (config {args.config}, "
          f"Eb/No {args.ebno} dB, {n_acc} slots, |h|^2 normalized):")
    hdr = "sym  " + "".join(f"{k:>12s}" for k in ests) + "   |h|^2"
    print(hdr)
    for s in range(n_sym):
        row = f"{s:3d}  " + "".join(
            f"{sq[k][s] / n_acc / (pw[s] / n_acc):12.4f}" for k in ests)
        print(row + f"  {pw[s] / n_acc:7.3f}")
    tot = {k: (sq[k].sum() / pw.sum()) for k in ests}
    print("avg  " + "".join(f"{tot[k]:12.4f}" for k in ests))
    for k in ("lin", "lin_extrap"):
        print(f"effective-SNR penalty {k} vs nn: "
              f"{10 * np.log10(tot[k] / tot['nn']):+.2f} dB-of-MSE")
    print(f"lin_extrap vs lin MSE ratio: "
          f"{tot['lin_extrap'] / tot['lin']:.3f} "
          f"({10 * np.log10(tot['lin_extrap'] / tot['lin']):+.2f} dB)")

    if args.bler:
        import time
        for name in ("lin", "lin_extrap"):
            model.ls = ests[name]
            errs = blocks = 0
            t0 = time.time()
            for it in range(args.bler_iters):
                key = jax.random.fold_in(jax.random.PRNGKey(777), it)
                out = model(None, key, args.batch, args.ebno,
                            fast_ldpc=True)
                b, b_hat = out[0], out[1]
                ok = np.asarray(
                    (np.asarray(b) == np.asarray(b_hat)).all(axis=-1))
                errs += int((~ok).sum())
                blocks += ok.size
            print(f"BLER[{name}] @ {args.ebno} dB: {errs}/{blocks} = "
                  f"{errs / blocks:.4f}  ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
