"""Result visualization: BLER curves + CSV export from results pickles
(mirror of the reference plot_results notebook)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--results", default="/tmp/demo_results.pkl")
ap.add_argument("--out", default="/tmp/nrx_results")
ap.add_argument("--smoke", action="store_true")
args = ap.parse_args()

from neural_rx_tpu.sim.metrics import plot_results, export_csv

if not os.path.exists(args.results):
    # demo data if no results yet
    from neural_rx_tpu.sim.simber import save_results
    os.makedirs(os.path.dirname(args.results) or ".", exist_ok=True)
    save_results(args.results, "demo", "Neural Receiver", 2, 0,
                 [0, 1, 2, 3, 4], [.2, .1, .03, .006, .001],
                 [.9, .66, .32, .09, .016])
    save_results(args.results, "demo", "LMMSE+KBest", 2, 0,
                 [0, 1, 2, 3, 4], [.3, .15, .05, .01, .002],
                 [.81, .53, .2, .04, .004])
    print("(wrote demo results)")

plot_results(args.results, args.out + "_bler.png", metric="bler",
             title="PUSCH BLER")
export_csv(args.results, args.out + ".csv")
print(f"wrote {args.out}_bler.png and {args.out}.csv")

if args.smoke:
    # golden outputs (examples/expected_outputs.md)
    assert os.path.getsize(args.out + "_bler.png") > 1000
    rows = open(args.out + ".csv").read().strip().splitlines()
    assert len(rows) >= 3 and "," in rows[0], rows[:2]
    print("SMOKE PASSED")
