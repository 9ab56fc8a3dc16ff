"""Beam-vs-greedy A/B for the neural G2P tier (CPU, shipped weights).

Settles the `inference.neural_g2p_beam` default with data: decodes a
seeded held-out subsample with greedy and beam-N and prints exact/PER per
setting.  Runs anywhere (the beam path is sequential numpy; greedy uses
the batched JAX path on whatever backend is default).

    python tools/g2p_beam_ab.py --weights emotts/text/data/g2p_weights.npz \
        --n 600 --beams 2,4,8

The held-out split comes from tools/train_g2p.py::build_pairs on the
CURRENT bundled lexicon with the same --seed/--holdout convention, so
numbers are comparable across runs only at a fixed lexicon state (see
BENCH_NOTES "Split caveat").
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from train_g2p import build_pairs, evaluate  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="weights npz (default: the bundled g2p_weights.npz)")
    ap.add_argument("--n", type=int, default=600,
                    help="seeded held-out subsample size")
    ap.add_argument("--beams", default="2,4",
                    help="comma-separated beam widths to A/B against greedy")
    ap.add_argument("--seed", type=int, default=0, help="split seed")
    ap.add_argument("--holdout", type=float, default=0.1)
    args = ap.parse_args()

    from emotts.text import neural_g2p as ng

    path = args.weights or ng.BUNDLED_WEIGHTS
    data = np.load(path)
    params = {k: data[k].astype(np.float32) for k in data.files
              if not k.startswith("__")}
    n_heads = (int(data["__n_heads__"][0]) if "__n_heads__" in data.files
               else ng.N_HEADS)

    _, eval_pairs = build_pairs(seed=args.seed, holdout_frac=args.holdout)
    rng = np.random.default_rng(13)  # same subsample seed as --beam-eval
    pick = rng.permutation(len(eval_pairs))[: args.n]
    sub = [eval_pairs[i] for i in pick]
    print(f"weights={path}  held-out pool={len(eval_pairs)}  sample={len(sub)}")

    rows = {}
    t0 = time.time()
    rows["greedy"] = evaluate(params, sub, "greedy", decode="greedy",
                              n_heads=n_heads)
    print(f"  ({time.time() - t0:.0f}s)")
    for b in [int(x) for x in args.beams.split(",") if x.strip()]:
        t0 = time.time()
        rows[f"beam{b}"] = evaluate(params, sub, f"beam-{b}", decode="beam",
                                    beam=b, n_heads=n_heads)
        print(f"  ({time.time() - t0:.0f}s)")

    print("\n| decode | exact | exact(no-stress) | PER |")
    print("|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['exact']:.3f} | {r['exact_ns']:.3f} "
              f"| {r['per']:.4f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
