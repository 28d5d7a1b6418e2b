"""Plot the recorded single-pixel internal state traces.

Counterpart of reference scripts/plot_single_pixel_states.py: loads the
pickled dict written by ``--record_single_pixel_states x,y``
(pixel-states.dat) and plots the pixel's internal signals over time.

Usage: python scripts/plot_single_pixel_states.py [pixel-states.dat] [out.png]
"""
from __future__ import annotations

import pickle
import sys

import numpy as np


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "pixel-states.dat"
    out = sys.argv[2] if len(sys.argv) > 2 else "pixel-states.png"
    with open(path, "rb") as f:
        states = pickle.load(f)

    t = states["time"]
    valid = ~np.isnan(t)
    t = t[valid]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
    axes[0].plot(t, states["new_frame"][valid], label="new_frame (DN)")
    axes[0].set_ylabel("DN")
    axes[0].legend()

    for k in ("log_new_frame", "lp_log_frame", "base_log_frame", "diff_frame"):
        axes[1].plot(t, states[k][valid], label=k)
    axes[1].plot(t, states["pos_thres"][valid], "k--", label="pos_thres")
    axes[1].plot(t, -states["neg_thres"][valid], "k:", label="-neg_thres")
    axes[1].set_ylabel("log_e intensity")
    axes[1].legend(fontsize=8)

    axes[2].plot(t, states["final_pos_evts_frame"][valid], "g.", label="ON events")
    axes[2].plot(t, -states["final_neg_evts_frame"][valid], "r.", label="OFF events")
    axes[2].set_ylabel("events/frame")
    axes[2].set_xlabel("time (s)")
    axes[2].legend()

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({int(valid.sum())} samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
