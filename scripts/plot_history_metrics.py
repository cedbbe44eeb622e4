#!/usr/bin/env python
"""Plot conserved-quantity history from a metrics CSV.

Analogue of the reference's scripts/plot_history_metrics.py (reads the CSV
written by SimulationHistory.save_metrics_to_csv / --csv; same column schema:
iteration,energy,ang_momentum,density_center_{x,y,z}).

Usage: python scripts/plot_history_metrics.py metrics.csv [out_prefix]
"""
import sys

import numpy as np


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    path = sys.argv[1]
    prefix = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.genfromtxt(path, delimiter=",", skip_header=1)
    if data.ndim == 1:
        data = data[None, :]
    it = data[:, 0]

    fig, axes = plt.subplots(3, 1, figsize=(8, 10), sharex=True)
    axes[0].plot(it, data[:, 1])
    axes[0].set_ylabel("total energy (J)")
    e0 = data[0, 1]
    if e0 != 0:
        drift = (data[:, 1] - e0) / abs(e0)
        axes[0].set_title(f"max |dE/E0| = {np.abs(drift).max():.3e}")
    axes[1].plot(it, data[:, 2])
    axes[1].set_ylabel("|angular momentum|")
    for k, lbl in ((3, "x"), (4, "y"), (5, "z")):
        axes[2].plot(it, data[:, k], label=lbl)
    axes[2].set_ylabel("density center (m)")
    axes[2].set_xlabel("iteration")
    axes[2].legend()
    fig.tight_layout()
    out = f"{prefix}_metrics.png"
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
