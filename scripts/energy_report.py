#!/usr/bin/env python
"""Energy-efficiency report: integrate a power log over a run window.

Analogue of the reference's measure_energy.py + parse_energy_log.py pipeline
(ref: scripts/measure_energy.py:47-64, parse_energy_log.py:20-47): given a
power-sample log and the run's frame statistics, reports joules, mean watts,
FPS/W and J/frame per channel.

Power log format (CSV): ``timestamp_s,channel,watts`` -- one row per sample.
TPU VMs don't expose per-chip power to guests the way the reference's
node-conso setup does; collect samples from your fleet telemetry (or a PDU)
and feed them here.

Usage:
  python scripts/energy_report.py power.csv --t0 100.0 --t1 160.0 --frames 500
"""
import argparse
import sys
from collections import defaultdict

import numpy as np


def integrate(ts: np.ndarray, watts: np.ndarray, t0: float, t1: float) -> tuple[float, float]:
    """Trapezoidal energy (J) and mean power (W) over [t0, t1]."""
    sel = (ts >= t0) & (ts <= t1)
    if sel.sum() < 2:
        return 0.0, 0.0
    t, w = ts[sel], watts[sel]
    joules = float(np.trapezoid(w, t))
    return joules, joules / max(t[-1] - t[0], 1e-9)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log", help="CSV of timestamp_s,channel,watts")
    ap.add_argument("--t0", type=float, required=True, help="run start (s)")
    ap.add_argument("--t1", type=float, required=True, help="run end (s)")
    ap.add_argument("--frames", type=int, required=True,
                    help="iterations completed in [t0, t1]")
    args = ap.parse_args()

    channels: dict[str, list[tuple[float, float]]] = defaultdict(list)
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("timestamp"):
                continue
            t, ch, w = line.split(",")
            channels[ch].append((float(t), float(w)))

    dur = args.t1 - args.t0
    fps = args.frames / dur
    print(f"window: {dur:.2f} s, {args.frames} frames, {fps:.3f} FPS")
    print(f"{'channel':16s} {'J':>12s} {'mean W':>9s} {'FPS/W':>8s} {'J/frame':>9s}")
    for ch, samples in sorted(channels.items()):
        samples.sort()
        ts = np.array([s[0] for s in samples])
        ws = np.array([s[1] for s in samples])
        joules, mean_w = integrate(ts, ws, args.t0, args.t1)
        if mean_w <= 0:
            print(f"{ch:16s} {'--':>12s}")
            continue
        print(f"{ch:16s} {joules:12.1f} {mean_w:9.2f} {fps/mean_w:8.3f} "
              f"{joules/args.frames:9.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
