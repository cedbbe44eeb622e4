#!/usr/bin/env python
"""Energy-measurement collection driver: sample power while running murb.

The TPU-native analogue of the reference's Slurm/NCM pipeline (ref:
scripts/measure_energy.py -- submit job, run `node-conso -t 5` sampler,
parse energy_*.log): here the sampler is a background thread in this
process, the workload is the murb CLI run as a subprocess, and the report
is scripts/energy_report.py over the produced CSV.

Power sources are probed in order; the first available wins:

  rapl     Linux powercap RAPL counters (/sys/class/powercap/*/energy_uj)
           -- host CPU+DRAM energy.  Present on bare-metal/most VMs that
           pass the MSRs through; absent on Cloud TPU VMs.
  hwmon    /sys/class/hwmon power sensors (power*_input, microwatts).
  tdp      Model-based UPPER BOUND: --tdp-watts (per device) times the
           device count, emitted as a flat line.  Cloud TPU VMs expose no
           guest-visible chip power telemetry (no sysfs node, no libtpu
           counter; fleet power lives in Google's datacenter monitoring),
           so a measured per-chip number is structurally unavailable here
           -- the TDP line keeps the FPS/W pipeline runnable and is
           clearly labeled an upper bound, not a measurement.

Usage:
  python scripts/measure_energy.py -- -n 30000 -i 100 --im tpu+hybrid \
      --nv --gf --scan
  python scripts/measure_energy.py --source tdp --tdp-watts 200 -- \
      -n 200000 -i 200 --im tpu+proxy --nv --scan

The murb arguments follow ``--`` verbatim.  Produces power.csv
(timestamp_s,channel,watts) and prints the energy_report table for the
workload window.
"""
from __future__ import annotations

import argparse
import glob
import os
import shlex
import subprocess
import sys
import threading
import time

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPT_DIR)


# ------------------------------------------------------------- samplers
class RaplSampler:
    """Cumulative-energy counters -> watts by finite difference."""

    name = "rapl"

    def __init__(self):
        self.zones = []
        for p in sorted(glob.glob("/sys/class/powercap/*/energy_uj")):
            zone = os.path.dirname(p)
            try:
                with open(p) as f:
                    int(f.read())
            except OSError:
                continue
            label = os.path.basename(zone)
            np_ = os.path.join(zone, "name")
            if os.path.exists(np_):
                with open(np_) as f:
                    label = f"{label}:{f.read().strip()}"
            self.zones.append((label, p))
        if not self.zones:
            raise OSError("no readable powercap zones")
        self._last = {}

    def sample(self):
        now = time.time()
        out = []
        for label, p in self.zones:
            try:
                with open(p) as f:
                    uj = int(f.read())
            except OSError:
                continue
            prev = self._last.get(label)
            self._last[label] = (now, uj)
            if prev is not None and now > prev[0]:
                duj = uj - prev[1]
                if duj < 0:  # counter wrap
                    continue
                out.append((label, duj / 1e6 / (now - prev[0])))
        return out


class HwmonSampler:
    """Instantaneous power sensors (microwatts)."""

    name = "hwmon"

    def __init__(self):
        self.sensors = []
        for p in sorted(glob.glob("/sys/class/hwmon/hwmon*/power*_input")):
            try:
                with open(p) as f:
                    int(f.read())
            except OSError:
                continue
            hw = os.path.dirname(p)
            label = os.path.basename(hw)
            np_ = os.path.join(hw, "name")
            if os.path.exists(np_):
                with open(np_) as f:
                    label = f"{label}:{f.read().strip()}"
            self.sensors.append((f"{label}:{os.path.basename(p)}", p))
        if not self.sensors:
            raise OSError("no hwmon power sensors")

    def sample(self):
        out = []
        for label, p in self.sensors:
            try:
                with open(p) as f:
                    out.append((label, int(f.read()) / 1e6))
            except OSError:
                pass
        return out


class TdpSampler:
    """Flat upper-bound line: n_devices * tdp watts (documented fallback)."""

    name = "tdp"

    def __init__(self, tdp_watts: float, n_devices: int):
        self.w = tdp_watts * max(n_devices, 1)
        self.label = f"tdp_bound_x{max(n_devices, 1)}"

    def sample(self):
        return [(self.label, self.w)]


def pick_sampler(source: str, tdp_watts: float):
    order = ["rapl", "hwmon", "tdp"] if source == "auto" else [source]
    for name in order:
        try:
            if name == "rapl":
                return RaplSampler()
            if name == "hwmon":
                return HwmonSampler()
            if name == "tdp":
                nd = os.environ.get("MURB_ENERGY_DEVICES")
                if nd is None:
                    try:
                        import jax

                        nd = jax.device_count()
                    except Exception:  # noqa: BLE001 -- count is cosmetic
                        nd = 1
                return TdpSampler(tdp_watts, int(nd))
        except OSError as e:
            print(f"# source {name} unavailable: {e}")
    raise SystemExit("no power source available")


# ------------------------------------------------------------------ main
def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--source", choices=("auto", "rapl", "hwmon", "tdp"),
                    default="auto")
    ap.add_argument("--tdp-watts", type=float, default=200.0,
                    help="per-device bound for the tdp source (default 200)")
    ap.add_argument("--interval", type=float, default=0.5,
                    help="sampling period in seconds (ref node-conso -t 5)")
    ap.add_argument("--out", default="power.csv")
    ap.add_argument("murb_args", nargs=argparse.REMAINDER,
                    help="murb CLI arguments after --")
    args = ap.parse_args()
    murb_args = [a for a in args.murb_args if a != "--"]
    if not murb_args:
        ap.error("pass the murb CLI arguments after --")

    sampler = pick_sampler(args.source, args.tdp_watts)
    print(f"# power source: {sampler.name} -> {args.out}")

    stop = threading.Event()
    rows: list[tuple[float, str, float]] = []

    def run_sampler():
        sampler.sample()  # prime cumulative counters
        while not stop.wait(args.interval):
            now = time.time()
            for ch, w in sampler.sample():
                rows.append((now, ch, w))

    th = threading.Thread(target=run_sampler, daemon=True)
    th.start()

    # MURB_ENERGY_CMD overrides the workload launcher (tests; or e.g. a
    # wrapper that srun's the run, the reference's Slurm-submission role)
    cmd = os.environ.get("MURB_ENERGY_CMD")
    argv = ([*shlex.split(cmd), *murb_args] if cmd
            else [sys.executable, "-m", "murb_tpu", *murb_args])
    t0 = time.time()
    proc = subprocess.run(argv, cwd=REPO, capture_output=True, text=True)
    t1 = time.time()
    stop.set()
    th.join(timeout=5)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)

    with open(args.out, "w") as f:
        f.write("timestamp_s,channel,watts\n")
        for t, ch, w in rows:
            f.write(f"{t:.3f},{ch},{w:.3f}\n")

    frames = 0
    for flag, val in zip(murb_args, murb_args[1:]):
        if flag == "-i":
            frames = int(val)
    if frames and len(rows) >= 2:
        rep = subprocess.run(
            [sys.executable, os.path.join(SCRIPT_DIR, "energy_report.py"),
             args.out, "--t0", str(t0), "--t1", str(t1),
             "--frames", str(frames)],
            capture_output=True, text=True)
        sys.stdout.write(rep.stdout)
    elif not frames:
        print("# no -i flag found; energy_report skipped "
              f"(integrate {args.out} manually)")
    else:
        print(f"# fewer than 2 samples collected; see {args.out}")
    if sampler.name == "tdp":
        print("# NOTE: tdp source is an UPPER BOUND (no guest-visible chip "
              "power on Cloud TPU VMs), not a measurement.")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
