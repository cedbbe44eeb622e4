"""murb-compatible command-line parsing.

Preserves the reference's flag surface and semantics (ref:
src/murb/main.cpp:61-165 / src/common/utils/ArgumentsReader.cpp): required
``-n``/``-i``; facultative ``-v -h --help --dt --ngs --ww --wh --nv --nvc
--im --soft -s --gf``; plus TPU-native extensions (seed, precision, shards,
scan mode, CSV export) that have no reference counterpart.
"""
from __future__ import annotations

import argparse
import dataclasses


@dataclasses.dataclass
class MurbConfig:
    n_bodies: int
    n_iterations: int
    verbose: bool = False
    dt: float = 3600.0                      # ref: main.cpp:45
    softening: float = 2.0e8                # ref: main.cpp:47
    gs_enable: bool = True
    visu_enable: bool = True
    visu_color: bool = True
    win_width: int = 1024
    win_height: int = 768
    impl_tag: str = "cpu+naive"             # ref: main.cpp:40
    scheme: str = "galaxy"                  # ref: main.cpp:51
    show_gflops: bool = False
    # --- TPU-native extensions ---
    seed: int = 123
    precision: str = "fp32"
    scheme_file: str | None = None
    shards: int = 0                          # 0 = all local devices (shard engines)
    scan: bool = False                       # run whole simulation as one lax.scan
    csv: str | None = None                   # metrics CSV path (tracking engines)
    visu_out: str | None = None              # offline frame render directory
    visu_live: int | None = None             # live browser viewer port
    chunk: int = 1024
    block_i: int = 0                         # 0 = kernel picks
    block_j: int = 0
    gpu_fraction: float | None = None        # hetero-style uneven shard knob
    list_impls: bool = False
    save_state: str | None = None            # checkpoint path written at end
    save_every: int = 0                      # async periodic checkpoint interval
    load_state: str | None = None            # resume from checkpoint
    profile: str | None = None               # jax.profiler trace directory
    dump_traj: str | None = None             # binary trajectory output path
    dump_every: int = 1                      # record every k-th iteration
    check_finite: bool = False               # fail-fast NaN guard per frame
    kernel: str = "auto"                     # acc kernel for wrapper engines
    ite_chunk: int = 1                       # iterations per device dispatch
    cam_azim: float = 0.0                    # offline renderer camera
    cam_elev: float = 90.0
    # True when the user passed the flag explicitly (vs. the default).
    # --load-state uses these to decide whether CLI physics constants
    # override the checkpoint's saved dt/softening.
    dt_explicit: bool = False
    soft_explicit: bool = False
    adapt_every: int | None = None           # proxy-order re-check period
    #                                          (None = auto: 64 in the frame
    #                                          loop, off under --scan)
    autotune: bool = False                   # first-use block-size sweep
    m2l_dots: str = "fp32"                   # FMM M2L matmul tier
    tol: float = 1e-4                        # fast-solver force-error target
    near: str = "auto"                       # tpu+proxy near-field mode


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="murb-tpu",
        description="TPU-native n-body simulation (murb-compatible CLI)",
        add_help=False,
    )
    req = p.add_argument_group("required arguments")
    req.add_argument("-n", dest="n_bodies", type=int, default=None,
                     help="the number of generated bodies.")
    req.add_argument("-i", dest="n_iterations", type=int, default=None,
                     help="the number of iterations to compute.")

    fac = p.add_argument_group("facultative arguments")
    fac.add_argument("-v", dest="verbose", action="store_true",
                     help="enable verbose mode.")
    fac.add_argument("-h", "--help", action="help",
                     help="display this help.")
    fac.add_argument("--dt", dest="dt", type=float, default=None,
                     help="select a fixed time step in second (default is 3600 sec).")
    fac.add_argument("--ngs", dest="gs_enable", action="store_false",
                     help="disable geometry-style rendering for visu.")
    fac.add_argument("--ww", dest="win_width", type=int, default=1024,
                     help="the width of the window in pixel (default is 1024).")
    fac.add_argument("--wh", dest="win_height", type=int, default=768,
                     help="the height of the window in pixel (default is 768).")
    fac.add_argument("--nv", dest="visu_enable", action="store_false",
                     help="no visualization (disable visu).")
    fac.add_argument("--nvc", dest="visu_color", action="store_false",
                     help="visualization without colors.")
    fac.add_argument("--im", dest="impl_tag", type=str, default="cpu+naive",
                     help="code implementation tag (see --list-impls).")
    fac.add_argument("--soft", dest="softening", type=float, default=None,
                     help="softening factor.")
    fac.add_argument("-s", dest="scheme", type=str, default="galaxy",
                     help='bodies scheme ("galaxy", "random" or a two-galaxy .tab file scheme).')
    fac.add_argument("--gf", dest="show_gflops", action="store_true",
                     help="display the number of GFlop/s.")

    ext = p.add_argument_group("TPU-native extensions")
    ext.add_argument("--seed", type=int, default=123,
                     help="RNG seed for the initial conditions (default 123).")
    ext.add_argument("--precision", choices=("fp32", "fp64", "bf16"), default="fp32",
                     help="state/compute precision (default fp32; fp64 is CPU-oriented).")
    ext.add_argument("--scheme-file", dest="scheme_file", type=str, default=None,
                     help="path to the two-galaxy .tab file for the merger scheme.")
    ext.add_argument("--shards", type=int, default=0,
                     help="device count for shard engines (0 = all local devices).")
    ext.add_argument("--scan", action="store_true",
                     help="run the whole simulation as one lax.scan dispatch "
                          "(maximum throughput; per-iteration verbose lines disabled).")
    ext.add_argument("--csv", type=str, default=None,
                     help="write tracked metrics to this CSV (tracking engines).")
    ext.add_argument("--visu-out", dest="visu_out", type=str, default=None,
                     help="render offline frames (PNG) into this directory.")
    ext.add_argument("--visu-live", dest="visu_live", type=int, default=None,
                     nargs="?", const=8797, metavar="PORT",
                     help="serve a live WebGL viewer on this port (default "
                          "8797; 0 = ephemeral). Reach it via ssh -L. "
                          "Space pauses, PgUp/PgDn scale dt.")
    ext.add_argument("--chunk", type=int, default=1024,
                     help="i-chunk size for chunked XLA engines.")
    ext.add_argument("--block-i", dest="block_i", type=int, default=0,
                     help="Pallas kernel i-block size (0 = auto).")
    ext.add_argument("--block-j", dest="block_j", type=int, default=0,
                     help="Pallas kernel j-block size (0 = auto).")
    ext.add_argument("--gpu-fraction", dest="gpu_fraction", type=float, default=None,
                     help="uneven shard fraction for the hetero-style engine "
                          "(reference env MURB_HETERO_GPU_FRACTION).")
    ext.add_argument("--list-impls", action="store_true", default=False,
                     help="list available implementation tags and exit.")
    ext.add_argument("--save-state", dest="save_state", type=str, default=None,
                     help="write a state checkpoint (.npz) when the run ends.")
    ext.add_argument("--save-every", dest="save_every", type=int, default=0,
                     help="also checkpoint to --save-state every K iterations "
                          "(asynchronous write-behind, atomic rename; the "
                          "preemption-safety knob for long runs).")
    ext.add_argument("--load-state", dest="load_state", type=str, default=None,
                     help="resume from a state checkpoint instead of -s scheme.")
    ext.add_argument("--profile", type=str, default=None,
                     help="capture a jax.profiler trace of the run into this "
                          "directory (view with tensorboard/xprof).")
    ext.add_argument("--dump-traj", dest="dump_traj", type=str, default=None,
                     help="record positions to a binary MURBTRAJ file "
                          "(non-blocking background writer).")
    ext.add_argument("--dump-every", dest="dump_every", type=int, default=1,
                     help="record every k-th iteration (default 1).")
    ext.add_argument("--ite-chunk", dest="ite_chunk", type=int, default=1,
                     help="iterations per device dispatch in the frame loop "
                          "(amortizes host latency; verbose lines print per "
                          "chunk).")
    ext.add_argument("--cam-azim", dest="cam_azim", type=float, default=0.0,
                     help="offline renderer camera azimuth (degrees).")
    ext.add_argument("--cam-elev", dest="cam_elev", type=float, default=90.0,
                     help="offline renderer camera elevation (degrees; 90 = "
                          "top-down xy view).")
    ext.add_argument("--kernel", type=str, default="auto",
                     help="acceleration kernel for tracking/leapfrog/kdk "
                          "engines: auto|naive|chunked|tile|hybrid|mxu|"
                          "proxy|fmm|adaptive (fmm falls through to "
                          "adaptive when the dense hierarchy cannot meet "
                          "--tol on the box).")
    ext.add_argument("--autotune", action="store_true", default=False,
                     help="sweep Pallas block sizes on first use of this "
                          "(kernel, N) and persist the winner beside the "
                          "compile cache (also via MURB_AUTOTUNE=1).")
    ext.add_argument("--tol", dest="tol", type=float, default=1e-4,
                     help="fast-solver relative force-error target: the "
                          "proxy/fmm Chebyshev order is the smallest "
                          "meeting it under the measured-calibrated "
                          "error model (tpu+proxy and the proxy/fmm "
                          "tracking kernels; default 1e-4 -- an order "
                          "tighter than the reference's 1e-3 test "
                          "tolerance).")
    ext.add_argument("--m2l-dots", dest="m2l_dots", default="fp32",
                     choices=("fp32", "mixed", "bf16x3"),
                     help="FMM level-sweep matmul tier (tpu+proxy "
                          "hierarchy and gpu+tracking --kernel fmm): "
                          "fp32 = 6-pass emulation (default, ~1.6e-5 "
                          "force err); bf16x3 = 3-pass splits (~20%% "
                          "faster, ~3e-4 err); mixed = fp32 near shell + "
                          "bf16x3 far shell.")
    ext.add_argument("--near", dest="near", default="auto",
                     choices=("auto", "interp", "adaptive"),
                     help="tpu+proxy near-field mode: interp = the dense "
                          "hierarchy's interpolated near list (needs "
                          "finest cells ~ softening); adaptive = the "
                          "occupied-cell sparse hierarchy with an exact "
                          "P2P stage (scale-free: clustered boxes at any "
                          "softening); auto (default) = interp when "
                          "feasible, adaptive when its measured-rate "
                          "cost model beats the exact kernel, else the "
                          "exact fallback.")
    ext.add_argument("--adapt-every", dest="adapt_every", type=int,
                     default=None,
                     help="re-derive the proxy/fmm order from the current "
                          "box every K iterations and rebuild the step if "
                          "the system outgrew it (tpu+proxy only; 0 = off; "
                          "default: 64 in the frame loop, off under --scan "
                          "where the post-run warning covers it).")
    ext.add_argument("--check-finite", dest="check_finite", action="store_true",
                     help="abort with a clear error if the state goes "
                          "NaN/Inf (fail-fast debug mode; adds a device "
                          "sync per frame).")
    return p


def parse_args(argv=None) -> MurbConfig:
    ns = build_parser().parse_args(argv)
    if not ns.list_impls and (ns.n_bodies is None or ns.n_iterations is None):
        build_parser().error("the arguments -n and -i are required")
    ns.dt_explicit = ns.dt is not None
    ns.soft_explicit = ns.softening is not None
    if ns.dt is None:
        ns.dt = 3600.0                       # ref: main.cpp:45
    if ns.softening is None:
        ns.softening = 2.0e8                 # ref: main.cpp:47
    if ns.softening == 0.0:
        # ref: main.cpp:152-155
        raise SystemExit("Softening factor can't be equal to 0... exiting.")
    fields = {f.name for f in dataclasses.fields(MurbConfig)}
    return MurbConfig(**{k: v for k, v in vars(ns).items() if k in fields})
