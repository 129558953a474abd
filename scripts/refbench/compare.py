"""Head-to-head: real C++ reference engine vs lsdtpu on one sequence.

Runs the headless reference benchmark (build.sh builds it against the
read-only sources in /root/reference/LSD), evaluates its pose dump with
the same keyframe-ATE machinery used for lsdtpu, runs lsdtpu on the
same sequence, and prints both sides.

Usage:  python scripts/refbench/compare.py [dataset_dir] [--runs N]
        python scripts/refbench/compare.py --all   # every GT sequence
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lsdtpu.eval.ate import keyframe_ate  # noqa: E402
from lsdtpu.io.loaders import load_dataset  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
BIN = os.path.join(REPO, "build", "refbench", "lsd_refbench")


def run_reference(data_dir: str):
    with tempfile.NamedTemporaryFile(suffix=".txt") as tf:
        t0 = time.perf_counter()
        out = subprocess.run([BIN, data_dir, "0", tf.name],
                             capture_output=True, text=True, check=True,
                             timeout=600)
        wall = time.perf_counter() - t0
        poses = np.loadtxt(tf.name)
    loop_line = [l for l in out.stdout.splitlines() if l.startswith("frames:")]
    return poses, loop_line[0] if loop_line else "", wall


def ref_keyframe_ate(poses, ds):
    """Keyframe ATE over the keys the reference tracked (reset frames
    excluded - they would poison the metric)."""
    p = ds.param
    lost = poses[:, 0] == -1
    idx = np.asarray(ds.recorded_odom, np.int64) - 1
    keep = (idx >= 0) & (idx < poses.shape[0])
    keep &= ~lost[np.clip(idx, 0, poses.shape[0] - 1)]
    if not keep.any():
        return None, int(lost.sum())
    return keyframe_ate(poses, ds.real_pos[keep],
                        np.asarray(ds.recorded_odom)[keep],
                        p.resol, p.ori_x, p.ori_y), int(lost.sum())


def sweep_all():
    """Reference engine over every ground-truth sequence; one run each.
    Emits a markdown table row per sequence (stdout)."""
    import glob

    roots = sorted(glob.glob("/root/reference/data_20190513/data_f3key/data*")
                   ) + sorted(
        glob.glob("/root/reference/data_20190514/data_f4key/data*"),
        key=lambda p: (len(p), p))
    print("| sequence | scans/s | reset frames | tracked-key ATE rmse (m) "
          "| tracked keys |")
    print("|---|---|---|---|---|")
    for root in roots:
        ds = load_dataset(root)
        poses, loop, wall = run_reference(root)
        rate = loop.split("= ")[1].split(" ")[0] if "= " in loop else "?"
        ate, lost = ref_keyframe_ate(poses, ds)
        name = "/".join(root.split("/")[-3:])
        if ate is None:
            print(f"| {name} | {rate} | {lost}/{len(poses)} | - | 0/"
                  f"{len(ds.real_pos)} |")
        else:
            print(f"| {name} | {rate} | {lost}/{len(poses)} | "
                  f"{ate.rmse:.4f} | {ate.n}/{len(ds.real_pos)} |")


def main():
    if "--all" in sys.argv:
        if not os.path.exists(BIN):
            subprocess.run(["sh", os.path.join(REPO, "scripts", "refbench",
                                               "build.sh")], check=True)
        sweep_all()
        return
    data_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data_20190513/data_f3key/data1"
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if not os.path.exists(BIN):
        subprocess.run(["sh", os.path.join(REPO, "scripts", "refbench",
                                           "build.sh")], check=True)

    ds = load_dataset(data_dir)
    p = ds.param

    print(f"== C++ reference ({runs} runs, {os.cpu_count()} cores, "
          f"30-thread pool) ==")
    for r in range(runs):
        poses, loop, wall = run_reference(data_dir)
        lost = poses[:, 0] == -1
        tracked = poses[~lost]
        # ATE over tracked keyframes only (resets would poison it)
        idx = np.asarray(ds.recorded_odom, np.int64) - 1
        keep = (idx >= 0) & (idx < poses.shape[0])
        keep &= ~lost[np.clip(idx, 0, poses.shape[0] - 1)]
        ate = keyframe_ate(poses, ds.real_pos[keep],
                           np.asarray(ds.recorded_odom)[keep],
                           p.resol, p.ori_x, p.ori_y) if keep.any() else None
        print(f"  run {r}: {loop};  reset frames "
              f"{int(lost.sum())}/{len(poses)}"
              + (f";  keyframe ATE over tracked keys "
                 f"rmse {ate.rmse:.4f} m max {ate.max:.4f} m "
                 f"({ate.n} keys)" if ate else ""))

    print("== lsdtpu (same sequence, CPU backend, f32) ==")
    from lsdtpu.config import DEFAULT
    from lsdtpu.oracle import driver as odrv
    from lsdtpu.runtime import make_map_context, run_sequence, stack_frames

    art = odrv.prepare_map(ds.map_value, p.resol)
    ctx = make_map_context(art.lines_info, art.map_cache, p.resol,
                           p.ori_x, p.ori_y)
    frames = stack_frames(ds)
    t0 = time.perf_counter()
    outs = jax.tree.map(np.asarray,
                        jax.block_until_ready(
                            jax.jit(lambda f, c: run_sequence(f, c, DEFAULT))(
                                frames, ctx)))
    wall = time.perf_counter() - t0
    poses = outs["pose"]
    lost = int((poses[:, 0] == -1).sum())
    ate = keyframe_ate(poses, ds.real_pos, ds.recorded_odom, p.resol,
                       p.ori_x, p.ori_y)
    F = poses.shape[0]
    print(f"  {F} frames in {wall:.3f} s (compile incl.);  reset frames "
          f"{lost}/{F};  keyframe ATE rmse {ate.rmse:.4f} m "
          f"max {ate.max:.4f} m ({ate.n} keys)")
    print("  (on-chip throughput: python bench.py; docs/RESULTS.md)")


if __name__ == "__main__":
    main()
