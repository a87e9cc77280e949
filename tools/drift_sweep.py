"""Rollout-drift sampler sweep (VERDICT r4 #3).

Runs scripts/rollout_drift.py cells over sampler knobs (guidance, S_churn,
num_steps, sigma_min, rho) sequentially on the chip and tabulates frame-32
latent MSE vs the persistence baseline. The r4 protocol (32 steps, churn
20, sigma_min 0.002, rho 7, guidance 1) measured frame32 MSE 0.0472 vs
persistence 0.0289; the reference's own rollout recipe is sigma_min=0.4,
rho=2, 64 steps, churn 0 (generation_code.py:94).

Usage: python tools/drift_sweep.py [--episodes 2] [--frames 32]
"""
import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CELLS = [
    ("r4-protocol", []),
    ("no-churn", ["--s-churn", "0"]),
    ("ref-recipe", ["--s-churn", "0", "--sigma-min", "0.4", "--rho", "2",
                    "--num-steps", "64"]),
    ("ref-recipe-32", ["--s-churn", "0", "--sigma-min", "0.4", "--rho", "2"]),
    ("guidance1.5", ["--guidance", "1.5"]),
    ("ref+g1.5", ["--s-churn", "0", "--sigma-min", "0.4", "--rho", "2",
                  "--num-steps", "64", "--guidance", "1.5"]),
    # in-distribution action conditioning (ADVICE r3: the heuristic lander
    # policy is OOD vs the uniform-random actions gym_train trained on)
    ("ref-random", ["--s-churn", "0", "--sigma-min", "0.4", "--rho", "2",
                    "--policy", "random"]),
    ("r4-random", ["--policy", "random"]),
]

SUMMARY = re.compile(r"latent MSE frame1=([\d.]+) frame(\d+)=([\d.]+) "
                     r"\(persistence ([\d.]+)\); std drift ([\d.]+)x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--unet",
                    default="saved_models/gym_r3/"
                            "unet_46M_ema0.050_step40000_bfloat16.ad")
    ap.add_argument("--vae", default="saved_models/vae_lunar_lander.ad")
    ap.add_argument("--cells", default=None,
                    help="comma-separated cell names (default: all)")
    ap.add_argument("--in-process", action="store_true",
                    help="run cells by calling rollout_drift.main() in THIS "
                         "process (one chip claim for the whole sweep -- the "
                         "tunneled relay needs minutes of cooldown between "
                         "chip processes, so per-cell subprocesses wedge; "
                         "jit caches are also shared across cells)")
    args = ap.parse_args()

    sel = set(args.cells.split(",")) if args.cells else None
    results = []
    for name, extra in CELLS:
        if sel and name not in sel:
            continue
        t0 = time.time()
        argv = ["--unet", os.path.join(REPO, args.unet),
                "--vae", os.path.join(REPO, args.vae),
                "--episodes", str(args.episodes),
                "--frames", str(args.frames),
                "--out", f"/tmp/drift_{name}"] + extra
        if args.in_process:
            import contextlib
            import io
            sys.path.insert(0, os.path.join(REPO, "scripts"))
            import rollout_drift
            buf = io.StringIO()
            old_argv, rc = sys.argv, 0
            try:
                sys.argv = ["rollout_drift.py"] + argv
                with contextlib.redirect_stdout(buf):
                    rollout_drift.main()
            except Exception as e:
                rc, tail = 1, repr(e)
            finally:
                sys.argv = old_argv
            out, err = buf.getvalue(), ""
        else:
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/rollout_drift.py")] + argv,
                capture_output=True, text=True, timeout=3000)
            out, err, rc = r.stdout, r.stderr, r.returncode
            tail = ((err or out).strip().splitlines() or [""])[-1]
        m = None
        for line in (out + err).splitlines():
            mm = SUMMARY.search(line)
            if mm:
                m = mm
        if rc or not m:
            print(f"{name:16s} FAILED exit={rc} {tail}", flush=True)
        else:
            f1, flast_i, flast, pers, stdx = m.groups()
            verdict = "BEATS" if float(flast) < float(pers) else "worse than"
            results.append((name, float(f1), float(flast), float(pers)))
            print(f"{name:16s} frame1={f1} frame{flast_i}={flast} "
                  f"persistence={pers} std={stdx}x -> {verdict} persistence "
                  f"({time.time() - t0:.0f}s)", flush=True)
    if results:
        best = min(results, key=lambda r: r[2])
        print(f"# best: {best[0]} frame32={best[2]:.4f} "
              f"(persistence {best[3]:.4f})")


if __name__ == "__main__":
    main()
