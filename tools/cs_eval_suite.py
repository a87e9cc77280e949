"""Run the CS learning-proof evaluations in ONE chip process: the
scrambled-context probe (tools/context_probe.py) followed by the rollout
coherence check (scripts/cs_rollout.py).

The tunneled TPU relay needs minutes of cooldown between chip processes
(ROADMAP round-5 notes), so chaining the evaluations in-process via argv
patching halves the wall-clock of the post-training pipeline.

Usage:
  python tools/cs_eval_suite.py --ckpt-dir /tmp/cs_pan_ckpt \
      --mds /tmp/cs_pan_mds --vae saved_models/vae_lunar_lander.ad \
      --lat-mean 0.1868 --lat-std 0.6063
"""
import argparse
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tools"))


def call(mod, argv):
    old = sys.argv
    try:
        sys.argv = [mod.__name__] + argv
        mod.main()
    finally:
        sys.argv = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--mds", required=True, help="training split (probe)")
    ap.add_argument("--rollout-mds", default=None,
                    help="held-out split for the rollout check (defaults to "
                         "--mds; use a different-seed build_cs_dataset split "
                         "so the rollout measures generalization)")
    ap.add_argument("--vae", default=None)
    ap.add_argument("--lat-mean", type=float, default=0.0)
    ap.add_argument("--lat-std", type=float, default=1.0)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="run_artifacts/cs_rollout")
    args = ap.parse_args()

    import context_probe
    import cs_rollout

    common = ["--ckpt-dir", args.ckpt_dir, "--mds", args.mds,
              "--lat-mean", str(args.lat_mean), "--lat-std", str(args.lat_std),
              "--use-actions"]
    print("== scrambled-context probe ==", flush=True)
    call(context_probe, common + ["--batches", "4"])
    print("== rollout coherence ==", flush=True)
    rollout = ["--ckpt-dir", args.ckpt_dir,
               "--mds", args.rollout_mds or args.mds,
               "--lat-mean", str(args.lat_mean),
               "--lat-std", str(args.lat_std), "--use-actions",
               "--frames", str(args.frames), "--ema", "-1",
               "--out", args.out]
    if args.vae:
        rollout += ["--vae", args.vae]
    call(cs_rollout, rollout)


if __name__ == "__main__":
    main()
