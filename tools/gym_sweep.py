"""Gym-flagship fused-conv policy sweep (round-4 MFU push).

Round 4's XLA-path changes (context conv as one channel-concatenated 2D
conv, packed-i32 tap rolls in the Pallas kernels) moved the CS-scale
fused/XLA balance to a wash (tools/cs_sweep.py) -- this re-derives the
gym-scale policy the same way: run `bench.py --train-only` once per
gating policy, one PROCESS per cell (in-process env flips + clear_caches
wedge the tunneled runtime; see cs_sweep.py), and print the samples/s
table that decides the shipped AD_TPU_FUSED_MAX_CP default.

Usage: python tools/gym_sweep.py
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    ("Cp<=96", {}),
    ("Cp<=128", {"AD_TPU_FUSED_MAX_CP": "128"}),
    ("Cp<=192", {"AD_TPU_FUSED_MAX_CP": "192"}),
    ("no cap, VMEM 96M", {"AD_TPU_FUSED_MAX_CP": "99999",
                          "AD_TPU_FUSED_VMEM_MB": "96"}),
]


def main():
    for i, (name, env) in enumerate(CELLS):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--train-only"],
            env={**os.environ, **env}, capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode or not line:
            print(f"{name:24s} FAILED: exit {r.returncode} "
                  f"{(r.stderr.strip().splitlines() or [''])[-1]}",
                  flush=True)
        else:
            import json
            v = json.loads(line[-1])["value"]
            print(f"{name:24s} {v:7.2f} samples/s", flush=True)
        if i + 1 < len(CELLS):
            time.sleep(150)  # relay grant reap before the next register


if __name__ == "__main__":
    main()
