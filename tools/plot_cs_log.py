"""Plot the CS-scale synthetic training run's loss / throughput curves from
a cs_train.py log (VERDICT r3 task 1 evidence artifact).

Usage: python tools/plot_cs_log.py logs/cs_synth_r4.log out.png
"""
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

LINE = re.compile(r"^step (\d+): loss=([\d.]+) ([\d.]+) samples/s")


def main():
    log, out = sys.argv[1], sys.argv[2]
    steps, losses, rates = [], [], []
    for line in open(log):
        if m := LINE.match(line):
            steps.append(int(m.group(1)))
            losses.append(float(m.group(2)))
            rates.append(float(m.group(3)))
    if not steps:
        sys.exit(f"no step lines in {log}")
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(steps, losses, lw=1.2)
    ax1.set_xlabel("step")
    ax1.set_ylabel("EDM2 weighted loss (20-step mean)")
    ax1.set_title(f"CS-scale synthetic train: loss "
                  f"{losses[0]:.3f} → {losses[-1]:.3f}")
    ax1.grid(alpha=0.3)
    # first window includes compile; drop it from the rate panel
    ax2.plot(steps[1:], rates[1:], lw=1.2)
    ax2.set_xlabel("step")
    ax2.set_ylabel("samples/s (20-step window)")
    med = sorted(rates[1:])[len(rates[1:]) // 2] if len(rates) > 1 else 0
    ax2.set_title(f"throughput (median {med:.1f} samples/s)")
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"# wrote {out}: {len(steps)} points, final loss {losses[-1]:.4f}, "
          f"median rate {med:.2f} samples/s")


if __name__ == "__main__":
    main()
