"""Real multi-process checks: two `jax.distributed` CPU processes verify the
rank-0-fit + broadcast semantics of the loss-weight coefficients
(reference loss_weight.py:122-149; the round-1 regression was each process
fitting its own empty history)."""
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
coord, n, i = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(coordinator_address=coord, num_processes=n,
                           process_id=i)
from autoregressive_diffusion_tpu.train import MultiNoiseState, fit_and_broadcast

state = MultiNoiseState()
if jax.process_index() == 0:
    # only p0 accumulates history (as the scripts do)
    rng = np.random.default_rng(0)
    sig = 10 ** rng.uniform(-1, 1, size=(32, 16)).astype(np.float32)
    loss = (10 ** (0.4 + 0.2 * np.cos(np.log10(sig)))).astype(np.float32)
    state.add_data(sig, loss)
coefs = fit_and_broadcast(state)
print("COEFS", " ".join(f"{c:.8e}" for c in np.asarray(coefs).ravel()),
      flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_fit_and_broadcast_two_processes():
    port = _free_port()
    coord = f"localhost:{port}"
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, coord, "2", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("COEFS")]
        assert line, out
        outs.append(np.array([float(x) for x in line[0].split()[1:]]))
    # p0's fit is meaningful (nonzero) and p1 received exactly it
    assert np.abs(outs[0]).max() > 1e-3
    np.testing.assert_array_equal(outs[0], outs[1])
