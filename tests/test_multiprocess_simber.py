"""Cross-process Monte-Carlo counter reduction (VERDICT item 7).

Launches TWO real jax.distributed CPU processes running sim_ber with a
deterministic fake model and checks the reduced BER/BLER equals a
single-process oracle that replays both processes' PRNG streams through
the same global accumulate + early-stop logic. This is the correctness
substrate for the >=80%-scaling-at-4-hosts target (BASELINE.md);
reference analog: Sionna sim_ber(distribute="all"), evaluate.py:61.
"""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

HELPERS = pathlib.Path(__file__).parent / "helpers"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _oracle(ebno_dbs, batch_size, max_mc_iter, target_ble, seed, n_proc):
    """Replay sim_ber's multi-process loop in-process."""
    sys.path.insert(0, str(HELPERS))
    from fake_eval_model import FakeEvalModel
    from neural_rx_tpu.sim.simber import make_eval_step

    model = FakeEvalModel()
    step = make_eval_step(model, None)
    keys = [jax.random.fold_in(jax.random.PRNGKey(seed), p)
            for p in range(n_proc)]
    bers = np.full(len(ebno_dbs), np.nan)
    blers = np.full(len(ebno_dbs), np.nan)
    for i, ebno in enumerate(ebno_dbs):
        be = nb = ble = nbl = 0
        for _ in range(max_mc_iter):
            subs = []
            for p in range(n_proc):
                keys[p], sub = jax.random.split(keys[p])
                subs.append(sub)
            for sub in subs:
                r = step(None, sub, batch_size, jnp.float32(ebno))
                be += int(r[0]); nb += int(r[1])
                ble += int(r[2]); nbl += int(r[3])
            if ble >= target_ble:
                break
        bers[i] = be / max(nb, 1)
        blers[i] = ble / max(nbl, 1)
    return bers, blers


@pytest.mark.slow
def test_two_process_counters_match_oracle(tmp_path):
    port = _free_port()
    out = tmp_path / "mp_result.npz"
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, str(HELPERS / "run_multiproc_simber.py"),
         f"127.0.0.1:{port}", "2", str(p), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-2000:]}"
    blob = np.load(out)

    bers, blers = _oracle([-3.0, 5.0], batch_size=8, max_mc_iter=6,
                          target_ble=40, seed=7, n_proc=2)
    np.testing.assert_allclose(blob["bers"], bers, rtol=0, atol=0)
    np.testing.assert_allclose(blob["blers"], blers, rtol=0, atol=0)
    # the low-SNR point must have hit early stop on GLOBAL counts:
    # 2 procs x 8 batch x 2 tx = 32 blocks/iter < 40 target, so a
    # single process alone would not stop after ceil(40/16)=3 iters
    assert blers[0] > 0


@pytest.mark.slow
def test_two_process_training_step_stays_consistent(tmp_path):
    """ONE distributed training step of the full E2E model with the
    batch sharded across TWO processes: the gradient all-reduce (DCN
    analog) must leave both processes with bit-identical params."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [subprocess.Popen(
        [sys.executable, str(HELPERS / "run_multiproc_train.py"),
         f"127.0.0.1:{port}", "2", str(p), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    r0 = np.load(tmp_path / "proc0.npz")
    r1 = np.load(tmp_path / "proc1.npz")
    assert np.isfinite(r0["loss"])
    assert float(r0["loss"]) == float(r1["loss"])
    assert float(r0["checksum"]) == float(r1["checksum"])
