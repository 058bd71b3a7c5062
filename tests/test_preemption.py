"""Preemption guard: SIGTERM → cooperative checkpoint-and-exit."""

import os
import signal
import subprocess
import sys
import time

from genrec_tpu.core.preemption import PreemptionGuard


def test_guard_sets_flag_on_sigterm():
    guard = PreemptionGuard()
    try:
        assert not guard.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.05)
        assert guard.should_stop()
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_guard_chains_previous_handler():
    hits = []
    signal.signal(signal.SIGTERM, lambda *a: hits.append(1))
    try:
        guard = PreemptionGuard()
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.05)
        assert guard.should_stop() and hits == [1]
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)


def test_tiger_trainer_checkpoints_on_sigterm(tmp_path):
    """e2e: SIGTERM a running trainer → it saves a resumable checkpoint
    and exits 0; a resumed run picks the step count back up."""
    save = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    args = [sys.executable, "-m", "genrec_tpu.trainers.tiger_trainer",
            "config/tiger/synthetic_tiger.gin",
            "--gin", "train.epochs=50",
            "--gin", "train.do_eval=False",
            "--gin", f"train.save_dir_root='{save}'"]
    proc = subprocess.Popen(args, cwd="/root/repo", env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    deadline = time.time() + 240
    # wait until at least one epoch has logged (training is underway)
    seen = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        seen.append(line)
        if "epoch 1:" in line:
            break
    else:
        proc.kill()
        raise AssertionError("trainer never reached epoch 1:\n"
                             + "".join(seen[-20:]))
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=240)
    assert proc.returncode == 0, out[-2000:]
    assert "preemption signal" in out, out[-2000:]
    ckpts = os.listdir(save / "ckpt")
    assert ckpts, "no checkpoint written on preemption"
