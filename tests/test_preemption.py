"""Preemption-safe training: SIGTERM/SIGUSR1 (or a direct flag) makes the
train loop checkpoint 'latest' and exit cleanly, and the run resumes.

The reference has no preemption handling (a killed run loses everything
since the last periodic save, train.py:40-97); this is the aux-subsystem
"failure detection / recovery" extension for scheduled/preemptible fleets.
"""

import os
import signal
import threading

import pytest

from ffrnet_tpu import train as train_mod
from ffrnet_tpu.checkpoint.store import load_checkpoint
from ffrnet_tpu.config import Options


def _opts(tmp_path, cont=0):
    o = Options(
        phase="train", train_data="synthetic", num_classes=16,
        batch_size=8, total_epochs=50, save_freq=10 ** 6,
        print_freq=10 ** 6, eval_freq=0, encoder_weights="",
        weight_root=str(tmp_path), n_thread=2, continue_train=cont,
        optimizer="Adam", lr=1e-3,
    )
    return o.finalize()


@pytest.mark.slow
def test_preemption_checkpoints_and_resumes(tmp_path):
    opts = _opts(tmp_path)

    # install the handler up front: the timer may fire before train() gets
    # to its own install() (default SIGUSR1 action would kill the process);
    # the guard acts only at the end-of-step safe point either way
    train_mod.preemption_guard.install()
    threading.Timer(1.0, os.kill, (os.getpid(), signal.SIGUSR1)).start()
    train_mod.train(opts)  # returns instead of running 50 epochs

    params, model_state, opt_leaves, meta = load_checkpoint(
        opts.ckpt_dir, "latest")
    assert meta["iter"] >= 1
    assert opt_leaves is not None  # optimizer state survives preemption
    first_iter = meta["iter"]

    # resume and preempt again (flag path this time — same safe point)
    opts2 = _opts(tmp_path, cont=1)
    threading.Timer(
        1.0, setattr, (train_mod.preemption_guard, "requested", True)).start()
    train_mod.train(opts2)
    _, _, _, meta2 = load_checkpoint(opts2.ckpt_dir, "latest")
    assert meta2["iter"] > first_iter  # made progress after resume


def test_guard_uninstall_restores_handlers():
    """train() must not leave its SIGTERM/SIGUSR1 handlers installed after
    returning: an embedding process (test runner, notebook, service) would
    otherwise silently swallow termination signals forever."""
    import signal

    from ffrnet_tpu.train import PreemptionGuard

    def sentinel(signum, frame):  # pragma: no cover - never invoked
        pass

    old = signal.signal(signal.SIGTERM, sentinel)
    try:
        g = PreemptionGuard().install()
        assert signal.getsignal(signal.SIGTERM) == g._handler
        g.uninstall()
        assert signal.getsignal(signal.SIGTERM) is sentinel
        g.uninstall()  # idempotent
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, old)
