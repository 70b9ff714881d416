"""Mid-run kill/resume determinism (reference operational recovery
contract, SURVEY §5.3, /root/reference/src/utils/checkpoint.py:199-251).

Train run B is SIGKILL-hard-killed (os._exit — no cleanup, no atexit, no
final checkpoint) in the middle of an epoch, then resumed from the last
epoch-boundary checkpoint in a fresh process. Its continued per-step loss
trajectory, final best_acc, and final eval accuracies must EXACTLY equal an
uninterrupted run A: the auto-resume path (Checkpointer last-tag →
start_epoch, optimizer/scheduler state in the checkpoint, step-keyed model
RNG, epoch-keyed sampler shuffling) may not lose or replay anything.

The data pipeline is made draw-deterministic for the comparison (SCALE=
RATIO=(1,1), no flips/randaug/erasing on square synthetic images) — the
reference makes the same trade: its resume contract is trajectory-exact
modulo host-side augmentation randomness, which torch re-seeds on restart
too.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import json, os, sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")

out_dir, log_path = sys.argv[1], sys.argv[2]
kill_step = int(sys.argv[3]) if len(sys.argv) > 3 else -1

from vil_tpu.config import get_default_cfg

cfg = get_default_cfg()
cfg.merge_from_list([
    "MODEL.VIT.MSVIT.ARCH",
    "l1,h1,d32,n1,s1,g1,p4,f4_l2,h2,d64,n1,s1,g1,p2,f4"
    "_l3,h2,d64,n1,s0,g0,p2,f4",
    "INPUT.IMAGE_SIZE", "64",
    "DATA.NUM_CLASSES", "10",
    "DATALOADER.BSZ", "8",
    "DATALOADER.WORKERS", "2",
    "OPTIM.OPT", "adamw",
    "OPTIM.LR", "0.001",
    "OPTIM.WD", "0.05",
    "OPTIM.EPOCHS", "4",
    "SOLVER.LR_POLICY", "cosine",
    "SOLVER.WARMUP_EPOCHS", "1",
    "AUG.TIMM_AUG.USE_TRANSFORM", "True",
    "AUG.TIMM_AUG.HFLIP", "0.0",
    "AUG.TIMM_AUG.VFLIP", "0.0",
    "AUG.TIMM_AUG.AUTO_AUGMENT", "",
    "AUG.TIMM_AUG.RE_PROB", "0.0",
    "AUG.SCALE", "(1.0, 1.0)",
    "AUG.RATIO", "(1.0, 1.0)",
    "TPU.COMPUTE_DTYPE", "float32",
])
cfg.DATA.TRAIN = ("synthetic",)
cfg.DATA.TEST = ("synthetic",)
cfg.OUTPUT_DIR = out_dir

from vil_tpu.train.trainer import Trainer

tr = Trainer(cfg)
orig_get = tr._get_train_step


def patched_get(random_shift):
    fn = orig_get(random_shift)

    def wrapped(state, images, targets, rng):
        new_state, metrics = fn(state, images, targets, rng)
        with open(log_path, "a") as f:
            f.write(json.dumps({
                "step": int(new_state.step),
                "loss": float(metrics["loss"]),
            }) + "\n")
        if kill_step >= 0 and int(new_state.step) >= kill_step:
            os._exit(137)  # hard death mid-epoch: no cleanup, no checkpoint
        return new_state, metrics

    return wrapped


tr._get_train_step = patched_get
accs = tr.fit()
with open(log_path, "a") as f:
    f.write(json.dumps({
        "final": True,
        "best_acc": float(tr.best_acc),
        "accs": [float(a) for a in accs],
        "start_epoch": int(tr.start_epoch),
    }) + "\n")
"""


def _run_child(script, out_dir, log_path, kill_step=None, expect_rc=0):
    args = [sys.executable, script, out_dir, log_path]
    if kill_step is not None:
        args.append(str(kill_step))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [os.path.dirname(os.path.dirname(__file__)),
                    env.get("PYTHONPATH", "")] if p
    )
    proc = subprocess.run(args, env=env, capture_output=True, text=True,
                          timeout=1200)
    assert proc.returncode == expect_rc, (
        proc.returncode, proc.stdout[-2000:], proc.stderr[-2000:]
    )


def _read_log(path):
    steps, final = [], None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("final"):
                final = rec
            else:
                steps.append(rec)
    return steps, final


@pytest.mark.slow
def test_mid_run_kill_resume_matches_uninterrupted(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)

    # run A: uninterrupted 4 epochs (8 steps each)
    dir_a = tmp_path / "run_a"
    log_a = tmp_path / "log_a.jsonl"
    _run_child(str(script), str(dir_a), str(log_a))
    steps_a, final_a = _read_log(str(log_a))
    assert final_a is not None and len(steps_a) == 32

    # run B: hard-killed mid-epoch-2 (global step 19 = epoch idx 2, step 3
    # — after the epoch-2 boundary checkpoint, before the epoch-3 one)
    dir_b = tmp_path / "run_b"
    log_b1 = tmp_path / "log_b1.jsonl"
    _run_child(str(script), str(dir_b), str(log_b1), kill_step=19,
               expect_rc=137)
    steps_b1, final_b1 = _read_log(str(log_b1))
    assert final_b1 is None and steps_b1[-1]["step"] == 19
    # the kill left the epoch-2 checkpoint as the last tag, not epoch 3
    assert (dir_b / "checkpoint_2.ckpt").exists()
    assert not (dir_b / "checkpoint_3.ckpt").exists()

    # run B resumed: fresh process, auto-resume from the last tag
    log_b2 = tmp_path / "log_b2.jsonl"
    _run_child(str(script), str(dir_b), str(log_b2))
    steps_b2, final_b2 = _read_log(str(log_b2))
    assert final_b2 is not None
    assert final_b2["start_epoch"] == 2  # resumed at the epoch boundary
    assert len(steps_b2) == 16  # epochs 2..3 re-run from the checkpoint

    # trajectory determinism: the resumed epochs must be step-for-step
    # BITWISE equal to the uninterrupted run (same optimizer/scheduler
    # state from the checkpoint, same step-keyed RNG, same epoch-keyed
    # data order)
    a_tail = {r["step"]: r["loss"] for r in steps_a if r["step"] > 16}
    b_tail = {r["step"]: r["loss"] for r in steps_b2}
    assert sorted(a_tail) == sorted(b_tail)
    for s in sorted(a_tail):
        np.testing.assert_allclose(
            b_tail[s], a_tail[s], rtol=0, atol=0,
            err_msg=f"loss diverged at step {s}",
        )
    # and the pre-kill prefix matched too (same seed, same everything)
    a_head = {r["step"]: r["loss"] for r in steps_a if r["step"] <= 19}
    b_head = {r["step"]: r["loss"] for r in steps_b1}
    for s in sorted(b_head):
        np.testing.assert_allclose(b_head[s], a_head[s], rtol=0, atol=0)

    # best-acc / final-eval continuity
    np.testing.assert_allclose(final_b2["best_acc"], final_a["best_acc"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(final_b2["accs"], final_a["accs"],
                               rtol=0, atol=0)
