"""Checkpointer, metric logger, collectives (single-host), misc utils."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vil_tpu.parallel import collectives
from vil_tpu.train.engine import TrainState
from vil_tpu.utils.checkpoint import Checkpointer
from vil_tpu.utils.metric_logger import (
    AverageMeter,
    MetricLogger,
    SmoothedValue,
    TensorboardLogger,
)
from vil_tpu.utils.misc import config_iteration, set_seed


def _state(value=1.0):
    params = {"w": jnp.full((3,), value)}
    tx = optax.sgd(0.1)
    return TrainState(
        step=jnp.asarray(5, jnp.int32), params=params,
        opt_state=tx.init(params), buffers={},
    )


def test_checkpointer_save_load_cycle(tmp_path):
    ck = Checkpointer(save_dir=str(tmp_path), arch="test")
    s = _state(2.0)
    ck.save(3, s, best_acc=71.5, is_best=True)
    assert ck.has_checkpoint()
    assert os.path.isfile(tmp_path / "checkpoint_3.ckpt")
    assert os.path.isfile(tmp_path / "model_best.ckpt")
    # tag resolves to the newest checkpoint
    assert ck.get_checkpoint_file().endswith("checkpoint_3.ckpt")
    s2, header = ck.load(_state(0.0))
    np.testing.assert_allclose(np.asarray(s2.params["w"]), 2.0)
    assert int(s2.step) == 5
    assert header["epoch"] == 3 and header["best_acc"] == 71.5


def test_checkpointer_only_save_last(tmp_path):
    ck = Checkpointer(save_dir=str(tmp_path), only_save_last=True)
    ck.save(1, _state())
    ck.save(2, _state())
    files = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert files == ["checkpoint_last.ckpt"]


def test_checkpointer_missing_path(tmp_path):
    ck = Checkpointer(save_dir=str(tmp_path))
    s = _state(3.0)
    s2, header = ck.load(s, model_path="/nonexistent.ckpt")
    assert header == {}
    np.testing.assert_allclose(np.asarray(s2.params["w"]), 3.0)


def test_config_iteration(tmp_path):
    assert config_iteration(str(tmp_path), 100) == -1
    with open(tmp_path / "last_checkpoint", "w") as f:
        f.write("checkpoint_7.ckpt")
    assert config_iteration(str(tmp_path), 100) == 700


def test_smoothed_value():
    v = SmoothedValue(window_size=3)
    for x in (1, 2, 3, 4):
        v.update(x)
    assert v.avg == 3.0  # window = (2,3,4)
    assert v.median == 3.0
    assert v.global_avg == 2.5
    assert v.last == 4.0


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == 2.0 and m.count == 3


def test_metric_logger():
    ml = MetricLogger()
    ml.update(loss=1.0, acc=50.0)
    ml.update(loss=0.5, acc=60.0)
    assert ml.loss.global_avg == 0.75
    assert "loss" in str(ml)


def test_tensorboard_logger(tmp_path):
    tb = TensorboardLogger(str(tmp_path / "tb"))
    tb.update(0, loss=1.0)
    tb.update(1, loss=0.5)
    assert tb.loss.global_avg == 0.75
    tb.flush()
    tb.close()
    # triple writers created (last/avg/med)
    assert os.path.isdir(tmp_path / "tb" / "avg")
    assert os.path.isdir(tmp_path / "tb" / "med")


def test_collectives_single_host():
    assert collectives.get_world_size() == 1
    assert collectives.is_main_process()
    collectives.synchronize()
    assert collectives.all_gather({"a": 1}) == [{"a": 1}]
    assert collectives.reduce_dict({"x": 2.0}) == {"x": 2.0}
    merged = collectives.accumulate_predictions({"img1": 0.5})
    assert merged == {"img1": 0.5}


def test_set_seed_reproducible():
    import random

    set_seed(123)
    a = (random.random(), np.random.rand())
    set_seed(123)
    b = (random.random(), np.random.rand())
    assert a == b


def test_checkpointer_orbax_backend(tmp_path):
    ck = Checkpointer(save_dir=str(tmp_path), arch="test", backend="orbax")
    s = _state(4.0)
    ck.save(2, s, best_acc=50.0, is_best=True)
    assert os.path.isdir(tmp_path / "checkpoint_2.orbax")
    assert os.path.isdir(tmp_path / "model_best.orbax")
    assert ck.get_checkpoint_file().endswith("checkpoint_2.orbax")
    s2, header = ck.load(_state(0.0))
    np.testing.assert_allclose(np.asarray(s2.params["w"]), 4.0)
    assert int(s2.step) == 5
    assert header["epoch"] == 2 and header["best_acc"] == 50.0
    # overwrite same epoch works (force=True path)
    ck.save(2, _state(6.0))
    s3, _ = ck.load(_state(0.0))
    np.testing.assert_allclose(np.asarray(s3.params["w"]), 6.0)
    # a msgpack-backend reader auto-detects the orbax directory
    ck_auto = Checkpointer(save_dir=str(tmp_path))
    s4, _ = ck_auto.load(_state(0.0))
    np.testing.assert_allclose(np.asarray(s4.params["w"]), 6.0)
