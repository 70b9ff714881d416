"""Trainer orchestration units: lr scaling, mode switch, redraw schedule."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vil_tpu.config import get_default_cfg
from vil_tpu.train import engine
from vil_tpu.train.redraw import RedrawSchedule, redraw_projections
from vil_tpu.train.trainer import Trainer, drop_lr, lr_scalable


def test_lr_scalable_and_drop():
    tx = lr_scalable(optax.sgd(1.0))
    params = {"w": jnp.ones(3)}
    state = engine.TrainState(
        step=jnp.asarray(0), params=params, opt_state=tx.init(params), buffers={}
    )
    g = {"w": jnp.ones(3)}
    up1, _ = tx.update(g, state.opt_state, params)
    state2 = drop_lr(state, 10.0)
    up2, _ = tx.update(g, state2.opt_state, params)
    np.testing.assert_allclose(np.asarray(up2["w"]), np.asarray(up1["w"]) / 10.0)


def test_random_shift_active_schedule():
    cfg = get_default_cfg()
    cfg.MODEL.VIT.MSVIT.MODE = 1
    cfg.MODEL.VIT.MSVIT.VIL_MODE_SWITCH = 0.75
    cfg.OPTIM.EPOCHS = 100
    cfg.DATA.TRAIN = ("synthetic",)
    cfg.DATA.TEST = ("synthetic",)
    cfg.EVALUATE = True  # skip trainloader construction
    cfg.INPUT.IMAGE_SIZE = 32
    cfg.DATA.NUM_CLASSES = 10
    cfg.DATALOADER.BSZ = 8
    cfg.DATALOADER.WORKERS = 0
    cfg.MODEL.VIT.MSVIT.ARCH = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2_l3,h2,d32,n1,s0,g0,p2,f2"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = ""
    t = Trainer(cfg)
    assert t._random_shift_active(0)
    assert t._random_shift_active(74)
    assert not t._random_shift_active(75)  # switch at 0.75 * 100
    # MODE=0: never
    cfg.MODEL.VIT.MSVIT.MODE = 0
    assert not t._random_shift_active(0) or True  # trainer caches cfg ref
    t2 = Trainer(cfg)
    assert not t2._random_shift_active(0)


def test_eval_saves_per_image_results(tmp_path):
    """EVALUATE=True must emit per-image predictions recoverable by dataset
    index (reference results.pth keyed by img id, engine.py:264-268,
    :323-325): top-k class ids + logit scores + correctness + targets."""
    cfg = get_default_cfg()
    cfg.DATA.TRAIN = ("synthetic",)
    cfg.DATA.TEST = ("synthetic",)
    cfg.EVALUATE = True
    cfg.INPUT.IMAGE_SIZE = 32
    cfg.DATA.NUM_CLASSES = 10
    cfg.DATALOADER.BSZ = 8
    cfg.DATALOADER.WORKERS = 0
    cfg.MODEL.VIT.MSVIT.ARCH = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2_l3,h2,d32,n1,s0,g0,p2,f2"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    t = Trainer(cfg)
    t.fit()
    data = np.load(tmp_path / "results_0.npz")
    n = len(t.testloaders[0].dataset)
    assert data["pred_ids"].shape == (n, 5)
    assert data["pred_scores"].shape == (n, 5)
    assert data["scores"].shape == (n, 2)
    assert data["targets"].shape == (n,)
    assert sorted(data["indices"].tolist()) == list(range(n))
    # top-1 correctness flag must agree with the stored prediction ids
    by_idx = {int(i): k for k, i in enumerate(data["indices"])}
    for ds_idx in range(0, n, 7):
        k = by_idx[ds_idx]
        assert (data["pred_ids"][k, 0] == data["targets"][k]) == bool(
            data["scores"][k, 0]
        )
        # scores are the logits in descending order
        assert np.all(np.diff(data["pred_scores"][k]) <= 1e-6)


def test_redraw_schedule():
    rs = RedrawSchedule()
    rs.set_epoch(0)  # interval 1
    assert not rs.should_redraw()  # calls=0 -> increments
    assert rs.should_redraw()  # calls reached interval
    rs.set_epoch(2)  # interval = 1 + 5*2 = 11
    hits = sum(rs.should_redraw() for _ in range(24))
    assert hits == 2  # at call 12 and call 24


def test_redraw_projections_replaces_only_projection_leaves():
    buffers = {
        "stage1_block0_attn": {"attn": {"projection_matrix": jnp.ones((8, 4))}},
        "other": {"thing": jnp.zeros((3,))},
    }
    out = redraw_projections(buffers, jax.random.PRNGKey(0))
    proj = out["stage1_block0_attn"]["attn"]["projection_matrix"]
    assert proj.shape == (8, 4)
    assert not np.allclose(np.asarray(proj), 1.0)
    np.testing.assert_allclose(np.asarray(out["other"]["thing"]), 0.0)
    # rows orthogonal-ish blocks: row norms are chi-distributed, nonzero
    norms = np.linalg.norm(np.asarray(proj), axis=1)
    assert (norms > 0).all()
