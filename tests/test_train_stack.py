"""Loss / optimizer / scheduler tests, with the reference torch code as oracle."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vil_tpu.config import get_default_cfg
from vil_tpu.train import loss as L
from vil_tpu.train import optim as O
from vil_tpu.train import schedulers as S

sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    targets = rng.integers(0, 10, size=(8,))
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        torch.nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(targets))
    )
    assert abs(ours - theirs) < 1e-5


def test_label_smoothing_matches_reference(rng):
    from loss import LabelSmoothingCrossEntropy  # reference

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    targets = rng.integers(0, 10, size=(8,))
    ours = float(
        L.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), 0.1)
    )
    theirs = float(
        LabelSmoothingCrossEntropy(0.1)(torch.from_numpy(logits), torch.from_numpy(targets))
    )
    assert abs(ours - theirs) < 1e-5


def test_soft_target_matches_reference(rng):
    from loss import SoftTargetCrossEntropy

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    t = rng.random((8, 10)).astype(np.float32)
    t = t / t.sum(-1, keepdims=True)
    ours = float(L.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(t)))
    theirs = float(SoftTargetCrossEntropy()(torch.from_numpy(logits), torch.from_numpy(t)))
    assert abs(ours - theirs) < 1e-5


def test_focal_matches_reference(rng):
    from loss import FocalLoss

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    t = (rng.random((8, 10)) > 0.8).astype(np.float32)
    t[0, 0] = 1.0  # ensure nonzero sum
    ours = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(t), 1.0, 0.5, True))
    theirs = float(FocalLoss(1.0, 0.5, True)(torch.from_numpy(logits), torch.from_numpy(t)))
    assert abs(ours - theirs) / max(abs(theirs), 1) < 1e-5


def test_multisoftmax_matches_reference(rng):
    from loss import MultiSoftmaxCrossEntropyLoss

    logits = rng.standard_normal((8, 10)).astype(np.float32)
    t = (rng.random((8, 10)) > 0.7).astype(np.float32)
    t[0, 0] = 1.0
    ours = float(L.multi_softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(t)))
    theirs = float(
        MultiSoftmaxCrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(t))
    )
    assert abs(ours - theirs) < 1e-5


def test_get_criterion_dispatch():
    cfg = get_default_cfg()
    cfg.AUG.MIXUP_PROB = 1.0
    assert L.get_criterion(cfg, train=True) is L.soft_target_cross_entropy
    assert L.get_criterion(cfg, train=False) is L.cross_entropy
    cfg.AUG.MIXUP_PROB = 0.0
    cfg.LOSS.LABEL_SMOOTHING = 0.1
    crit = L.get_criterion(cfg, train=True)
    logits = jnp.zeros((2, 4))
    assert np.isfinite(float(crit(logits, jnp.asarray([0, 1]))))


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------
def _torch_trajectory(opt_factory, steps, w0, grads):
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = opt_factory([p])
    traj = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g)
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


def _optax_trajectory(tx, steps, w0, grads):
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    traj = []
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        traj.append(np.asarray(params["w"]))
    return traj


def test_qhm_matches_reference(rng):
    from optim.qhm import QHM  # reference

    w0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(5)]
    ours = _optax_trajectory(
        O.qhm(0.1, momentum=0.9, nu=0.7, weight_decay=0.01), 5, w0, grads
    )
    theirs = _torch_trajectory(
        lambda ps: QHM(ps, lr=0.1, momentum=0.9, qhm_nu=0.7, weight_decay=0.01),
        5, w0, grads,
    )
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_sgd_matches_torch(rng):
    w0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(5)]
    import optax

    tx = optax.chain(
        optax.add_decayed_weights(0.01),
        optax.trace(decay=0.9),
        optax.scale(-0.1),
    )
    ours = _optax_trajectory(tx, 5, w0, grads)
    theirs = _torch_trajectory(
        lambda ps: torch.optim.SGD(ps, lr=0.1, momentum=0.9, weight_decay=0.01),
        5, w0, grads,
    )
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_adamw_matches_reference(rng):
    from optim.optimization import AdamW  # reference decoupled-WD AdamW

    w0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(5)]
    import optax

    tx = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01)
    ours = _optax_trajectory(tx, 5, w0, grads)
    theirs = _torch_trajectory(
        lambda ps: AdamW(ps, lr=1e-3, betas=(0.9, 0.999), eps=1e-6,
                         weight_decay=0.01),
        5, w0, grads,
    )
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_decay_mask():
    params = {
        "stage1_patch_embed": {"cls_token": jnp.zeros(1), "proj": {"kernel": jnp.zeros(1)}},
        "norm": {"scale": jnp.zeros(1)},
        "head": {"kernel": jnp.zeros(1), "bias": jnp.zeros(1)},
    }
    m = O.decay_mask(params)
    assert m["stage1_patch_embed"]["cls_token"] is False
    assert m["stage1_patch_embed"]["proj"]["kernel"] is True
    assert m["norm"]["scale"] is False
    assert m["head"]["kernel"] is True
    assert m["head"]["bias"] is False


def test_get_opt_all_variants():
    cfg = get_default_cfg()
    params = {"w": jnp.ones(3), "norm": {"scale": jnp.ones(3)}}
    for name in ("sgd", "qhm", "adam", "adamw", "lamb"):
        cfg.OPTIM.OPT = name
        tx = O.get_opt(cfg, params, lr=0.01)
        state = tx.init(params)
        up, _ = tx.update({"w": jnp.ones(3), "norm": {"scale": jnp.ones(3)}}, state, params)
        assert np.all(np.isfinite(np.asarray(up["w"])))


def test_flat_opt_matches_per_leaf():
    """TPU.FLAT_OPT groups params into (decay, dtype) flat vectors so the
    elementwise optimizers update ~2 leaves instead of ~190 (4.4 ms of
    fragmented update fusions in the r4 train-step profile). The updates
    must be numerically identical to the per-leaf path over a multi-step
    trajectory, for every elementwise optimizer and with the no-decay mask
    engaged (a 'norm' param lands in the no-decay group)."""
    import jax

    cfg = get_default_cfg()
    cfg.OPTIM.WD = 0.05
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        "norm": {"scale": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
        "cls_token": jnp.asarray(rng.normal(size=(1, 2)), jnp.float32),
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
    )
    for name in ("sgd", "qhm", "adam", "adamw"):
        cfg.OPTIM.OPT = name
        cfg.TPU.FLAT_OPT = False
        tx_leaf = O.get_opt(cfg, params, lr=0.01)
        cfg.TPU.FLAT_OPT = True
        tx_flat = O.get_opt(cfg, params, lr=0.01)
        p_l = p_f = params
        s_l, s_f = tx_leaf.init(p_l), tx_flat.init(p_f)
        for _ in range(3):
            u_l, s_l = tx_leaf.update(grads, s_l, p_l)
            u_f, s_f = tx_flat.update(grads, s_f, p_f)
            p_l = jax.tree_util.tree_map(lambda p, u: p + u, p_l, u_l)
            p_f = jax.tree_util.tree_map(lambda p, u: p + u, p_f, u_f)
        for a, b in zip(jax.tree_util.tree_leaves(p_l),
                        jax.tree_util.tree_leaves(p_f)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6,
                err_msg=name,
            )

    # generic flat_wrap (no mask): decays everything, matches plain adamw
    import optax

    tx_plain = optax.adamw(1e-3, weight_decay=0.01)
    tx_wrapped = O.flat_wrap(optax.adamw(1e-3, weight_decay=0.01), params)
    u_p, _ = tx_plain.update(grads, tx_plain.init(params), params)
    u_w, _ = tx_wrapped.update(grads, tx_wrapped.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(u_p),
                    jax.tree_util.tree_leaves(u_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-6)


def test_stacked_opt_matches_per_leaf():
    """TPU.STACKED_OPT stacks same-(shape,dtype,decay) small leaves onto a
    leading axis (the bitcast-free sibling of FLAT_OPT). Updates must be
    numerically identical to the per-leaf path over a multi-step
    trajectory for every elementwise optimizer, with the no-decay mask
    engaged, and with a threshold that leaves some big leaves per-leaf."""
    import jax

    cfg = get_default_cfg()
    cfg.OPTIM.WD = 0.05
    rng = np.random.default_rng(0)
    params = {
        # two same-shape decay leaves -> one stacked group
        "w1": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32),
        # same shape but no-decay -> separate group from w1/w2
        "norm": {"scale": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
        "cls_token": jnp.asarray(rng.normal(size=(1, 3)), jnp.float32),
        # big leaf above the threshold -> singleton passthrough
        "big": jnp.asarray(rng.normal(size=(64, 8)), jnp.float32),
    }
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
    )
    cfg.TPU.STACKED_OPT_THRESHOLD = 256  # 'big' (512 elems) stays per-leaf
    for name in ("sgd", "qhm", "adam", "adamw"):
        cfg.OPTIM.OPT = name
        cfg.TPU.STACKED_OPT = False
        tx_leaf = O.get_opt(cfg, params, lr=0.01)
        cfg.TPU.STACKED_OPT = True
        tx_stk = O.get_opt(cfg, params, lr=0.01)
        p_l = p_s = params
        s_l, s_s = tx_leaf.init(p_l), tx_stk.init(p_s)
        for _ in range(3):
            u_l, s_l = tx_leaf.update(grads, s_l, p_l)
            u_s, s_s = tx_stk.update(grads, s_s, p_s)
            p_l = jax.tree_util.tree_map(lambda p, u: p + u, p_l, u_l)
            p_s = jax.tree_util.tree_map(lambda p, u: p + u, p_s, u_s)
        for a, b in zip(jax.tree_util.tree_leaves(p_l),
                        jax.tree_util.tree_leaves(p_s)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7, rtol=1e-6,
                err_msg=name,
            )

    # grouping sanity: the two decay (4,3) leaves share one stacked group
    from vil_tpu.train.optim import decay_mask, make_stacked_fns
    to_s, from_s, smask = make_stacked_fns(
        params, decay_mask(params), threshold=256)
    stacked = to_s(params)
    multi = [k for k, v in stacked.items() if v.ndim == 3 and v.shape[0] == 2]
    assert len(multi) == 1, stacked.keys()
    rt = from_s(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# schedulers
# ---------------------------------------------------------------------------
def _torch_lr_trajectory(sched_cls, steps, base_lr=0.1, **kw):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = sched_cls(opt, **kw)
    lrs = []
    for _ in range(steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return lrs


@pytest.mark.parametrize("policy", ["multistep", "cosine", "linear"])
def test_schedulers_match_reference(policy):
    from optim.lr_scheduler import (
        WarmupCosineAnnealingLR,
        WarmupLinearSchedule,
        WarmupMultiStepLR,
    )

    steps, base_lr = 60, 0.1
    common = dict(warmup_factor=0.01, warmup_iters=10, warmup_method="linear")
    if policy == "multistep":
        theirs = _torch_lr_trajectory(
            WarmupMultiStepLR, steps, base_lr, milestones=(20, 40), gamma=0.1, **common
        )
        ours_fn = S.warmup_multistep(base_lr, (20, 40), 0.1, **common)
    elif policy == "cosine":
        theirs = _torch_lr_trajectory(
            WarmupCosineAnnealingLR, steps, base_lr, max_iter=60, min_lr=1e-5, **common
        )
        ours_fn = S.warmup_cosine(base_lr, 60, 1e-5, **common)
    else:
        theirs = _torch_lr_trajectory(
            WarmupLinearSchedule, steps, base_lr, max_iter=60, min_lr=1e-5, **common
        )
        ours_fn = S.warmup_linear(base_lr, 60, 1e-5, **common)
    ours = [float(ours_fn(i)) for i in range(steps)]
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_get_lr_schedule_from_cfg():
    cfg = get_default_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.STEPS_PER_EPOCH = 100
    cfg.SOLVER.MAX_ITER = 100 * cfg.OPTIM.EPOCHS
    sched = S.get_lr_schedule(cfg)
    assert sched is not None
    assert float(sched(0)) < cfg.OPTIM.LR  # warmup start
    cfg.SOLVER.LR_POLICY = "nope"
    assert S.get_lr_schedule(cfg) is None


def test_epoch_based_schedule_advances_per_epoch():
    """EPOCH_BASED_SCHEDULE schedules are evaluated with the optimizer STEP
    count but must advance once per epoch (reference steps them per epoch)."""
    cfg = get_default_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.EPOCH_BASED_SCHEDULE = True
    cfg.SOLVER.WARMUP_EPOCHS = 2.0
    cfg.SOLVER.STEPS_PER_EPOCH = 50
    cfg.OPTIM.EPOCHS = 10
    cfg.OPTIM.LR = 0.1
    sched = S.get_lr_schedule(cfg)
    # constant within an epoch
    assert float(sched(0)) == float(sched(49))
    assert float(sched(50)) != float(sched(49))
    # never periodic: LR at the end is near MIN_LR, far below base
    assert float(sched(50 * 9)) < 0.02
    # warmup active for the first 2 epochs
    assert float(sched(0)) < 0.1


def test_per_sample_criteria_cover_elementwise_losses():
    cfg = get_default_cfg()
    for name in ("bce", "mse", "sigmoid"):
        cfg.LOSS.LOSS = name
        f = L.get_per_sample_criterion(cfg)
        assert f is not None, name
        out = f(jnp.zeros((3, 4)), jnp.zeros((3, 4)))
        assert out.shape == (3,)
    cfg.LOSS.LOSS = "focal"
    assert L.get_per_sample_criterion(cfg) is None
