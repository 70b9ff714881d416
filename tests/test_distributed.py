"""Multi-device tests on the virtual 8-device CPU mesh.

The reference had no distributed tests (SURVEY §4); here the full sharded
train step (data-parallel over 8 devices) is exercised and checked for
numerical equivalence with the single-device step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu import parallel
from vil_tpu.models import MsViT
from vil_tpu.train import engine, loss as L, optim as O
from vil_tpu.config import get_default_cfg

ARCH = "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2_l3,h2,d32,n1,s0,g0,p2,f2"


def test_mesh_creation():
    mesh = parallel.create_mesh((-1,), ("data",))
    assert mesh.devices.size == 8
    mesh2 = parallel.create_mesh((2, 4), ("data", "model"))
    assert mesh2.devices.shape == (2, 4)


@pytest.fixture(scope="module")
def setup():
    model = MsViT(arch=ARCH, img_size=32, num_classes=10,
                  attn_type="longformerhand", sharew=True, drop_path_rate=0.1)
    cfg = get_default_cfg()
    cfg.OPTIM.OPT = "adamw"
    x = jnp.ones((16, 32, 32, 3))
    rng = jax.random.PRNGKey(0)
    state = engine.create_train_state(model, O.get_opt(cfg, None, lr=1e-3), rng, x)
    # note: decay mask needs real params
    tx = O.get_opt(cfg, state.params, lr=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    return model, tx, state


def test_sharded_train_step_matches_single_device(setup):
    model, tx, state = setup
    step = engine.make_train_step(model, L.cross_entropy, tx, random_shift=False)
    rng = jax.random.PRNGKey(7)
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)

    # single device
    s1, m1 = jax.jit(step)(state, images, targets, rng)

    # 8-device data-parallel
    mesh = parallel.create_mesh((-1,), ("data",))
    sharded = parallel.jit_train_step(step, mesh, donate_state=False)
    state_r = parallel.replicate(mesh, state)
    ims = parallel.shard_batch(mesh, images)
    tgs = parallel.shard_batch(mesh, targets)
    s8, m8 = sharded(state_r, ims, tgs, parallel.replicate(mesh, rng))

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    # parameters after one step must match
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_train_step_random_shift(setup):
    model, tx, state = setup
    step = engine.make_train_step(model, L.cross_entropy, tx, random_shift=True)
    mesh = parallel.create_mesh((-1,), ("data",))
    sharded = parallel.jit_train_step(step, mesh, donate_state=False)
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    s8, m8 = sharded(
        parallel.replicate(mesh, state),
        parallel.shard_batch(mesh, images),
        parallel.shard_batch(mesh, targets),
        parallel.replicate(mesh, jax.random.PRNGKey(3)),
    )
    assert np.isfinite(float(m8["loss"]))
    assert int(s8.step) == int(state.step) + 1


def test_sharded_eval_step(setup):
    model, tx, state = setup
    estep = engine.make_eval_step(model, L.cross_entropy)
    mesh = parallel.create_mesh((-1,), ("data",))
    jitted = parallel.jit_eval_step(estep, mesh)
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    m = jitted(
        parallel.replicate(mesh, state.variables()),
        parallel.shard_batch(mesh, images),
        parallel.shard_batch(mesh, targets),
        parallel.shard_batch(mesh, jnp.ones((16,), jnp.float32)),
    )
    assert float(m["count"]) == 16.0
    assert 0 <= float(m["top1_sum"]) <= 16


def test_target_map_accuracy():
    # 4 eval classes map onto 6 logit classes
    tmap = {0: [0, 1], 1: [2], 2: [3, 4], 3: [5]}
    valid, overlap = engine.build_target_map_arrays(tmap, 4, 6)
    assert valid.shape == (4, 6) and overlap.all()
    logits = jnp.asarray([[0.1, 5.0, 0, 0, 0, 0], [0, 0, 0, 9, 0, 0]])
    targets = jnp.asarray([0, 2])
    correct = engine.topk_correct(logits, targets, (1, 5), valid, overlap)
    assert correct[0, 0] == 1.0 and correct[1, 0] == 1.0
    # wrong target: top-1 miss, top-5 hit (6 classes, top5 covers 5)
    correct2 = engine.topk_correct(logits, jnp.asarray([1, 1]), (1, 5), valid, overlap)
    assert correct2[0, 0] == 0.0


def test_fsdp_sharded_step_matches_replicated(setup):
    """fsdp param sharding must be numerically identical to replicated."""
    model, tx, state = setup
    step = engine.make_train_step(model, L.cross_entropy, tx, random_shift=False)
    mesh = parallel.create_mesh((-1,), ("data",))
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    rng = jax.random.PRNGKey(7)

    # replicated baseline
    rep = parallel.jit_train_step(step, mesh, donate_state=False)
    s_rep, m_rep = rep(
        parallel.replicate(mesh, state),
        parallel.shard_batch(mesh, images),
        parallel.shard_batch(mesh, targets),
        parallel.replicate(mesh, rng),
    )

    # fsdp-sharded state (min_size=0: shard everything shardable)
    state_sh = parallel.fsdp_sharding(mesh, state, min_size=0)
    fsdp = parallel.jit_train_step(
        step, mesh, donate_state=False, state_shardings=state_sh
    )
    s_f, m_f = fsdp(
        parallel.shard_like(state, state_sh),
        parallel.shard_batch(mesh, images),
        parallel.shard_batch(mesh, targets),
        parallel.replicate(mesh, rng),
    )
    assert abs(float(m_rep["loss"]) - float(m_f["loss"])) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(s_rep.params),
        jax.tree_util.tree_leaves(s_f.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # at least one parameter leaf is actually sharded over devices
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, s_f.params)
    )
    assert any(not s.is_fully_replicated for s in shardings)


def test_tp_sharding_specs(setup):
    """Megatron cut: qkv/fc1 column-sharded, proj/fc2 row-sharded."""
    from jax.sharding import PartitionSpec as P

    model, tx, state = setup
    mesh = parallel.create_mesh((2, 4), ("data", "model"))
    sh = parallel.tp_sharding(mesh, state.params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    col = [k for k in flat if k.endswith("fc1/kernel")]
    row = [k for k in flat if k.endswith("fc2/kernel")]
    out = [k for k in flat if k.endswith("proj/kernel") and "Mlp" not in k]
    assert col and row
    assert all(flat[k].spec == P(None, "model") for k in col)
    assert all(flat[k].spec == P("model", None) for k in row)
    # PatchEmbed's conv is also named 'proj' — 4-D kernels must stay
    # replicated; 2-D attention-out kernels must be row-sharded.
    for k in out:
        leaf = {
            "/".join(str(getattr(p, "key", p)) for p in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
        }[k]
        expect = P("model", None) if leaf.ndim == 2 else P()
        assert flat[k].spec == expect, (k, leaf.shape, flat[k].spec)


def test_tensor_parallel_step_matches_replicated(setup):
    """dp×tp (2×4 mesh) train step ≡ replicated single-mesh step."""
    model, tx, state = setup
    step = engine.make_train_step(model, L.cross_entropy, tx, random_shift=False)
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    rng = jax.random.PRNGKey(7)

    mesh1 = parallel.create_mesh((-1,), ("data",))
    rep = parallel.jit_train_step(step, mesh1, donate_state=False)
    s_rep, m_rep = rep(
        parallel.replicate(mesh1, state),
        parallel.shard_batch(mesh1, images),
        parallel.shard_batch(mesh1, targets),
        parallel.replicate(mesh1, rng),
    )

    mesh = parallel.create_mesh((2, 4), ("data", "model"))
    sh = parallel.tp_sharding(mesh, state)
    tp = parallel.jit_train_step(
        step, mesh, donate_state=False, state_shardings=sh
    )
    s_tp, m_tp = tp(
        parallel.shard_like(state, sh),
        parallel.shard_batch(mesh, images),
        parallel.shard_batch(mesh, targets),
        jax.device_put(rng, parallel.replicated(mesh)),
    )
    assert abs(float(m_rep["loss"]) - float(m_tp["loss"])) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(s_rep.params),
        jax.tree_util.tree_leaves(s_tp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the wide projections are genuinely sharded over the model axis
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, s_tp.params)
    )
    assert any(not s.is_fully_replicated for s in shardings)


def test_tensor_parallel_pallas_head_shard(monkeypatch):
    """tp + fused Pallas kernels: shard_map splits the kernels over HEADS on
    the model axis (models/attention._tp_shard_call) — train step ≡ the
    replicated-kernel run, for both the full-neighborhood (mode 0) and the
    sampled-neighbor (random-shift MODE>0) kernel families. Interpret-mode
    kernels on the 8-device CPU mesh; stage 3 exercises the fused
    full-attention kernel the same way."""
    from vil_tpu.ops.pallas import (
        full_attention, vil_backward, vil_kernel, vil_mode_kernel,
    )

    monkeypatch.setattr(vil_kernel, "INTERPRET", True)
    monkeypatch.setattr(vil_backward, "INTERPRET", True)
    monkeypatch.setattr(vil_mode_kernel, "INTERPRET", True)
    monkeypatch.setattr(full_attention, "INTERPRET", True)

    arch2 = (
        "l1,h2,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2"
        "_l3,h2,d32,n1,s0,g0,p2,f2"
    )
    mesh = parallel.create_mesh((2, 2), ("data", "model"))
    cfg = get_default_cfg()
    cfg.OPTIM.OPT = "adamw"

    def build(tp_mesh):
        model = MsViT(
            arch=arch2, img_size=32, num_classes=10,
            attn_type="longformerhand", sharew=True, use_pallas=True,
            tp_mesh=tp_mesh,
        )
        x = jnp.ones((8, 32, 32, 3))
        state = engine.create_train_state(
            model, O.get_opt(cfg, None, lr=1e-3), jax.random.PRNGKey(0), x
        )
        tx = O.get_opt(cfg, state.params, lr=1e-3)
        return model, tx, state.replace(opt_state=tx.init(state.params))

    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
    rng = jax.random.PRNGKey(7)

    for random_shift in (False, True):
        # replicated-kernel single-mesh run (no tp_mesh)
        model_r, tx_r, state_r = build(None)
        step_r = engine.make_train_step(
            model_r, L.cross_entropy, tx_r, random_shift=random_shift
        )
        s1, m1 = jax.jit(step_r)(state_r, images, targets, rng)

        # head-sharded kernels on the dp×tp mesh
        model_t, tx_t, state_t = build(mesh)
        step_t = engine.make_train_step(
            model_t, L.cross_entropy, tx_t, random_shift=random_shift
        )
        sh = parallel.tp_sharding(mesh, state_t)
        tp = parallel.jit_train_step(
            step_t, mesh, donate_state=False, state_shardings=sh
        )
        s2, m2 = tp(
            parallel.shard_like(state_t, sh),
            parallel.shard_batch(mesh, images),
            parallel.shard_batch(mesh, targets),
            jax.device_put(rng, parallel.replicated(mesh)),
        )
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5, random_shift
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params),
            jax.tree_util.tree_leaves(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )
