"""Spatial (sequence) parallelism: sliding-chunk attention sharded over the
chunk-row grid (vil_tpu/parallel/spatial.py) must be EXACT vs the unsharded
XLA tier — values and gradients — on a ('data', 'spatial') = (2, 4) mesh
(batch and mx sharded simultaneously). Covers the full-neighborhood mode,
self-only mode, a static sampled mode, a traced sampled mode, and the
distributed-softmax global branch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vil_tpu.ops import masks as masks_lib
from vil_tpu.ops import sliding_chunk as sc
from vil_tpu.ops.pallas import vil_kernel
from vil_tpu.parallel import spatial

B, MX, MY, W, H, M, NGLO = 2, 8, 4, 3, 2, 8, 1
W2 = W * W
C = H * M


def _mesh():
    dev = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(dev, ("data", "spatial"))


def _inputs(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    f = lambda i, shp: jax.random.normal(ks[i], shp, jnp.float32) * 0.5
    q = f(0, (B, MX, MY, W2, C))
    k = f(1, (B, MX, MY, W2, C))
    v = f(2, (B, MX, MY, W2, C))
    kg = f(3, (B, NGLO, C))
    vg = f(4, (B, NGLO, C))
    bias = f(5, (H, W2, NGLO + 9 * W2)) * 0.3
    return q, k, v, kg, vg, bias


def _mask_add(mode):
    mb = masks_lib.invalid_mask(MX, MY, 0, 0, W, 0, mode)
    return jnp.asarray(vil_kernel.mask_to_additive(mb, MX, MY, W2, NGLO))


def _reference(q, k, v, kg, vg, bias, mask_add, mode):
    """Unsharded oracle — _xla_reference_mh generalized over mode."""
    def to_bh(t):
        b, a1, a2, a3, _ = t.shape
        return (t.reshape(b, a1, a2, a3, H, M)
                .transpose(0, 4, 1, 2, 3, 5).reshape(b * H, a1, a2, a3, M))

    def glo_to_bh(t):
        b, g, _ = t.shape
        return t.reshape(b, g, H, M).transpose(0, 2, 1, 3).reshape(b * H, g, M)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    s_loc = sc.sliding_chunk_qk(qh, kh, mode)
    s_glo = jnp.einsum("bmnlc,btc->bmnlt", qh, glo_to_bh(kg),
                       preferred_element_type=jnp.float32)
    s = jnp.concatenate([s_glo, s_loc], axis=-1)
    s = s + jnp.tile(bias, (B, 1, 1))[:, None, None]
    s = s + mask_add.astype(jnp.float32)[None]
    m = jax.lax.stop_gradient(s.max(axis=-1, keepdims=True))
    p = jax.nn.softmax(s - m, axis=-1)
    out = sc.sliding_chunk_av(p[..., NGLO:], vh, mode)
    out = out + jnp.einsum("bmnlt,btc->bmnlc", p[..., :NGLO], glo_to_bh(vg),
                           preferred_element_type=jnp.float32)
    return (out.reshape(B, H, MX, MY, W2, M)
            .transpose(0, 2, 3, 4, 1, 5).reshape(B, MX, MY, W2, C))


def _sharded_fn(mesh, mode):
    data5 = P("data", "spatial")
    return jax.shard_map(
        lambda q, k, v, kg, vg, bias, mask: spatial.spatial_local_attention(
            q, k, v, kg, vg, bias, mask, H, "spatial", mode
        ),
        mesh=mesh,
        in_specs=(data5, data5, data5, P("data"), P("data"), P(), P("spatial")),
        out_specs=data5,
    )


@pytest.mark.parametrize("mode", [0, -1, 3])
def test_spatial_local_attention_matches_unsharded(mode):
    mesh = _mesh()
    q, k, v, kg, vg, bias = _inputs()
    span = {0: 9, -1: 1}.get(mode, 2) * W2  # kv span per mode
    bias = bias[..., : NGLO + span]
    mask = _mask_add(mode)
    out_sp = jax.jit(_sharded_fn(mesh, mode))(q, k, v, kg, vg, bias, mask)
    out_ref = _reference(q, k, v, kg, vg, bias, mask, mode)
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )
    if mode == 0:  # anchor against the canonical oracle too
        out_can = vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias,
                                               np.asarray(mask), H)
        np.testing.assert_allclose(
            np.asarray(out_sp), np.asarray(out_can), atol=2e-5, rtol=2e-5
        )


def test_spatial_local_attention_traced_mode():
    """One compilation serves all sampled blocks; the mode index and the
    per-mode mask row are traced values (random-shift training shape)."""
    mesh = _mesh()
    q, k, v, kg, vg, bias = _inputs(1)
    bias2 = bias[..., : NGLO + 2 * W2]
    all_masks = jnp.stack(
        [_mask_add(m_) for m_ in range(1, 9)]
    )  # (8, MX, MY, wq, NGLO+2W²)

    def run(mode, q, k, v, kg, vg, bias, masks):
        fn = jax.shard_map(
            lambda q, k, v, kg, vg, b, mk: spatial.spatial_local_attention(
                q, k, v, kg, vg, b, mk[mode - 1], H, "spatial", mode
            ),
            mesh=mesh,
            in_specs=(P("data", "spatial"),) * 3
            + (P("data"), P("data"), P(), P(None, "spatial")),
            out_specs=P("data", "spatial"),
        )
        return fn(q, k, v, kg, vg, bias, masks)

    jitted = jax.jit(run)
    for m_ in (1, 5, 8):
        out_sp = jitted(jnp.asarray(m_), q, k, v, kg, vg, bias2, all_masks)
        out_ref = _reference(q, k, v, kg, vg, bias2, _mask_add(m_), m_)
        np.testing.assert_allclose(
            np.asarray(out_sp), np.asarray(out_ref), atol=2e-5, rtol=2e-5
        )


def test_spatial_local_attention_grads_match():
    mesh = _mesh()
    q, k, v, kg, vg, bias = _inputs(2)
    mask = _mask_add(0)
    fn = _sharded_fn(mesh, 0)

    def loss_sp(q, k, v):
        return jnp.sum(fn(q, k, v, kg, vg, bias, mask) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, kg, vg, bias, mask, 0) ** 2)

    gs = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5
        )


def test_spatial_global_branch_matches_unsharded():
    """glo→all attention with the distributed two-part softmax (pmax/psum
    partials) equals the single-device math."""
    mesh = _mesh()
    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    f = lambda i, shp: jax.random.normal(ks[i], shp, jnp.float32) * 0.5
    qg = f(0, (B, H, NGLO, M))
    k_img = f(1, (B, MX, MY, W2, C))
    v_img = f(2, (B, MX, MY, W2, C))
    kg = f(3, (B, NGLO, C))
    vg = f(4, (B, NGLO, C))
    g2g = f(5, (H, NGLO, NGLO)) * 0.3
    g2l0 = f(6, (H, NGLO)) * 0.3

    fn = jax.shard_map(
        lambda qg, ki, vi, kg, vg: spatial.spatial_global_branch(
            qg, ki, vi, kg, vg, g2g, g2l0, None, "spatial"
        ),
        mesh=mesh,
        in_specs=(P("data"), P("data", "spatial"), P("data", "spatial"),
                  P("data"), P("data")),
        out_specs=P("data"),
    )
    out_sp = jax.jit(fn)(qg, k_img, v_img, kg, vg)

    # unsharded reference (models/attention.py chunked-native global branch)
    k6 = k_img.reshape(B, MX, MY, W2, H, M)
    v6 = v_img.reshape(B, MX, MY, W2, H, M)
    kg4 = kg.reshape(B, NGLO, H, M)
    vg4 = vg.reshape(B, NGLO, H, M)
    s_loc = jnp.sum(
        (k6[:, :, :, :, :, None, :] * qg[:, None, None, None]), axis=-1
    ) + g2l0[None, None, None, None]
    s_glo = jnp.sum((kg4[:, :, :, None, :] * qg[:, None]), axis=-1)
    s_glo = s_glo + g2g.transpose(2, 0, 1)[None]
    m0 = jnp.maximum(jnp.max(s_loc, axis=(1, 2, 3)), jnp.max(s_glo, axis=1))
    e_loc = jnp.exp(s_loc - m0[:, None, None, None])
    e_glo = jnp.exp(s_glo - m0[:, None])
    den = e_loc.sum(axis=(1, 2, 3)) + e_glo.sum(axis=1)
    out_ref = jnp.sum(
        (e_loc / den[:, None, None, None])[..., None] * v6[:, :, :, :, :, None, :],
        axis=(1, 2, 3),
    ) + jnp.sum((e_glo / den[:, None])[..., None] * vg4[:, :, :, None, :], axis=1)
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("fused_bwd", [True, False])
def test_spatial_pallas_halo_kernel_matches_unsharded(monkeypatch, fused_bwd):
    """The Pallas halo-input kernel path under spatial sharding (interpret
    mode): halo exchange outside the custom_vjp, whole-image kernels over
    mx+2 rows with traced per-row mask classes — values AND grads must match
    the unsharded oracle, through BOTH the fused halo backward kernel and
    the XLA-recompute fallback."""
    monkeypatch.setattr(vil_kernel, "INTERPRET", True)
    if not fused_bwd:  # force the XLA-recompute backward fallback
        from vil_tpu.ops.pallas import vil_backward

        monkeypatch.setattr(vil_backward, "WHOLE_IMAGE_VMEM_BYTES", 0)
    mesh = _mesh()
    q, k, v, kg, vg, bias = _inputs(4)
    mask = _mask_add(0)
    classes_host, row_class = spatial.halo_tables(np.asarray(mask), NGLO)
    assert classes_host.shape[0] >= 2  # boundary rows differ from interior
    fused = vil_kernel.make_fused_vil_attention_halo(classes_host, NGLO, H)
    row_class = jnp.asarray(row_class)

    data5 = P("data", "spatial")
    fn = jax.shard_map(
        lambda q, k, v, kg, vg, b, rc: spatial.spatial_local_attention_pallas(
            q, k, v, kg, vg, b, rc, fused, "spatial"
        ),
        mesh=mesh,
        in_specs=(data5, data5, data5, P("data"), P("data"), P(),
                  P("spatial")),
        out_specs=data5,
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    out_sp = jax.jit(fn)(q, k, v, kg, vg, bias, row_class)
    out_ref = vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias,
                                           np.asarray(mask), H)
    np.testing.assert_allclose(
        np.asarray(out_sp), np.asarray(out_ref), atol=2e-4, rtol=2e-4
    )

    def loss_sp(q, k, v, bias):
        return jnp.sum(fn(q, k, v, kg, vg, bias, row_class) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias,
                                         np.asarray(mask), H) ** 2
        )

    gs = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_gspmd_whole_model_spatial_forward():
    """Whole-MsViT forward with the INPUT IMAGE sharded over its height axis
    (batch over 'data' simultaneously): GSPMD propagates the sharding through
    patch embeds, chunked attention (cyclic rolls become collective
    permutes), and the full-attention stages — logits must match the
    unsharded run. parallel/spatial.py is the hand-optimized op path; this
    certifies the zero-code whole-model path through the user-facing
    ``parallel.jit_spatial_forward`` / ``shard_image`` API."""
    from jax.sharding import NamedSharding

    from vil_tpu import parallel
    from vil_tpu.models import MsViT

    model = MsViT(
        arch=(
            "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2"
            "_l3,h2,d32,n1,s0,g0,p2,f2"
        ),
        img_size=32, num_classes=10, attn_type="longformerhand",
        sharew=True, dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x)
    ref = jax.jit(lambda v, t: model.apply(v, t, deterministic=True))(
        vars_, x
    )
    mesh = _mesh()
    rep = NamedSharding(mesh, P())
    f = parallel.jit_spatial_forward(model, mesh)
    out = f(jax.device_put(vars_, rep), parallel.shard_image(mesh, x))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    # spatial-only mesh (no data axis): batch replicated, height sharded
    from jax.sharding import Mesh

    mesh_s = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("spatial",))
    f_s = parallel.jit_spatial_forward(model, mesh_s)
    out_s = f_s(
        jax.device_put(vars_, NamedSharding(mesh_s, P())),
        parallel.shard_image(mesh_s, x),
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_spatial_train_step_matches_single_device():
    """Full TRAIN step on a ('data','spatial') mesh — loss and updated
    params must match the single-device step. jit_train_step shards the
    image height over the mesh's 'spatial' axis automatically
    (mesh.image_sharding), so ``TPU.MESH_AXES ['data','spatial']`` turns on
    whole-model spatial parallelism from the CLI config."""
    from vil_tpu.config import get_default_cfg
    from vil_tpu.models import MsViT
    from vil_tpu.train import engine
    from vil_tpu.train import loss as L
    from vil_tpu.train import optim as O

    arch = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2"
        "_l3,h2,d32,n1,s0,g0,p2,f2"
    )
    model = MsViT(arch=arch, img_size=32, num_classes=10,
                  attn_type="longformerhand", sharew=True)
    cfg = get_default_cfg()
    cfg.OPTIM.OPT = "adamw"
    x = jnp.ones((8, 32, 32, 3))
    state = engine.create_train_state(
        model, O.get_opt(cfg, None, lr=1e-3), jax.random.PRNGKey(0), x
    )
    tx = O.get_opt(cfg, state.params, lr=1e-3)
    state = state.replace(opt_state=tx.init(state.params))
    step = engine.make_train_step(model, L.cross_entropy, tx,
                                  random_shift=False)
    rng = jax.random.PRNGKey(7)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    targets = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)

    s1, m1 = jax.jit(step)(state, images, targets, rng)

    from vil_tpu import parallel

    mesh = parallel.create_mesh((-1, 4), ("data", "spatial"))
    sharded = parallel.jit_train_step(step, mesh, donate_state=False)
    s_sp, m_sp = sharded(
        parallel.replicate(mesh, state),
        parallel.shard_image(mesh, images),
        parallel.shard_batch(mesh, targets),
        parallel.replicate(mesh, rng),
    )
    assert abs(float(m1["loss"]) - float(m_sp["loss"])) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_halo_rows_cyclic():
    mesh = _mesh()
    x = jnp.arange(B * MX * MY * W2 * C, dtype=jnp.float32).reshape(
        B, MX, MY, W2, C
    )

    def f(t):
        top, bot = spatial.halo_rows(t, "spatial")
        return top, bot

    top, bot = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("data", "spatial"),),
        out_specs=(P("data", "spatial"), P("data", "spatial")),
    ))(x)
    # shard s holds rows [2s, 2s+1]; its top halo = global row 2s-1 (cyclic),
    # its bottom halo = global row (2s+2) % MX
    np.testing.assert_allclose(np.asarray(top[:, 0]), np.asarray(x[:, -1]))
    np.testing.assert_allclose(np.asarray(top[:, 1]), np.asarray(x[:, 1]))
    np.testing.assert_allclose(np.asarray(bot[:, 0]), np.asarray(x[:, 2]))
    np.testing.assert_allclose(np.asarray(bot[:, -1]), np.asarray(x[:, 0]))


def test_spatial_trainer_end_to_end(tmp_path):
    """run_experiment with ``TPU.MESH_AXES ['data','spatial']``: the full
    Trainer wiring (epoch loop, ckpt save, per-epoch eval, best-ckpt
    re-eval) on a 2×4 data×spatial CPU mesh — certifying the CLI-level
    spatial-parallel TRAINING path end-to-end, not just the op
    (test_spatial_train_step_matches_single_device)."""
    import os.path as op

    from vil_tpu.config import get_default_cfg
    from vil_tpu.train.trainer import run_experiment

    cfg = get_default_cfg()
    cfg.DATA.TRAIN = ("synthetic",)
    cfg.DATA.TEST = ("synthetic",)
    cfg.INPUT.IMAGE_SIZE = 32
    cfg.DATA.NUM_CLASSES = 10
    cfg.DATALOADER.BSZ = 8
    cfg.DATALOADER.WORKERS = 0
    cfg.MODEL.VIT.MSVIT.ARCH = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h1,d16,n1,s1,g1,p2,f2"
        "_l3,h1,d16,n1,s0,g0,p2,f2"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SHAPE = (2, 4)
    cfg.TPU.MESH_AXES = ("data", "spatial")
    cfg.OPTIM.EPOCHS = 2
    cfg.OPTIM.LR = 1e-3
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()
    accs = run_experiment(cfg)
    # final best-checkpoint eval ran and produced a sane accuracy
    assert len(accs) == 1 and 0.0 <= accs[0] <= 100.0
    assert op.isfile(op.join(str(tmp_path), "model_best.ckpt"))
    assert op.isfile(op.join(str(tmp_path), "config.yaml"))
