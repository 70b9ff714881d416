"""torchvision-zoo ResNets: graph parity, weight import, train smoke.

The torch reference below is a from-scratch implementation of the
torchvision v1.5 ResNet graph (stride on the bottleneck's 3×3 conv) —
torchvision itself is not installed in this image, so it doubles as the
golden oracle for both the flax graph and the state-dict importer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from vil_tpu.models.resnet import (
    RESNET_ZOO, build_resnet, import_torch_resnet,
)

# canonical torchvision ImageNet-1000 parameter counts
PARAM_COUNTS = {
    "resnet18": 11_689_512,
    "resnet34": 21_797_672,
    "resnet50": 25_557_032,
    "resnet101": 44_549_160,
    "resnet152": 60_192_808,
    "resnext50_32x4d": 25_028_904,
    "resnext101_32x8d": 88_791_336,
    "wide_resnet50_2": 68_883_240,
    "wide_resnet101_2": 126_886_696,
}


# ----------------------------------------------------------------- torch ref
class TBasic(tnn.Module):
    expansion = 1

    def __init__(self, inp, planes, stride, groups=1, base_width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inp != planes:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inp, planes, stride, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(inp, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inp != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idt)


class TResNet(tnn.Module):
    def __init__(self, block, layers, num_classes=1000, groups=1,
                 base_width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inp = 64
        for i, n in enumerate(layers):
            planes = 64 * 2 ** i
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(inp, planes, stride, groups, base_width))
                inp = planes * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(inp, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


TORCH_ZOO = {
    "resnet18": lambda: TResNet(TBasic, (2, 2, 2, 2)),
    "resnet50": lambda: TResNet(TBottleneck, (3, 4, 6, 3)),
    "resnext50_32x4d": lambda: TResNet(
        TBottleneck, (3, 4, 6, 3), groups=32, base_width=4),
}


@pytest.mark.parametrize("name", sorted(RESNET_ZOO))
def test_param_counts_match_torchvision(name):
    model = build_resnet(name, num_classes=1000)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    )
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n == PARAM_COUNTS[name], name


@pytest.mark.parametrize("name", ["resnet18", "resnet50", "resnext50_32x4d"])
def test_forward_matches_torch_reference(name):
    torch.manual_seed(0)
    tmodel = TORCH_ZOO[name]().eval()
    # perturb BN stats so use_running_average really gets exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = tmodel(x).numpy()

    variables = import_torch_resnet(tmodel.state_dict())
    model = build_resnet(name, num_classes=1000)
    out = model.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


def test_imported_variables_match_init_structure():
    tmodel = TORCH_ZOO["resnet18"]()
    imported = import_torch_resnet(tmodel.state_dict())
    model = build_resnet("resnet18", num_classes=1000)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    for col in ("params", "batch_stats"):
        a = jax.tree_util.tree_map(jnp.shape, init[col])
        b = jax.tree_util.tree_map(np.shape, imported[col])
        assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda x, y: x == y, a, b)
        )


def test_train_step_updates_batch_stats():
    import optax

    from vil_tpu.train.engine import create_train_state, make_train_step
    from vil_tpu.train.loss import cross_entropy

    model = build_resnet("resnet18", num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3))
    targets = jnp.asarray([0, 1, 2, 3])
    tx = optax.sgd(0.1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x)
    assert "batch_stats" in state.buffers
    step = jax.jit(make_train_step(model, cross_entropy, tx))
    before = jax.tree_util.tree_leaves(state.buffers["batch_stats"])
    state2, metrics = step(state, x, targets, jax.random.PRNGKey(2))
    after = jax.tree_util.tree_leaves(state2.buffers["batch_stats"])
    assert np.isfinite(float(metrics["loss"]))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    # eval path runs off the running averages
    logits = model.apply(state2.variables(), x)
    assert logits.shape == (4, 7)


def test_build_model_routes_resnet_names():
    from vil_tpu.config import get_default_cfg
    from vil_tpu.models import build_model

    cfg = get_default_cfg()
    cfg.MODEL.ARCH = "resnet18"
    cfg.DATA.NUM_CLASSES = 5
    model = build_model(cfg)
    out = model.apply(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))),
        jnp.zeros((2, 64, 64, 3)),
    )
    assert out.shape == (2, 5)
    cfg.MODEL.PRETRAINED = True
    with pytest.raises(ValueError):
        build_model(cfg)