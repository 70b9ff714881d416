"""Data pipeline tests: transforms, samplers, TSV stack, loader, mixup."""
import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vil_tpu.config import get_default_cfg
from vil_tpu.data import (
    build_transforms,
    make_epoch_data_loader,
    make_mixup_fn,
)
from vil_tpu.data import samplers as S
from vil_tpu.data import tsv as T


def _cfg(size=32, bsz=8):
    cfg = get_default_cfg()
    cfg.INPUT.IMAGE_SIZE = size
    cfg.DATALOADER.BSZ = bsz
    cfg.DATALOADER.WORKERS = 2
    cfg.DATA.TRAIN = ("synthetic",)
    cfg.DATA.TEST = ("synthetic",)
    cfg.DATA.NUM_CLASSES = 10
    return cfg


def test_eval_transform_shapes():
    cfg = _cfg(32)
    t = build_transforms(cfg, is_train=False)
    img = Image.fromarray(np.zeros((57, 91, 3), dtype=np.uint8))
    out = t(img)
    assert out.shape == (32, 32, 3)
    # normalization applied: zeros -> -mean/std
    np.testing.assert_allclose(
        out[0, 0], -np.asarray(cfg.INPUT.MEAN) / np.asarray(cfg.INPUT.STD), atol=1e-6
    )


def test_eval_transform_rounding_math():
    """PIXEL-parity guard for the eval path's size/rounding details
    (reference build.py:105-110): precrop = int(IMAGE_SIZE/CROP_PCT);
    short-side resize computes the long side as int(size*long/short)
    (truncation, torchvision F.resize); center crop offsets are
    int(round((dim-size)/2)) — a wrong rounding here silently shifts every
    eval pixel and costs tenths of top-1. Asserted by composing the exact
    PIL calls by hand and demanding byte-identical output."""
    cfg = _cfg(224)
    cfg.INPUT.INTERPOLATION = 2  # bilinear
    t = build_transforms(cfg, is_train=False)
    rng = np.random.default_rng(3)
    # landscape 300×200 (w>h): precrop=int(224/0.875)=256 on the SHORT side
    raw = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    img = Image.fromarray(raw)
    out = t(img)
    assert cfg.INPUT.CROP_PCT == 0.875 and int(224 / 0.875) == 256
    # hand-composed torchvision math: oh=256, ow=int(256*300/200)=384
    ref = img.resize((384, 256), Image.BILINEAR)
    top = int(round((256 - 224) / 2.0))    # 16
    left = int(round((384 - 224) / 2.0))   # 80
    ref = ref.crop((left, top, left + 224, top + 224))
    ref_arr = np.asarray(ref, dtype=np.float32) / 255.0
    mean = np.asarray(cfg.INPUT.MEAN, np.float32)
    std = np.asarray(cfg.INPUT.STD, np.float32)
    np.testing.assert_allclose(out, (ref_arr - mean) / std, atol=1e-6)

    # portrait + ODD crop residue (height 255 → 255-224=31, round(15.5)=16
    # exercises banker's-vs-arithmetic rounding: torchvision uses
    # int(round(...)) which is round-half-even in py3 → 16)
    raw2 = rng.integers(0, 255, (300, 200, 3), dtype=np.uint8)
    img2 = Image.fromarray(raw2)
    out2 = build_transforms(cfg, is_train=False)(img2)
    ref2 = img2.resize((256, int(256 * 300 / 200)), Image.BILINEAR)  # (256,384)
    top2 = int(round((384 - 224) / 2.0))
    left2 = int(round((256 - 224) / 2.0))
    ref2 = ref2.crop((left2, top2, left2 + 224, top2 + 224))
    ref2_arr = np.asarray(ref2, dtype=np.float32) / 255.0
    np.testing.assert_allclose(out2, (ref2_arr - mean) / std, atol=1e-6)

    # short side ALREADY at precrop → resize is a no-op (torchvision's
    # early-out), crop only
    raw3 = rng.integers(0, 255, (256, 320, 3), dtype=np.uint8)
    out3 = build_transforms(cfg, is_train=False)(Image.fromarray(raw3))
    ref3 = raw3[16 : 16 + 224, 48 : 48 + 224].astype(np.float32) / 255.0
    np.testing.assert_allclose(out3, (ref3 - mean) / std, atol=1e-6)


def test_eval_interpolation_code_selects_pil_filter():
    """INPUT.INTERPOLATION uses PIL codes (2=bilinear, 3=bicubic — the
    reference passes the int straight to torchvision, build.py:105). The
    code must select the matching PIL filter exactly, and the two filters
    must actually differ on a non-trivial image."""
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    img = Image.fromarray(raw)
    outs = {}
    for code, pil_filter in [(2, Image.BILINEAR), (3, Image.BICUBIC)]:
        cfg = _cfg(64)
        cfg.INPUT.INTERPOLATION = code
        out = build_transforms(cfg, is_train=False)(img)
        precrop = int(64 / cfg.INPUT.CROP_PCT)  # 73
        ref = img.resize((int(precrop * 300 / 200), precrop), pil_filter)
        w, h = ref.size
        top, left = int(round((h - 64) / 2.0)), int(round((w - 64) / 2.0))
        ref_arr = (
            np.asarray(ref.crop((left, top, left + 64, top + 64)), np.float32)
            / 255.0
        )
        mean = np.asarray(cfg.INPUT.MEAN, np.float32)
        std = np.asarray(cfg.INPUT.STD, np.float32)
        np.testing.assert_allclose(out, (ref_arr - mean) / std, atol=1e-6)
        outs[code] = out
    assert np.abs(outs[2] - outs[3]).max() > 1e-3


def test_eval_resize_pixels_vs_torch_antialias_oracle():
    """INDEPENDENT oracle for the interpolation itself: torch
    F.interpolate(antialias=True) was implemented to match PIL's
    antialiased resampling (the torchvision tensor backend). A missing
    antialias filter, a wrong kernel, or an align-corners bug would blow
    far past the uint8-rounding band (PIL rounds to uint8 at output;
    observed max diff vs torch ≲2/255)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    img = Image.fromarray(raw)
    for code, mode in [(2, "bilinear"), (3, "bicubic")]:
        ours = np.asarray(
            img.resize((384, 256), {2: Image.BILINEAR, 3: Image.BICUBIC}[code]),
            dtype=np.float32,
        ) / 255.0
        x = torch.from_numpy(raw.astype(np.float32) / 255.0)
        x = x.permute(2, 0, 1)[None]  # NCHW
        ref = F.interpolate(
            x, size=(256, 384), mode=mode, antialias=True,
            align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        if mode == "bicubic":
            # PIL clamps to uint8; torch bicubic rings — and the kernels
            # use different a (PIL −0.5, torch −0.75), visible only on
            # high-frequency noise: bound the distribution, not the max
            ref = np.clip(ref, 0.0, 1.0)
            d = np.abs(ours - ref)
            assert d.mean() < 3e-3 and np.quantile(d, 0.99) < 1e-2, (
                mode, d.mean(), np.quantile(d, 0.99)
            )
        else:
            err = np.abs(ours - ref).max()
            assert err < 2.5 / 255.0, (mode, err)


def test_train_transform_shapes():
    cfg = _cfg(32)
    t = build_transforms(cfg, is_train=True)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 48, 3), dtype=np.uint8)
    )
    out = t(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


def test_timm_transform():
    cfg = _cfg(32)
    cfg.AUG.TIMM_AUG.USE_TRANSFORM = True
    cfg.AUG.TIMM_AUG.AUTO_AUGMENT = "rand-m9-mstd0.5-inc1"
    cfg.AUG.TIMM_AUG.RE_PROB = 1.0
    cfg.AUG.TIMM_AUG.RE_MODE = "pixel"
    cfg.AUG.TIMM_AUG.RE_COUNT = 1
    cfg.AUG.TIMM_AUG.HFLIP = 0.5
    t = build_transforms(cfg, is_train=True)
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    )
    outs = [t(img) for _ in range(4)]
    assert all(o.shape == (32, 32, 3) for o in outs)
    # stochastic: at least two distinct results
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_finetune_transform():
    cfg = _cfg(32)
    cfg.FINETUNE.FINETUNE = True
    t = build_transforms(cfg, is_train=True)
    img = Image.fromarray(np.zeros((64, 64, 3), dtype=np.uint8))
    assert t(img).shape == (32, 32, 3)


def test_ra_sampler_semantics():
    # reference ra_sampler.py: repeated 3x, different copies on different
    # ranks, truncated to floor(len//256*256/world)
    length, world = 512, 4
    iters = [list(S.RASampler(length, world, r, seed=1)) for r in range(world)]
    assert all(len(it) == 512 // 256 * 256 // 4 for it in iters)
    # consecutive entries across ranks at the same position come from the
    # same repeated triple at least sometimes: check global multiset has
    # each index at most 3 times
    from collections import Counter

    all_idx = Counter(sum(iters, []))
    assert max(all_idx.values()) <= 3


def test_distributed_sampler_partition():
    length, world = 103, 4
    parts = [list(S.DistributedSampler(length, world, r, shuffle=False))
             for r in range(world)]
    assert all(len(p) == 26 for p in parts)
    union = set().union(*[set(p) for p in parts])
    assert union == set(range(length))


def test_tsv_roundtrip(tmp_path):
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (20, 20, 3), dtype=np.uint8)
    )
    b64 = T.encode_image_to_base64(img)
    rows = [[f"img{i}", json.dumps(i % 3), b64] for i in range(7)]
    tsv_file = str(tmp_path / "data.tsv")
    T.tsv_writer(rows, tsv_file)
    tf = T.TSVFile(tsv_file)
    assert tf.num_rows() == 7
    assert tf.seek(3)[0] == "img3"
    ds = T.ClsTsvDataset(tsv_file)
    img_out, target = ds[4]
    assert target == 1
    assert img_out.size == (20, 20)


def test_tsv_lineidx_matches_reference_format(tmp_path):
    """Our lineidx must be byte-identical to the reference's builder."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from dat.dataset.utils.tsv_file import create_lineidx as ref_create

    tsv_file = str(tmp_path / "x.tsv")
    with open(tsv_file, "w") as f:
        for i in range(5):
            f.write(f"key{i}\t{i}\tpayload{'x' * i}\n")
    ours, theirs = str(tmp_path / "ours.lineidx"), str(tmp_path / "ref.lineidx")
    T.create_lineidx(tsv_file, ours)
    ref_create(tsv_file, theirs)
    assert open(ours).read() == open(theirs).read()


def test_tsv_curation_ops(tmp_path):
    """Offline curation tail (reference tsv_file_ops.py:105-294):
    extract/remove column, merge label files/fields, remove fields,
    sort/reorder by keys."""
    a = str(tmp_path / "a.tsv")
    b = str(tmp_path / "b.tsv")
    T.tsv_writer(
        [["k0", json.dumps([{"class": "cat", "conf": 0.9}]), "payload0"],
         ["k1", json.dumps([{"class": "dog", "conf": 0.8}]), "payload1"]],
        a,
    )
    T.tsv_writer(
        [["k0", json.dumps([{"rect": [0, 0, 1, 1]}])],
         ["k1", json.dumps([{"rect": [2, 2, 3, 3]}])]],
        b,
    )

    # extract/remove column
    col = T.extract_column(a, col=2)
    assert [r for r in T.tsv_reader(col)] == [
        ["k0", "payload0"], ["k1", "payload1"]
    ]
    rem = T.remove_column(a, col=2)
    assert all(len(r) == 2 for r in T.tsv_reader(rem))

    # merge label lists (concat) and per-box fields (dict update)
    merged = T.merge_two_label_files(rem, b)
    rows = list(T.tsv_reader(merged))
    assert json.loads(rows[0][1]) == [
        {"class": "cat", "conf": 0.9}, {"rect": [0, 0, 1, 1]}
    ]
    mf = str(tmp_path / "mf.tsv")
    T.merge_label_fields(rem, b, mf)
    assert json.loads(next(iter(T.tsv_reader(mf)))[1]) == [
        {"class": "cat", "conf": 0.9, "rect": [0, 0, 1, 1]}
    ]
    rf = str(tmp_path / "rf.tsv")
    T.remove_label_fields(mf, rf, ["conf", "rect"])
    assert json.loads(next(iter(T.tsv_reader(rf)))[1]) == [{"class": "cat"}]

    # key alignment + sort/reorder
    rev = str(tmp_path / "rev.tsv")
    T.tsv_writer(list(T.tsv_reader(b))[::-1], rev)
    assert T.is_same_keys_for_files(a, b)
    assert not T.is_same_keys_for_files(a, rev)
    assert T.sort_file_based_on_keys(a, b) == b  # already aligned: no-op
    sorted_path = T.sort_file_based_on_keys(a, rev)
    assert [r[0] for r in T.tsv_reader(sorted_path)] == ["k0", "k1"]
    out = str(tmp_path / "reordered.tsv")
    T.reorder_tsv_keys(b, ["k1", "k0"], out)
    assert [r[0] for r in T.tsv_reader(out)] == ["k1", "k0"]


def test_zipdata(tmp_path):
    zpath = str(tmp_path / "val.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(4):
            img = Image.fromarray(
                np.full((16, 16, 3), i * 10, dtype=np.uint8)
            )
            import io

            buf = io.BytesIO()
            img.save(buf, "JPEG")
            z.writestr(f"n{i:02d}/img{i}.jpeg", buf.getvalue())
    map_file = str(tmp_path / "val_map.txt")
    with open(map_file, "w") as f:
        for i in range(4):
            f.write(f"x@n{i:02d}/img{i}.jpeg\t{i}\n")
    from vil_tpu.data.datasets import ZipData

    ds = ZipData(zpath, map_file)
    assert len(ds) == 4
    img, target = ds[2]
    assert target == 2 and img.size == (16, 16)


def test_loader_end_to_end():
    cfg = _cfg(32, bsz=8)
    loader = make_epoch_data_loader(cfg, is_train=True)
    batches = list(loader)
    assert len(batches) == len(loader) == 8
    imgs, targets = batches[0]
    assert imgs.shape == (8, 32, 32, 3) and imgs.dtype == np.float32
    assert targets.shape == (8,) and targets.dtype == np.int32
    # eval returns a list of loaders (reference loader.py:105-107)
    test_loaders = make_epoch_data_loader(cfg, is_train=False, drop_last=False)
    assert isinstance(test_loaders, list) and len(test_loaders) == 1


def test_mixup():
    fn = make_mixup_fn(mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0,
                       switch_prob=0.5, label_smoothing=0.1, num_classes=10)
    imgs = jnp.ones((4, 16, 16, 3))
    targets = jnp.asarray([0, 1, 2, 3])
    out, y = jax.jit(fn)(jax.random.PRNGKey(0), imgs, targets)
    assert out.shape == imgs.shape and y.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)
    # smoothed one-hot when prob=0
    fn0 = make_mixup_fn(prob=0.0, label_smoothing=0.1, num_classes=10)
    _, y0 = fn0(jax.random.PRNGKey(0), imgs, targets)
    assert abs(float(y0[0, 0]) - (1 - 0.1 + 0.01)) < 1e-6


def test_native_tsv_core(tmp_path):
    """Native C++ lineidx/row-reader/base64 must match the Python versions."""
    from vil_tpu.data import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    tsv_file = str(tmp_path / "n.tsv")
    with open(tsv_file, "w") as f:
        for i in range(50):
            f.write(f"key{i}\t{i}\t{'payload' * (i % 7)}\n")
    # lineidx parity with the python builder
    ours, py = str(tmp_path / "n1.lineidx"), str(tmp_path / "n2.lineidx")
    assert native.build_lineidx(tsv_file, ours)
    # python fallback path (bypass native)
    idx_tmp = py + ".tmp"
    with open(tsv_file, "rb") as fin, open(idx_tmp, "w") as fout:
        import os as _os

        fsize = _os.fstat(fin.fileno()).st_size
        fpos = 0
        while fpos != fsize:
            fout.write(str(fpos) + "\n")
            fin.readline()
            fpos = fin.tell()
    _os.rename(idx_tmp, py)
    assert open(ours).read() == open(py).read()
    # row reader
    offsets = [int(l) for l in open(ours)]
    rd = native.NativeRowReader(tsv_file)
    assert rd.read(offsets[7]).decode() == "key7\t7\t" + "payload" * 0
    assert rd.read(offsets[13]).decode().startswith("key13\t13\t")
    rd.close()
    # base64
    import base64 as b64

    payload = bytes(range(256)) * 3
    assert native.b64_decode(b64.b64encode(payload)) == payload


def test_tsvfile_native_path_matches_python(tmp_path):
    from vil_tpu.data import tsv as T2

    tsv_file = str(tmp_path / "m.tsv")
    T2.tsv_writer(([f"k{i}", i, f"v{i}"] for i in range(9)), tsv_file)
    tf = T2.TSVFile(tsv_file)
    rows_native = [tf.seek(i) for i in range(9)]
    tf2 = T2.TSVFile(tsv_file)
    tf2._native = False  # force python path
    rows_py = [tf2.seek(i) for i in range(9)]
    assert rows_native == rows_py


def test_grain_loader_matches_thread_loader():
    """GrainDataLoader: same batches, order, dtypes as the default loader."""
    import numpy as np

    from vil_tpu.data.grain_loader import GrainDataLoader
    from vil_tpu.data.loader import DataLoader
    from vil_tpu.data.samplers import SequentialSampler

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return np.full((4, 4, 3), i, np.float32), i

    ds, sampler = DS(), SequentialSampler(10)
    thread_batches = list(DataLoader(ds, sampler, 4, drop_last=False,
                                     num_workers=2))
    grain_batches = list(GrainDataLoader(ds, sampler, 4, drop_last=False,
                                         num_workers=0))
    assert len(thread_batches) == len(grain_batches) == 3
    for (ti, tt), (gi, gt) in zip(thread_batches, grain_batches):
        np.testing.assert_array_equal(ti, gi)
        np.testing.assert_array_equal(tt, gt)
        assert gi.dtype == np.float32 and gt.dtype == np.int32

    # drop_last truncates the ragged batch identically
    g2 = list(GrainDataLoader(ds, sampler, 4, drop_last=True, num_workers=0))
    assert len(g2) == 2 and len(GrainDataLoader(ds, sampler, 4)) == 2


def test_grain_worker_processes_pickle_real_datasets(tmp_path):
    """Grain worker PROCESSES pickle the data source: ZipData (open ZipFile
    handles) and TSVDataset (ctypes native reader + file handle) must ship
    across and lazily reopen in the worker — this exact combination was
    broken until data_bench.py exercised it (round 4)."""
    import io
    import pickle

    from vil_tpu.data.datasets import ZipData
    from vil_tpu.data.grain_loader import GrainDataLoader
    from vil_tpu.data.samplers import SequentialSampler
    from vil_tpu.data.tsv import ClsTsvDataset

    # tiny zip dataset
    zpath = str(tmp_path / "t.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(6):
            img = Image.fromarray(np.full((8, 8, 3), i * 7, dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, "JPEG")
            z.writestr(f"img{i}.jpeg", buf.getvalue())
    map_file = str(tmp_path / "t_map.txt")
    with open(map_file, "w") as f:
        for i in range(6):
            f.write(f"x@img{i}.jpeg\t{i}\n")
    zds = ZipData(zpath, map_file)

    # tiny cls TSV dataset (base64 jpegs)
    import base64

    tpath = str(tmp_path / "t.tsv")
    with open(tpath, "w") as f:
        for i in range(6):
            img = Image.fromarray(np.full((8, 8, 3), i * 9, dtype=np.uint8))
            buf = io.BytesIO()
            img.save(buf, "JPEG")
            f.write(f"k{i}\t{i}\t{base64.b64encode(buf.getvalue()).decode()}\n")
    tds = ClsTsvDataset(tpath)
    tds[0]  # force the native reader + file handle open BEFORE pickling

    for ds in (zds, tds):
        pickle.dumps(ds)  # must not raise
        batches = list(
            GrainDataLoader(ds, SequentialSampler(len(ds)), 3,
                            drop_last=True, num_workers=2)
        )
        assert len(batches) == 2
        targets = np.concatenate([t for _, t in batches])
        np.testing.assert_array_equal(targets, np.arange(6, dtype=np.int32))


def test_device_normalize_matches_host_normalize():
    """INPUT.DEVICE_NORMALIZE: uint8 input + on-device (x/255-mean)/std in
    PatchEmbed must match the host-normalized float path."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vil_tpu.data.transforms import ToNormalizedArray, ToUint8Array
    from vil_tpu.models import ARCH_ZOO, MsViT

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 256, (56, 56, 3), np.uint8))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    x_f32 = ToNormalizedArray(mean, std)(img)[None]
    x_u8 = ToUint8Array()(img)[None]
    assert x_u8.dtype == np.uint8

    model = MsViT(arch=ARCH_ZOO["vil_tiny"], img_size=56, num_classes=10,
                  attn_type="longformerhand", sharew=True, norm_embed=True,
                  input_mean=mean, input_std=std)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x_f32))
    out_f = model.apply(variables, jnp.asarray(x_f32))
    out_u = model.apply(variables, jnp.asarray(x_u8))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-5, rtol=1e-4)

    # synthetic float [0,1] arrays quantize to uint8
    arr = rng.rand(8, 8, 3).astype(np.float32)
    u8 = ToUint8Array()(arr)
    assert u8.dtype == np.uint8
    np.testing.assert_allclose(u8 / 255.0, arr, atol=1 / 255.0)
