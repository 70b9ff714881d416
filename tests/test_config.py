"""Config system tests: yacs-compatible behavior + ARCH parser."""
import pytest

from vil_tpu.config import get_default_cfg
from vil_tpu.models.arch import ARCH_ZOO, parse_arch


def test_defaults_schema():
    cfg = get_default_cfg()
    assert cfg.INPUT.IMAGE_SIZE == 224
    assert cfg.MODEL.VIT.MSVIT.ATTN_TYPE == "longformerhand"
    assert cfg.MODEL.VIT.MSVIT.SW_EXACT == 0
    assert cfg.OPTIM.OPT == "adamw"
    assert cfg.DATALOADER.BSZ == 128


def test_merge_from_list():
    cfg = get_default_cfg()
    cfg.merge_from_list(
        ["MODEL.VIT.MSVIT.ATTN_TYPE", "full", "OPTIM.LR", "5e-4",
         "DATALOADER.BSZ", "64", "EVALUATE", "True"]
    )
    assert cfg.MODEL.VIT.MSVIT.ATTN_TYPE == "full"
    assert cfg.OPTIM.LR == 5e-4
    assert cfg.DATALOADER.BSZ == 64
    assert cfg.EVALUATE is True


def test_merge_rejects_unknown_key():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.NO_SUCH_KEY", "1"])


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.OPTIM.LR = 0.1
    cfg.defrost()
    cfg.OPTIM.LR = 0.1
    assert cfg.OPTIM.LR == 0.1


def test_merge_from_file_reference_yaml(tmp_path):
    """The reference's own YAML config must merge cleanly."""
    import shutil

    src = "/root/reference/src/config/msvit.yaml"
    dst = tmp_path / "msvit.yaml"
    shutil.copy(src, dst)
    cfg = get_default_cfg()
    cfg.merge_from_file(str(dst))
    assert cfg.LOSS.LABEL_SMOOTHING == 0.1
    assert cfg.AUG.TIMM_AUG.AUTO_AUGMENT == "rand-m9-mstd0.5-inc1"  # open node
    assert cfg.OPTIM.LR == 5e-4
    assert cfg.SOLVER.LR_POLICY == "cosine"
    assert cfg.AMP.ENABLED is True


def test_timm_aug_open_node():
    cfg = get_default_cfg()
    cfg.AUG.TIMM_AUG.NEW_FIELD = 3
    assert cfg.AUG.TIMM_AUG.NEW_FIELD == 3


def test_dump_roundtrip():
    import yaml

    cfg = get_default_cfg()
    d = yaml.safe_load(cfg.dump())
    assert d["MODEL"]["VIT"]["MSVIT"]["SW_EXACT"] == 0


def test_parse_arch_defaults():
    stages = parse_arch("l1_l2_l3")
    assert len(stages) == 3
    s = stages[0]
    assert (s.num_heads, s.dim, s.num_blocks) == (3, 192, 1)
    assert (s.is_sparse_attn, s.nglo, s.patch_size, s.num_feats, s.ape) == (1, 1, 2, 7, 1)


def test_parse_arch_default_cfg_string():
    from vil_tpu.config import get_default_cfg

    stages = parse_arch(get_default_cfg().MODEL.VIT.MSVIT.ARCH)
    assert [s.dim for s in stages] == [192, 384, 796]
    assert [s.patch_size for s in stages] == [16, 2, 2]
    assert [s.num_blocks for s in stages] == [1, 10, 1]
    assert [s.is_sparse_attn for s in stages] == [1, 0, 0]


def test_parse_arch_zoo():
    for name, arch in ARCH_ZOO.items():
        stages = parse_arch(arch)
        assert len(stages) == 4, name
        assert stages[-1].nglo == 0, name


def test_parse_arch_errors():
    with pytest.raises(ValueError):
        parse_arch("l2_l1_l3")  # stage id mismatch
    with pytest.raises(ValueError):
        parse_arch("l1,z5_l2_l3")  # unknown key
    with pytest.raises(ValueError):
        parse_arch("l1_l2")  # wrong stage count
