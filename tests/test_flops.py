"""Analytic MACs vs the reference's published model cards (README.md:77-84,
107-114). Params must match exactly; MACs within 5% (the reference's hooked
counter approximates the longformer global branch differently)."""
import pytest

from vil_tpu.models.arch import ARCH_ZOO
from vil_tpu.ops.flops import model_macs


@pytest.mark.parametrize(
    "name,pub_gmacs,pub_mparams",
    [
        ("vil_tiny", 1.43, 6.7),
        ("vil_small", 5.12, 24.6),
        ("vil_medium_deep", 9.1, 39.7),
        ("vil_base_deep", None, 55.7),
    ],
)
def test_longformer_model_cards(name, pub_gmacs, pub_mparams):
    r = model_macs(ARCH_ZOO[name], 224, "longformerhand")
    assert abs(r["mparams"] - pub_mparams) < 0.1, r["mparams"]
    if pub_gmacs is not None:
        assert abs(r["gmacs"] - pub_gmacs) / pub_gmacs < 0.05, r["gmacs"]


def test_full_attention_ablation_card():
    r = model_macs(ARCH_ZOO["vil_small"], 224, "full")
    assert abs(r["gmacs"] - 6.95) / 6.95 < 0.02


def test_macs_scale_with_resolution():
    a = model_macs(ARCH_ZOO["vil_small"], 224)["macs"]
    b = model_macs(ARCH_ZOO["vil_small"], 448)["macs"]
    assert 3.5 < b / a < 4.6  # near-linear token scaling (local attention)


def test_per_stage_breakdown():
    r = model_macs(ARCH_ZOO["vil_small"], 224)
    assert len(r["per_stage"]) == 4
    assert r["per_stage"][0]["grid"] == (56, 56)
    assert sum(s["macs"] for s in r["per_stage"]) <= r["macs"]
