"""SVoRT checkpoint name-surface and converter tests.

The real Zenodo torch checkpoints are unreachable offline. Instead of
fabricating a state_dict from the JAX model's own names (circular — could
never catch a naming divergence), these tests build INDEPENDENT torch
replicas of the full reference architectures (tests/torch_ref.py, from
/root/reference/nesvor/svort/models.py:19-210 + attention.py:235-254) and
assert the JAX ``init`` param dict matches the torch ``state_dict`` name-
for-name and shape-for-shape, then round-trip a real torch save file
through ``convert_torch_checkpoint``.
"""

import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn as nn

from torch_ref import (
    TorchPositionalEncoding,
    TorchResNet,
    TorchSVRtransformer,
    TorchSVRtransformerV2,
    TorchTransformerEncoder,
)


class TorchSRRtransformerNames(nn.Module):
    """Param surface of the reference SRRtransformer (models.py:216-243);
    its SRR submodule holds no parameters."""

    def __init__(self, n_res=34, n_layers=4, n_head=4, d_in=8, d_out=1,
                 d_model=256, d_inner=512):
        super().__init__()
        self.img_encoder = TorchResNet(n_res, d_model, 2)
        self.pos_emb = TorchPositionalEncoding(d_model, d_in)
        self.encoder = TorchTransformerEncoder(
            n_layers, n_head, d_model // n_head, d_model // n_head,
            d_model, d_inner,
        )
        self.fc = nn.Linear(d_model, d_out)


class TorchSVoRTNames(nn.Module):
    """Param surface of reference SVoRT v1 (models.py:19-56)."""

    def __init__(self, n_iter=3):
        super().__init__()
        self.svrnet = nn.ModuleList(
            TorchSVRtransformer(
                n_res=50, n_layers=4, n_head=8, d_in=11, d_out=9,
                d_model=512, d_inner=1024, res_d_in=4 if i > 0 else 3,
            )
            for i in range(n_iter)
        )
        self.srrnet = TorchSRRtransformerNames()


class TorchSVoRTv2Names(nn.Module):
    """Param surface of reference SVoRTv2 (models.py:121-154)."""

    def __init__(self):
        super().__init__()
        self.svrnet1 = TorchSVRtransformerV2(
            n_res=50, n_layers=4, n_head=8, d_in=11, d_out=9,
            d_model=512, d_inner=1024, n_channels=1,
        )
        self.svrnet2 = TorchSVRtransformerV2(
            n_res=50, n_layers=8, n_head=8, d_in=11, d_out=9,
            d_model=512, d_inner=1024, n_channels=2,
        )


def _assert_name_shape_match(jax_params, torch_module):
    sd = torch_module.state_dict()
    jax_names = set(jax_params)
    torch_names = set(sd)
    assert jax_names == torch_names, (
        f"missing from JAX: {sorted(torch_names - jax_names)[:10]}; "
        f"extra in JAX: {sorted(jax_names - torch_names)[:10]}"
    )
    for k in sd:
        assert tuple(jax_params[k].shape) == tuple(sd[k].shape), (
            k, jax_params[k].shape, sd[k].shape
        )


@pytest.mark.slow
def test_svort_v1_name_surface():
    from nesvor_tpu.svort.models import SVoRT

    params = SVoRT(n_iter=3).init(jax.random.PRNGKey(0))
    _assert_name_shape_match(params, TorchSVoRTNames(n_iter=3))


@pytest.mark.slow
def test_svort_v2_name_surface():
    from nesvor_tpu.svort.models import SVoRTv2

    params = SVoRTv2().init(jax.random.PRNGKey(0))
    _assert_name_shape_match(params, TorchSVoRTv2Names())


def test_convert_roundtrip(tmp_path, monkeypatch):
    """convert_torch_checkpoint consumes a REAL torch save file whose names
    come from the torch replica, and reproduces every tensor bit-exactly."""
    import nesvor_tpu.svort.convert as convert

    tm = TorchSVRtransformer(n_res=34, n_layers=1, n_head=2, d_in=11, d_out=9,
                             d_model=32, d_inner=64, res_d_in=3)
    state = {f"svrnet.0.{k}": v for k, v in tm.state_dict().items()}
    pt_path = str(tmp_path / "SVoRT_test.pt")
    torch.save({"model": state}, pt_path)

    monkeypatch.setattr(convert, "__checkpoint_dir", str(tmp_path), raising=False)
    out = convert.convert_torch_checkpoint(pt_path, "v_test")
    assert set(out.keys()) == set(state.keys())
    for k in state:
        np.testing.assert_array_equal(np.asarray(out[k]), state[k].numpy())

    npz = os.path.join(str(tmp_path), "SVoRT_v_test.npz")
    if os.path.exists(npz):
        loaded = convert.load_converted(npz)
        for k in state:
            np.testing.assert_array_equal(np.asarray(loaded[k]), state[k].numpy())
