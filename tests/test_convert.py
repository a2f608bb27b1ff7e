"""SVoRT checkpoint-converter round-trip test.

The real Zenodo torch checkpoints are unreachable offline, so this
fabricates a torch state_dict with exactly the flat names/shapes our SVoRT
uses (they mirror the reference's torch module names), saves it with
torch.save, and verifies ``convert_torch_checkpoint`` reproduces every
tensor bit-exactly."""

import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_convert_roundtrip(tmp_path, monkeypatch):
    from nesvor_tpu.svort.models import SVoRTv2

    model = SVoRTv2(n_iter=2)
    params = model.init(jax.random.PRNGKey(0))

    state = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
    pt_path = str(tmp_path / "SVoRT_v2.pt")
    torch.save({"model": state}, pt_path)

    import nesvor_tpu
    import nesvor_tpu.svort.convert as convert

    monkeypatch.setattr(nesvor_tpu, "_checkpoint_dir_test", None, raising=False)
    # redirect the cache dir into tmp
    monkeypatch.setattr(convert, "__checkpoint_dir", str(tmp_path), raising=False)

    out = convert.convert_torch_checkpoint(pt_path, "v2_test")
    assert set(out.keys()) == set(params.keys())
    for k in params:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(params[k]))

    npz = os.path.join(str(tmp_path), "SVoRT_v2_test.npz")
    if os.path.exists(npz):
        loaded = convert.load_converted(npz)
        for k in params:
            np.testing.assert_array_equal(
                np.asarray(loaded[k]), np.asarray(params[k])
            )
