"""Install-gate decision logic for shipped SVoRT checkpoints.

``gate_and_install`` must (a) refuse weights that miss the >20% held-out
bar, (b) never replace a better incumbent with a worse-but-passing
candidate (continuation runs restart the optimizer and can regress), and
(c) persist gate metadata so later sessions compare without re-evaluating.
The held-out eval itself is exercised by tests/test_svort_pretrained.py on
the real installed checkpoints; here it is stubbed so the decision paths
run in milliseconds.
"""

import json
import os

import numpy as np
import pytest

import nesvor_tpu
from nesvor_tpu.svort import train as svt


def _res(rot, trans, rot0=1000.0, trans0=20.0):
    return {
        "rot_init_mrad": rot0,
        "trans_init_mm": trans0,
        "rot_mrad": rot,
        "trans_mm": trans,
        "improved": bool(rot < 0.8 * rot0 and trans < 0.8 * trans0),
    }


@pytest.fixture()
def gate_env(tmp_path, monkeypatch):
    """Redirect the checkpoint dir to tmp and stub the held-out eval."""
    monkeypatch.setattr(nesvor_tpu, "__checkpoint_dir", str(tmp_path))
    state = {"candidate": None, "incumbent_evals": 0, "deploy": None}

    def fake_gate(params, version="v1", vs=48, model=None, n_examples=3,
                  seed_base=777_000):
        if vs == 128:  # the deployment-geometry leg
            return state["deploy"] or state["candidate"]
        if params.get("who") == "incumbent":
            state["incumbent_evals"] += 1
            return _res(300.0, 7.0)
        return state["candidate"]

    monkeypatch.setattr(svt, "held_out_gate", fake_gate)
    return tmp_path, state


def test_gate_score_orders_results():
    better = _res(200.0, 5.0)
    worse = _res(400.0, 10.0)
    assert svt.gate_score(better) < svt.gate_score(worse)
    # scale-free: equal ratios on different inits give equal scores
    assert svt.gate_score(_res(100.0, 2.0, 1000.0, 20.0)) == pytest.approx(
        svt.gate_score(_res(200.0, 4.0, 2000.0, 40.0))
    )


def test_failing_candidate_saved_ungated(gate_env):
    tmp, state = gate_env
    state["candidate"] = _res(900.0, 18.0)  # misses the 20% bar
    res = svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".ungated.npz")
    assert not os.path.exists(tmp / "SVoRT_v1.npz")


def test_first_install_writes_checkpoint_and_metadata(gate_env):
    tmp, state = gate_env
    state["candidate"] = _res(250.0, 6.0)
    res = svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    assert res["path"] == str(tmp / "SVoRT_v1.npz")
    assert os.path.exists(res["path"])
    with open(res["path"] + ".gate.json") as f:
        meta = json.load(f)
    assert meta["version"] == "v1" and meta["vs"] == 48
    assert meta["result"]["rot_mrad"] == 250.0


def test_worse_candidate_does_not_clobber_incumbent(gate_env):
    tmp, state = gate_env
    # incumbent installed with metadata (score: sqrt(.25*.25) = 0.25)
    state["candidate"] = _res(250.0, 5.0)
    svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    live = np.load(tmp / "SVoRT_v1.npz")["w"].copy()
    # passing-but-worse candidate (score sqrt(.5*.5) = 0.5) must not install
    state["candidate"] = _res(500.0, 10.0)
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".candidate.npz")
    assert np.array_equal(np.load(tmp / "SVoRT_v1.npz")["w"], live)
    assert state["incumbent_evals"] == 0  # metadata spared the re-eval
    # metadata still describes the incumbent
    with open(tmp / "SVoRT_v1.npz.gate.json") as f:
        assert json.load(f)["result"]["rot_mrad"] == 250.0


def test_better_candidate_replaces_incumbent(gate_env):
    tmp, state = gate_env
    state["candidate"] = _res(250.0, 5.0)
    svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    state["candidate"] = _res(120.0, 3.0)
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"] == str(tmp / "SVoRT_v1.npz")
    assert np.load(res["path"])["w"].sum() == 2
    with open(res["path"] + ".gate.json") as f:
        assert json.load(f)["result"]["rot_mrad"] == 120.0


def test_within_noise_band_does_not_install(gate_env):
    """A candidate nominally better than the incumbent but by less than the
    gate's measured noise band must NOT install (VERDICT r05 item 4a: a
    keep-if-better rule on a noisy metric ratchets downward by selection)."""
    tmp, state = gate_env
    state["candidate"] = _res(250.0, 5.0)  # score 0.25
    svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    meta = tmp / "SVoRT_v1.npz.gate.json"
    with open(meta) as f:
        rec = json.load(f)
    rec["noise_band"] = {"score_band": 0.05, "n_draws": 5}
    with open(meta, "w") as f:
        json.dump(rec, f)

    state["candidate"] = _res(220.0, 4.4)  # score 0.22: better, within band
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".candidate.npz")

    state["candidate"] = _res(150.0, 3.0)  # score 0.15: beats band
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"] == str(tmp / "SVoRT_v1.npz")
    # the band is carried forward into the new install's record
    with open(meta) as f:
        assert json.load(f)["noise_band"]["score_band"] == 0.05


def test_gauge_score_is_primary_when_available(gate_env):
    """When both sides carry gauge-removed errors, the install decision
    compares gauge scores (VERDICT r05 item 4c) — a candidate that wins on
    the raw score but loses on the gauge-removed one must not install."""
    tmp, state = gate_env
    inc = _res(250.0, 5.0)
    inc.update({"rot_gauge_mrad": 100.0, "trans_gauge_mm": 2.0})  # g 0.1
    state["candidate"] = inc
    svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)

    cand = _res(200.0, 4.0)  # raw 0.2 beats incumbent's raw 0.25...
    cand.update({"rot_gauge_mrad": 150.0, "trans_gauge_mm": 3.0})  # g 0.15
    state["candidate"] = cand
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".candidate.npz")  # ...but loses on gauge


def test_deploy_leg_blocks_install(gate_env):
    """A candidate that wins at gate geometry but does not improve at the
    deployment geometry (vs=128) must not install (VERDICT r05 item 4b)."""
    tmp, state = gate_env
    state["candidate"] = _res(250.0, 5.0)
    svt.gate_and_install({"w": np.zeros(2, np.float32)}, "v1", 48)
    state["candidate"] = _res(120.0, 3.0)
    state["deploy"] = _res(900.0, 18.0)  # not improved at deploy scale
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".candidate.npz")
    # improved at deploy scale AND not worse than the incumbent's recorded
    # deploy score (0.25 from the first install) -> installs
    state["deploy"] = _res(200.0, 4.0)
    res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"] == str(tmp / "SVoRT_v1.npz")
    with open(res["path"] + ".gate.json") as f:
        assert json.load(f)["deploy"]["rot_mrad"] == 200.0


def test_missing_metadata_falls_back_to_live_incumbent_eval(gate_env):
    tmp, state = gate_env
    state["candidate"] = _res(250.0, 5.0)
    svt.gate_and_install({"who": np.float32(0), "w": np.zeros(2)}, "v1", 48)
    os.remove(tmp / "SVoRT_v1.npz.gate.json")

    # the incumbent re-eval loads the live npz; make the stub recognize it
    from nesvor_tpu.svort import convert

    def fake_load(path):
        return {"who": "incumbent"}

    state["candidate"] = _res(500.0, 10.0)  # worse than live eval (300, 7)
    import unittest.mock as mock

    with mock.patch.object(convert, "load_converted", fake_load):
        res = svt.gate_and_install({"w": np.ones(2, np.float32)}, "v1", 48)
    assert res["path"].endswith(".candidate.npz")
    assert state["incumbent_evals"] == 1
