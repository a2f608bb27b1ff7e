"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    v = jax.jit(fn)(*args)
    assert np.isfinite(float(v))
