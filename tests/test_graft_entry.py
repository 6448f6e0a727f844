"""Driver-contract tests: entry() compiles single-(virtual-)chip, and the
multichip dry run executes one sharded training step."""

import os

import numpy as np
import pytest

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, (params, wav) = g.entry()
    out = jax.jit(fn)(params, wav)
    assert out.shape == (wav.shape[0], 527)
    probs = np.asarray(out, np.float32)
    assert np.isfinite(probs).all() and (probs >= 0).all() and (probs <= 1).all()


def test_dryrun_multichip_smoke_2dev():
    """Default-suite coverage of the driver-contract code path itself
    (a refactor that breaks dryrun_multichip must fail pytest, not the
    driver): the real function at n_devices=2 (~2-3 min; the serving
    check is the same 2-device submesh the full run uses)."""
    import __graft_entry__ as g

    g.dryrun_multichip(2)  # raises on failure


@pytest.mark.skipif(
    not os.environ.get("RUN_DRYRUN_TEST"),
    reason="the driver runs the real dryrun_multichip(8) itself every round "
    "(MULTICHIP artifact); at flagship dims it takes several minutes on the "
    "virtual CPU mesh, so the suite covers the code path via the 2-device "
    "smoke above - set RUN_DRYRUN_TEST=1 to run the full-width version",
)
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure
