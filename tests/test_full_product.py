"""Smoke test for the full product workflow example (VERDICT r4 next #6):
explore -> batched solve -> Morris screening -> DRGEP reduction in one
run (examples/full_product.py), scaled down for the CPU test tier.
"""
import os
import shutil
import sys

import numpy as np
import pytest


@pytest.mark.skipif(shutil.which("g++") is None,
                    reason="native sampler needs g++")
def test_full_product_workflow_runs():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples"))
    import full_product

    # tiny scale: the 2-level CRN is a handful of reactions whose
    # target graph plateaus — a loose reduction tolerance keeps the
    # smoke test about WIRING (explore -> solve -> screen -> reduce),
    # not reduction quality (tests/test_reduction.py covers that)
    sd, rd, mres, red = full_product.main(n_sweep=3, max_levels=2,
                                          quiet=True, reduce_tol=0.5)
    # the exploration grew a real mechanism
    assert sd.n >= 4 and rd.nr >= 4
    # Morris produced finite statistics over every screened channel
    assert mres.mu_star.shape == (rd.nr,)
    assert np.all(np.isfinite(mres.mu_star))
    # the reduction kept a validated sub-mechanism within tolerance
    assert 0 < len(red.reduction.keep_rids) <= rd.nr
    assert red.error <= 0.5
