"""Pallas fused edit-matrix kernel vs the XLA Cholesky path.

Runs in interpret mode on the CPU test mesh; the compiled path is exercised
by bench.py on real TPU hardware.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from uce_tpu.ops.pallas.uce_solve import uce_edit_matrix_pallas
from uce_tpu.ops.solver import uce_edit_matrix


@pytest.mark.parametrize("k,p,d", [(4, 3, 256), (16, 0, 256)])
def test_matches_cholesky_path(rng, k, p, d):
    c_edit = rng.standard_normal((k, d)).astype(np.float32)
    c_guide = rng.standard_normal((k, d)).astype(np.float32)
    c_pres = rng.standard_normal((p, d)).astype(np.float32)
    expected = np.asarray(uce_edit_matrix(c_edit, c_guide, c_pres, 1.3, 0.7, 0.5))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(uce_edit_matrix_pallas(
            jnp.asarray(c_edit), jnp.asarray(c_guide), jnp.asarray(c_pres),
            1.3, 0.7, 0.5))
    scale = np.abs(expected).max()
    assert np.abs(got - expected).max() / scale < 5e-3


def test_rejects_oversize():
    z = jnp.zeros((1, 2048), jnp.float32)
    with pytest.raises(ValueError, match="supports d"):
        uce_edit_matrix_pallas(z, z, z, 1.0, 1.0, 0.5)
