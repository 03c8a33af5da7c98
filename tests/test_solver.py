"""Solver unit tests: NumPy oracle parity + Eq.-7 identities.

The oracle transcribes the reference algorithm's semantics
(``trainscripts/uce_sd_erase.py:56-82``): per-concept rank-1 accumulation
into mat1/mat2 followed by ``mat1 @ inv(mat2)``, looped per layer.
"""

import numpy as np
import jax.numpy as jnp

from uce_tpu.ops.solver import (
    apply_edit_matrix,
    uce_edit_matrix,
    uce_solve_layer,
    uce_solve_stacked,
)


def oracle_solve(w_old, c_edit, v_guide, c_pres, v_pres, es, ps, lamb):
    """Loop-and-inverse transcription of Eq. 7 (reference semantics)."""
    out_dim, d = w_old.shape
    mat1 = lamb * w_old.astype(np.float64)
    mat2 = lamb * np.eye(d)
    for i in range(c_edit.shape[0]):
        c = c_edit[i][:, None].astype(np.float64)  # [d,1]
        v = v_guide[i][:, None].astype(np.float64)  # [out,1]
        mat1 += es * (v @ c.T)
        mat2 += es * (c @ c.T)
    for i in range(c_pres.shape[0]):
        c = c_pres[i][:, None].astype(np.float64)
        v = v_pres[i][:, None].astype(np.float64)
        mat1 += ps * (v @ c.T)
        mat2 += ps * (c @ c.T)
    return mat1 @ np.linalg.inv(mat2)


def _random_problem(rng, out_dim=24, d=16, k=3, p=4):
    w = rng.standard_normal((out_dim, d)).astype(np.float32)
    c_edit = rng.standard_normal((k, d)).astype(np.float32)
    c_guide = rng.standard_normal((k, d)).astype(np.float32)
    c_pres = rng.standard_normal((p, d)).astype(np.float32)
    return w, c_edit, c_guide, c_pres


def test_layer_matches_oracle(rng):
    w, c_edit, c_guide, c_pres = _random_problem(rng)
    v_guide = c_guide @ w.T
    v_pres = c_pres @ w.T
    expected = oracle_solve(w, c_edit, v_guide, c_pres, v_pres, 1.0, 1.0, 0.5)
    got = uce_solve_layer(w, c_edit, v_guide, c_pres, v_pres)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_layer_with_arbitrary_v_guide(rng):
    # v* need not come from W_old (debias supplies shifted targets).
    w, c_edit, _, c_pres = _random_problem(rng)
    v_guide = rng.standard_normal((c_edit.shape[0], w.shape[0])).astype(np.float32)
    v_pres = c_pres @ w.T
    expected = oracle_solve(w, c_edit, v_guide, c_pres, v_pres, 2.0, 0.3, 0.7)
    got = uce_solve_layer(
        w, c_edit, v_guide, c_pres, v_pres, erase_scale=2.0, preserve_scale=0.3, lamb=0.7
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)


def test_default_v_pres_is_w_c(rng):
    w, c_edit, c_guide, c_pres = _random_problem(rng)
    v_guide = c_guide @ w.T
    explicit = uce_solve_layer(w, c_edit, v_guide, c_pres, c_pres @ w.T)
    implicit = uce_solve_layer(w, c_edit, v_guide, c_pres)
    np.testing.assert_allclose(
        np.asarray(explicit), np.asarray(implicit), rtol=1e-5, atol=1e-5
    )


def test_stacked_matches_per_layer(rng):
    d, k, p, dims = 16, 3, 2, (24, 24, 24)
    c_edit = rng.standard_normal((k, d)).astype(np.float32)
    c_pres = rng.standard_normal((p, d)).astype(np.float32)
    ws = np.stack([rng.standard_normal((dims[0], d)).astype(np.float32) for _ in dims])
    v_guide = np.stack(
        [rng.standard_normal((k, dims[0])).astype(np.float32) for _ in dims]
    )
    stacked = uce_solve_stacked(ws, c_edit, v_guide, c_pres)
    for i in range(len(dims)):
        single = uce_solve_layer(ws[i], c_edit, v_guide[i], c_pres)
        np.testing.assert_allclose(
            np.asarray(stacked[i]), np.asarray(single), rtol=1e-5, atol=1e-5
        )


def test_no_edit_is_identity(rng):
    # Zero edit concepts, zero preserve: W_new = lam*W @ (lam*I)^-1 = W.
    w = rng.standard_normal((24, 16)).astype(np.float32)
    got = uce_solve_layer(
        w, np.zeros((0, 16), np.float32), np.zeros((0, 24), np.float32), lamb=0.37
    )
    np.testing.assert_allclose(np.asarray(got), w, rtol=1e-5, atol=1e-5)


def test_huge_scale_drives_output_to_guide(rng):
    # With enormous erase scale, W_new @ c_edit -> v_guide.
    w, c_edit, c_guide, _ = _random_problem(rng, k=1, p=0)
    v_guide = c_guide @ w.T
    got = np.asarray(
        uce_solve_layer(w, c_edit, v_guide, erase_scale=1e6, lamb=0.5)
    )
    out = got @ c_edit[0]
    np.testing.assert_allclose(out, v_guide[0], rtol=1e-2, atol=1e-2)


def test_preserve_keeps_outputs(rng):
    w, c_edit, c_guide, c_pres = _random_problem(rng, p=2)
    v_guide = c_guide @ w.T
    got = np.asarray(
        uce_solve_layer(w, c_edit, v_guide, c_pres, preserve_scale=1e6, lamb=0.5)
    )
    for i in range(c_pres.shape[0]):
        np.testing.assert_allclose(got @ c_pres[i], w @ c_pres[i], rtol=1e-2, atol=1e-2)


def test_edit_matrix_collapse_matches_general(rng):
    # When v* = W @ g, the collapsed path must equal the general solve for
    # every layer, including layers with different output dims.
    d, k, p = 16, 3, 2
    c_edit = rng.standard_normal((k, d)).astype(np.float32)
    c_guide = rng.standard_normal((k, d)).astype(np.float32)
    c_pres = rng.standard_normal((p, d)).astype(np.float32)
    e_mat = uce_edit_matrix(c_edit, c_guide, c_pres, 1.3, 0.8, 0.5)
    for out_dim in (8, 24, 40):
        w = rng.standard_normal((out_dim, d)).astype(np.float32)
        v_guide = c_guide @ w.T
        general = uce_solve_layer(
            w, c_edit, v_guide, c_pres, erase_scale=1.3, preserve_scale=0.8, lamb=0.5
        )
        collapsed = apply_edit_matrix(w, e_mat)
        np.testing.assert_allclose(
            np.asarray(collapsed), np.asarray(general), rtol=2e-4, atol=2e-4
        )


def test_apply_edit_matrix_pytree(rng):
    d = 16
    e_mat = jnp.eye(d) * 2.0
    tree = {
        "hit": rng.standard_normal((8, d)).astype(np.float32),
        "miss": rng.standard_normal((8, d + 1)).astype(np.float32),
        "stack": rng.standard_normal((3, 8, d)).astype(np.float32),
    }
    out = apply_edit_matrix(tree, e_mat)
    np.testing.assert_allclose(np.asarray(out["hit"]), tree["hit"] * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["miss"]), tree["miss"])
    np.testing.assert_allclose(np.asarray(out["stack"]), tree["stack"] * 2.0, rtol=1e-6)


def test_per_concept_scales(rng):
    w, c_edit, c_guide, c_pres = _random_problem(rng, k=2, p=0)
    v_guide = c_guide @ w.T
    scales = np.array([0.5, 2.0], np.float32)
    got = uce_solve_layer(w, c_edit, v_guide, erase_scale=scales)
    # Oracle: accumulate with per-concept scale.
    mat1 = 0.5 * w.astype(np.float64)
    mat2 = 0.5 * np.eye(16)
    for i in range(2):
        c = c_edit[i][:, None].astype(np.float64)
        v = v_guide[i][:, None].astype(np.float64)
        mat1 += scales[i] * (v @ c.T)
        mat2 += scales[i] * (c @ c.T)
    expected = mat1 @ np.linalg.inv(mat2)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-4)
