"""Closed-form UCE solver, batched over layers and concepts.

Implements Eq. 7 of arXiv:2308.14761 (the algorithm of the reference
``trainscripts/uce_sd_erase.py:56-82``):

    W_new = (lam * W_old + sum_i s_i * v_i* c_i^T  + sum_p p_p * v_p c_p^T)
            @ (lam * I  + sum_i s_i * c_i c_i^T   + sum_p p_p * c_p c_p^T)^-1

where c_i are edit-concept embeddings, v_i* guide outputs, c_p/v_p preserve
pairs. The reference builds these with per-concept rank-1 updates inside a
Python loop over layers; here everything is batched:

  * the Gram matrices are single matmuls over concept stacks (MXU-friendly),
  * the inverse is replaced by one Cholesky factorization of the shared
    right-hand Gram matrix (SPD for lam > 0, scales >= 0) reused by every
    layer,
  * when guide outputs come from the original weights (v* = W_old @ c_guide,
    true for every reference script), the whole edit collapses to a single
    d x d *edit matrix* E with W_new[l] = W_old[l] @ E for every layer — one
    stacked matmul edits the entire model.

All solves run in float32 regardless of input dtype, mirroring the
reference's forced-fp32 inverse (``uce_sd_erase.py:82``); results are cast
back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _as_scale_vector(scale, n: int) -> jnp.ndarray:
    """Broadcast a scalar or per-concept scale to shape [n] float32."""
    s = jnp.asarray(scale, dtype=jnp.float32)
    if s.ndim == 0:
        s = jnp.full((n,), s, dtype=jnp.float32)
    if s.shape != (n,):
        raise ValueError(f"scale must be scalar or shape ({n},), got {s.shape}")
    return s


def _empty_rows(d: int) -> jnp.ndarray:
    return jnp.zeros((0, d), dtype=jnp.float32)


# The reference forces the solve into fp32 (uce_sd_erase.py:82); on TPU the
# equivalent is fp32 accumulation at HIGHEST precision (otherwise XLA lowers
# fp32 matmuls to bf16 passes and the "match to numerical tolerance" gate
# fails).
_HIGHEST = jax.lax.Precision.HIGHEST


def _weighted_cross_gram(a: jnp.ndarray, b: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """sum_i s_i * a_i b_i^T  for stacks a [K, da], b [K, db] -> [da, db]."""
    return jnp.einsum(
        "k,kd,ke->de", s, a, b,
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _solve_right(mat2: jnp.ndarray, mat1: jnp.ndarray, *, assume_spd: bool) -> jnp.ndarray:
    """Compute mat1 @ inv(mat2) without forming the inverse.

    mat2 is [d, d]; mat1 is [..., out, d]. For symmetric mat2 this equals
    solve(mat2, mat1^T)^T; with assume_spd we use a Cholesky factorization,
    otherwise a general LU solve (still exploiting symmetry of mat2).
    """
    d = mat2.shape[0]
    # Flatten all batch/output dims of mat1 into RHS columns so one
    # factorization serves every layer: solve(mat2, mat1_flat^T).
    rhs = mat1.reshape(-1, d).T  # [d, N]
    if assume_spd:
        # Cholesky is both faster and (measured) more accurate than the
        # reference's fp32 LU inverse at realistic scales; at extreme
        # conditioning (erase_scale ~1e6, cond > 1/eps_f32) the factor can
        # go non-finite, so fall back to an LU solve in that case.
        factor, lower = jax.scipy.linalg.cho_factor(mat2)
        ok = jnp.isfinite(factor).all()
        x = jax.lax.cond(
            ok,
            lambda: jax.scipy.linalg.cho_solve(
                (jnp.where(jnp.isfinite(factor), factor, 1.0), lower), rhs
            ),
            lambda: jnp.linalg.solve(mat2, rhs),
        )
    else:
        x = jnp.linalg.solve(mat2, rhs)
    return x.T.reshape(mat1.shape)


def uce_gram_matrices(
    c_edit: jnp.ndarray,
    c_pres: jnp.ndarray | None,
    erase_scale,
    preserve_scale,
    lamb,
    *,
    c_guide: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Build the shared right-hand Gram matrix (and optionally the left one).

    Returns (mat2, matA) where
      mat2 = lam*I + sum_i s_i c_i c_i^T + sum_p p_p c_p c_p^T       [d, d]
      matA = lam*I + sum_i s_i g_i c_i^T + sum_p p_p c_p c_p^T       [d, d]
    matA is only built when ``c_guide`` (stack of g_i) is given; it is the
    collapsed left-hand factor such that mat1 = W_old @ matA.
    """
    c_edit = jnp.asarray(c_edit, jnp.float32)
    k, d = c_edit.shape
    if c_pres is None:
        c_pres = _empty_rows(d)
    c_pres = jnp.asarray(c_pres, jnp.float32)
    p = c_pres.shape[0]

    s_e = _as_scale_vector(erase_scale, k)
    s_p = _as_scale_vector(preserve_scale, p)
    lam = jnp.asarray(lamb, jnp.float32)

    eye = lam * jnp.eye(d, dtype=jnp.float32)
    pres_gram = _weighted_cross_gram(c_pres, c_pres, s_p)
    mat2 = eye + _weighted_cross_gram(c_edit, c_edit, s_e) + pres_gram

    mat_a = None
    if c_guide is not None:
        c_guide = jnp.asarray(c_guide, jnp.float32)
        if c_guide.shape != c_edit.shape:
            raise ValueError(
                f"c_guide shape {c_guide.shape} must match c_edit {c_edit.shape}"
            )
        mat_a = eye + _weighted_cross_gram(c_guide, c_edit, s_e) + pres_gram
    return mat2, mat_a


@functools.partial(jax.jit, static_argnames=("assume_spd",))
def uce_edit_matrix(
    c_edit: jnp.ndarray,
    c_guide: jnp.ndarray,
    c_pres: jnp.ndarray | None = None,
    erase_scale=1.0,
    preserve_scale=1.0,
    lamb=0.5,
    *,
    assume_spd: bool = True,
) -> jnp.ndarray:
    """Collapsed UCE edit: returns E [d, d] with W_new = W_old @ E.

    Valid whenever guide outputs are produced by the layer being edited
    (v_i* = W_old @ g_i), which holds for every reference script: erase
    (guide concept embeddings, ``uce_sd_erase.py:44-53``), debias
    (accumulated attribute directions, ``uce_sd_debias.py:122-127``), FLUX
    and HiDream text-entry projections. Then

        mat1 = W (lam I + sum s_i g_i c_i^T + sum p c_p c_p^T) = W @ A
        W_new = W @ A @ mat2^{-1} = W @ E,  E = A @ mat2^{-1}

    E is layer-independent: one Cholesky solve edits every layer.
    """
    mat2, mat_a = uce_gram_matrices(
        c_edit, c_pres, erase_scale, preserve_scale, lamb, c_guide=c_guide
    )
    # E^T = solve(mat2, A^T) — mat2 symmetric (SPD for lam>0, scales>=0).
    return _solve_right(mat2, mat_a, assume_spd=assume_spd)


def apply_edit_matrix(w_old, edit_matrix: jnp.ndarray):
    """Apply W_new = W_old @ E to a weight, a stack, or a pytree of weights.

    Leaves whose trailing dimension does not match E are returned unchanged,
    so a whole model pytree can be passed with the edit hitting only the
    selected projections (callers normally pass just the stacked targets).
    Computation is fp32; outputs keep each leaf's dtype.
    """
    d = edit_matrix.shape[0]

    def _apply(w):
        w = jnp.asarray(w)
        if w.ndim < 2 or w.shape[-1] != d:
            return w
        out = jnp.matmul(
            w.astype(jnp.float32), edit_matrix,
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )
        return out.astype(w.dtype)

    return jax.tree_util.tree_map(_apply, w_old)


@functools.partial(jax.jit, static_argnames=("assume_spd",))
def uce_edit_matrix_batch(
    c_edit: jnp.ndarray,
    c_guide: jnp.ndarray,
    c_pres: jnp.ndarray | None = None,
    erase_scale=1.0,
    preserve_scale=1.0,
    lamb=0.5,
    *,
    assume_spd: bool = True,
) -> jnp.ndarray:
    """Per-module edit matrices for stacks of per-module embeddings.

    c_edit/c_guide: [M, K, d]; c_pres: [M, P, d] or None. Returns E [M, d, d]
    with W_new[m] = W_old[m] @ E[m]. Used by HiDream, where each
    caption_projection sees a different encoder layer's embeddings
    (``uce_hidream_edit.py:138-141``); the M solves batch into one
    vmapped Cholesky launch.
    """
    c_edit = jnp.asarray(c_edit, jnp.float32)
    if c_pres is None:
        c_pres = jnp.zeros((c_edit.shape[0], 0, c_edit.shape[-1]), jnp.float32)

    def one(ce, cg, cp):
        return uce_edit_matrix(
            ce, cg, cp, erase_scale, preserve_scale, lamb,
            assume_spd=assume_spd)

    return jax.vmap(one)(c_edit, jnp.asarray(c_guide, jnp.float32),
                         jnp.asarray(c_pres, jnp.float32))


@functools.partial(jax.jit, static_argnames=("assume_spd",))
def uce_solve_layer(
    w_old: jnp.ndarray,
    c_edit: jnp.ndarray,
    v_guide: jnp.ndarray,
    c_pres: jnp.ndarray | None = None,
    v_pres: jnp.ndarray | None = None,
    erase_scale=1.0,
    preserve_scale=1.0,
    lamb=0.5,
    *,
    assume_spd: bool = True,
) -> jnp.ndarray:
    """General Eq.-7 solve for one layer with explicit guide outputs.

    Args:
      w_old:   [out, d] original projection weight.
      c_edit:  [K, d] edit-concept embeddings.
      v_guide: [K, out] target outputs v_i* (need not equal W_old @ g).
      c_pres:  [P, d] preserve embeddings (or None).
      v_pres:  [P, out] preserve outputs (or None; defaults to W_old @ c_p,
               matching ``uce_sd_erase.py:74-79`` where preserve outputs are
               the original module outputs).
    Returns [out, d] edited weight in w_old's dtype.
    """
    w32 = jnp.asarray(w_old, jnp.float32)
    c_edit = jnp.asarray(c_edit, jnp.float32)
    v_guide = jnp.asarray(v_guide, jnp.float32)
    d = c_edit.shape[1]
    if c_pres is None:
        c_pres = _empty_rows(d)
    c_pres = jnp.asarray(c_pres, jnp.float32)
    if v_pres is None:
        v_pres = jnp.matmul(c_pres, w32.T, precision=_HIGHEST)
    v_pres = jnp.asarray(v_pres, jnp.float32)

    k, p = c_edit.shape[0], c_pres.shape[0]
    s_e = _as_scale_vector(erase_scale, k)
    s_p = _as_scale_vector(preserve_scale, p)
    lam = jnp.asarray(lamb, jnp.float32)

    mat1 = (
        lam * w32
        + _weighted_cross_gram(v_guide, c_edit, s_e)
        + _weighted_cross_gram(v_pres, c_pres, s_p)
    )
    mat2, _ = uce_gram_matrices(c_edit, c_pres, s_e, s_p, lam)
    out = _solve_right(mat2, mat1, assume_spd=assume_spd)
    return out.astype(w_old.dtype)


@functools.partial(jax.jit, static_argnames=("assume_spd",))
def uce_solve_stacked(
    w_stack: jnp.ndarray,
    c_edit: jnp.ndarray,
    v_guide: jnp.ndarray,
    c_pres: jnp.ndarray | None = None,
    v_pres: jnp.ndarray | None = None,
    erase_scale=1.0,
    preserve_scale=1.0,
    lamb=0.5,
    *,
    assume_spd: bool = True,
) -> jnp.ndarray:
    """Batched Eq.-7 solve over a stack of layers sharing the input dim.

    Args:
      w_stack: [L, out, d] stacked original weights.
      c_edit:  [K, d] edit embeddings (shared across layers).
      v_guide: [L, K, out] per-layer guide outputs.
      c_pres:  [P, d]; v_pres: [L, P, out] (None -> W_old @ c_p per layer).

    The right-hand Gram matrix is layer-independent, so it is built and
    Cholesky-factored exactly once; only the triangular solves are batched.
    This is the launch shape the reference runs as a 32-iteration Python
    loop (``uce_sd_erase.py:56-82``).
    """
    w32 = jnp.asarray(w_stack, jnp.float32)
    c_edit = jnp.asarray(c_edit, jnp.float32)
    v_guide = jnp.asarray(v_guide, jnp.float32)
    d = c_edit.shape[1]
    if c_pres is None:
        c_pres = _empty_rows(d)
    c_pres = jnp.asarray(c_pres, jnp.float32)
    if v_pres is None:
        v_pres = jnp.einsum("pd,lod->lpo", c_pres, w32, precision=_HIGHEST)
    v_pres = jnp.asarray(v_pres, jnp.float32)

    k, p = c_edit.shape[0], c_pres.shape[0]
    s_e = _as_scale_vector(erase_scale, k)
    s_p = _as_scale_vector(preserve_scale, p)
    lam = jnp.asarray(lamb, jnp.float32)

    mat1 = (
        lam * w32
        + jnp.einsum("k,lko,kd->lod", s_e, v_guide, c_edit,
                     preferred_element_type=jnp.float32, precision=_HIGHEST)
        + jnp.einsum("p,lpo,pd->lod", s_p, v_pres, c_pres,
                     preferred_element_type=jnp.float32, precision=_HIGHEST)
    )
    mat2, _ = uce_gram_matrices(c_edit, c_pres, s_e, s_p, lam)
    out = _solve_right(mat2, mat1, assume_spd=assume_spd)
    return out.astype(w_stack.dtype)
