"""Attention dispatcher tests: correctness + flash-fallback observability."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uce_tpu.ops import attention as attn


def _qkv(rng, b=1, h=2, t=16, d=8):
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    return q, k, v


def test_xla_attention_matches_naive(rng):
    q, k, v = _qkv(rng)
    out = attn.dot_product_attention(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_causal_masking(rng):
    q, k, v = _qkv(rng, t=8)
    out = attn.dot_product_attention(q, k, v, causal=True)
    # first query position can only see key 0 -> output == v[..., 0, :]
    np.testing.assert_allclose(
        np.asarray(out[..., 0, :]), np.asarray(v[..., 0, :]), atol=1e-6)


def test_flash_fallback_logs_once(rng, monkeypatch, caplog):
    """A failing Pallas kernel must fall back to XLA AND log a warning
    (once per process), not silently degrade (VERDICT round-1 weak #5)."""
    q, k, v = _qkv(rng)

    def boom(*a, **kw):
        raise ValueError("synthetic Mosaic lowering failure")

    monkeypatch.setattr(attn, "_flash_attention", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(attn, "_fallback_warned", False)
    with caplog.at_level(logging.WARNING, logger=attn.logger.name):
        out = attn.dot_product_attention(q, k, v, impl="flash")
        out2 = attn.dot_product_attention(q, k, v, impl="flash")
    assert out.shape == q.shape and out2.shape == q.shape
    warnings = [r for r in caplog.records
                if "flash attention failed" in r.getMessage()]
    assert len(warnings) == 1, "fallback must log exactly once per process"
    ref = attn.dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_flash_blocks_derive_from_each_length():
    """block_q must follow Sq and block_k must follow Skv: deriving both
    from Skv broke every mixed-length flash shape (cross-attention kv=77
    gave bq=77, which does not divide Sq)."""
    blocks = attn._flash_block_sizes(4096, 77)
    assert blocks.block_q == 512 and blocks.block_k == 77
    blocks = attn._flash_block_sizes(256, 4096)
    assert blocks.block_q == 256 and blocks.block_k == 1024


def test_sdk_fallback_does_not_consume_flash_warning(monkeypatch, caplog):
    """An sdk-kernel failure must log its own once-per-process warning and
    leave the flash kernel's warning intact for a later flash regression."""
    monkeypatch.setattr(attn, "_fallback_warned", False)
    monkeypatch.setattr(attn, "_sdk_fallback_warned", False)
    with caplog.at_level(logging.WARNING, logger=attn.logger.name):
        attn._warn_flash_fallback(ValueError("sdk boom"), kernel="sdk")
        attn._warn_flash_fallback(ValueError("sdk boom"), kernel="sdk")
        attn._warn_flash_fallback(ValueError("flash boom"))
    msgs = [r.getMessage() for r in caplog.records]
    assert sum("sd attention kernel failed" in m for m in msgs) == 1
    assert sum("flash attention failed" in m for m in msgs) == 1


def test_explicit_impl_degrade_warns(rng, monkeypatch, caplog):
    """impl='flash'/'sdk' silently routed to XLA by dispatch constraints
    (mask/causal/non-TPU backend) must log the fallback warning so a
    benchmark doesn't measure XLA believing it measured the kernel."""
    q, k, v = _qkv(rng)
    monkeypatch.setattr(attn, "_fallback_warned", False)
    monkeypatch.setattr(attn, "_sdk_fallback_warned", False)
    monkeypatch.setattr(attn, "_not_applicable_warned", False)
    with caplog.at_level(logging.WARNING, logger=attn.logger.name):
        out = attn.dot_product_attention(q, k, v, impl="flash", causal=True)
    assert out.shape == q.shape
    assert any("not applicable" in r.getMessage() for r in caplog.records)
    # the informational notice must NOT consume the kernel-FAILURE flags:
    # a later real kernel regression still gets its once-per-process warning
    assert attn._fallback_warned is False
    assert attn._sdk_fallback_warned is False
    # force_xla is a deliberate router decision — no warning
    caplog.clear()
    monkeypatch.setattr(attn, "_fallback_warned", False)
    with caplog.at_level(logging.WARNING, logger=attn.logger.name):
        attn.dot_product_attention(q, k, v, impl="flash", force_xla=True)
    assert not caplog.records


def test_flash_fallback_does_not_catch_unrelated(rng, monkeypatch):
    """TypeError (a programming bug) must propagate, not be swallowed."""
    q, k, v = _qkv(rng)

    def boom(*a, **kw):
        raise TypeError("bug")

    monkeypatch.setattr(attn, "_flash_attention", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(TypeError):
        attn.dot_product_attention(q, k, v, impl="flash")
