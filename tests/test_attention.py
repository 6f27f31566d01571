"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ufm_tpu.ops.attention import _xla_attention
from ufm_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("b,s,h,d", [(2, 130, 3, 32), (1, 256, 2, 64), (1, 100, 1, 64)])
def test_flash_matches_xla(b, s, h, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)

    scale = d**-0.5
    ref = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale=scale, block_q=128, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_flash_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 140, 2, 32), dtype=jnp.bfloat16)
    ref = _xla_attention(q, q, q, 32**-0.5).astype(jnp.float32)
    got = flash_attention(q, q, q, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_flash_attention_gradients_match_xla():
    """Training path: the custom VJP must equal the XLA attention gradient."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, s, h, d = 1, 72, 2, 16
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    cot = jax.random.normal(kg, (b, s, h, d), dtype=jnp.float32)

    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=2e-4, atol=2e-4, err_msg=name)


def test_vmem_guard_fallback():
    """An oversized key sequence must take the XLA fallback (never the
    single-pass kernel whose K/V slice would exceed VMEM) and stay exact."""
    from ufm_tpu.ops import flash_attention as fa

    assert fa.fits_vmem_single_pass(2_560, 64, 128, 2)  # model shapes: fine
    assert not fa.fits_vmem_single_pass(40_000, 128, 128, 4)  # would spill

    # tiny dims but a budget forced down so the guard must trip
    orig = fa._VMEM_BUDGET_BYTES
    fa._VMEM_BUDGET_BYTES = 1 << 12
    try:
        q = jnp.asarray(np.random.default_rng(0).standard_normal((1, 96, 2, 32)), jnp.float32)
        out = flash_attention(q, q, q)  # would be the pallas path normally
        ref = _xla_attention(q, q, q, 32**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    finally:
        fa._VMEM_BUDGET_BYTES = orig
