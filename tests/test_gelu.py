"""Fast exact-GELU: exhaustive bitwise equality with jax.nn.gelu on bf16.

The backbone's activation (reference: torch nn.GELU default/exact form inside
the DINOv2-class encoder, /root/reference/uniflowmatch/models/ufm.py:187)
is evaluated in production by ufm_tpu/ops/gelu.py's polynomial erfc. Its
correctness claim is not a tolerance — it is bitwise equality with
``jax.nn.gelu(approximate=False)`` for EVERY finite bf16 input, which this
test checks exhaustively (65280 values). The same check has been run on the
real TPU backend (0 mismatches; BENCH_NOTES.md round 3): on both backends the
swap is the identity on the production compute path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ufm_tpu.ops.gelu import fast_erfc_f32, fast_exact_gelu


def _all_finite_bf16():
    bits = jnp.asarray(np.arange(65536, dtype=np.uint16))
    x = lax.bitcast_convert_type(bits, jnp.bfloat16)
    finite = jnp.isfinite(x)
    return jnp.where(finite, x, 0), np.asarray(finite)


def test_gelu_bitwise_equal_exhaustive_bf16():
    xf, finite = _all_finite_bf16()
    a = lax.bitcast_convert_type(fast_exact_gelu(xf), jnp.uint16)
    b = lax.bitcast_convert_type(jax.nn.gelu(xf, approximate=False), jnp.uint16)
    neq = np.asarray(a != b) & finite
    assert neq.sum() == 0, f"{int(neq.sum())} bf16 inputs disagree with jax.nn.gelu"


def test_erfc_bitwise_equal_exhaustive_bf16():
    xf, finite = _all_finite_bf16()
    mine = fast_erfc_f32(xf.astype(jnp.float32)).astype(jnp.bfloat16)
    a = lax.bitcast_convert_type(mine, jnp.uint16)
    b = lax.bitcast_convert_type(lax.erfc(xf), jnp.uint16)
    neq = np.asarray(a != b) & finite
    assert neq.sum() == 0, f"{int(neq.sum())} bf16 inputs disagree with lax.erfc"


def test_non_bf16_falls_back_to_jax_gelu():
    x = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fast_exact_gelu(x)), np.asarray(jax.nn.gelu(x, approximate=False))
    )


def test_gradient_close_to_reference():
    # The VJP differentiates the fp32 polynomial chain rather than erfc's
    # analytic rule; both approximate the true gelu' — require fp32-level
    # agreement on a dense grid through the active range.
    x = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    g_fast = jax.vmap(jax.grad(lambda v: fast_exact_gelu(v.astype(jnp.bfloat16)).astype(jnp.float32)))(x)
    g_ref = jax.vmap(jax.grad(lambda v: jax.nn.gelu(v, approximate=False)))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=2e-2)


def test_gradient_finite_for_every_finite_bf16_input():
    """Regression for the round-3 review finding: the unselected polynomial
    branch used to overflow to inf for |x| >= 932 and the where-VJP's 0*inf
    turned the gradient to NaN — a single such pre-GELU activation would NaN
    an entire training step. The gradient must be finite (and equal to the
    0/1 saturation of gelu') over ALL finite bf16 inputs, exhaustively."""
    xf, finite = _all_finite_bf16()
    x32 = xf.astype(jnp.float32)
    g = jax.vmap(jax.grad(lambda v: fast_exact_gelu(v.astype(jnp.bfloat16)).astype(jnp.float32)))(x32)
    g = np.asarray(g)
    assert np.isfinite(g[finite]).all(), f"{int((~np.isfinite(g) & finite).sum())} non-finite grads"
    big = np.asarray(x32) >= 932
    np.testing.assert_allclose(g[big & finite], 1.0, atol=1e-6)
    small = np.asarray(x32) <= -932
    np.testing.assert_allclose(g[small & finite], 0.0, atol=1e-6)


@pytest.mark.parametrize("shape", [(3, 7), (2, 5, 9)])
def test_shapes_preserved(shape):
    x = jnp.ones(shape, jnp.bfloat16)
    assert fast_exact_gelu(x).shape == shape
    assert fast_exact_gelu(x).dtype == jnp.bfloat16
