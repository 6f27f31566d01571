"""Fast exact-GELU: a cheap erfc that is bitwise-equal to ``lax.erfc`` on bf16.

The backbone's activation is torch's default exact (erf) GELU
(reference encoder contract, /root/reference/uniflowmatch/models/ufm.py:187 —
the DINOv2-class ViT uses ``nn.GELU()``), which ``jax.nn.gelu(approximate=
False)`` computes as ``0.5 * x * erfc(-x * sqrt(0.5))``.  XLA's ``erfc``
expansion evaluates BOTH of its branches on every lane (an erf polynomial and
an ``exp``-based complementary branch plus selects and a divide), and
measurement attributes ~16-20 ms of the 131 ms/b4 flagship forward to it
(BENCH_NOTES.md round 3: the tanh-GELU opt-in reads the erf cost directly).

This module exploits the production dtype: the backbone computes in bf16, so
``erfc``'s *input is already bf16-rounded* and its *output is immediately
rounded back to bf16*.  A much cheaper evaluator whose fp32 result rounds to
the same bf16 as ``lax.erfc``'s for every one of the 65280 finite bf16 inputs
is therefore *the same function* on the production path — verified
exhaustively (tests/test_gelu.py), not approximately:

* main range ``t in (-2.046875, 2.046875]``: a degree-8 polynomial in t^2
  (erf(t) = t*P(t^2); max abs err 5.3e-7 vs half-ulp-at-boundary 7.6e-6);
* ``t <= -2.046875``: erfc rounds to exactly 2.0 in bf16;
* tail ``t > 2.046875``: ``exp2(-t^2*log2e) * (1/t) * Q(1/t)`` with Q a
  degree-5 polynomial fit of the scaled complement erfcx (rel err 4.2e-6 vs
  bf16 half-ulp 2e-3), down to the bf16 underflow of erfc at t >= 9.25.

Cost: one select chain + one exp2 + one divide + 13 fused multiply-adds, vs
XLA's dual-branch expansion; both erfc branches here are arithmetic on the
same vector registers so the select is free of control flow.

Non-bf16 inputs fall back to ``jax.nn.gelu`` unchanged (the fp32 prediction
heads use no GELU; the exhaustive-equality argument is bf16-specific).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, nn

__all__ = ["fast_erfc_f32", "fast_exact_gelu"]

# erf(t) ~= t * P(t^2) on |t| <= 2.08; Chebyshev LSQ fit of erf(t)/t in t^2,
# power basis, max |err| 5.3e-7 (fit: docs/design notes, round 3).
_MAIN = (
    1.1283790340269568,
    -0.37612158492502534,
    0.11280848820744023,
    -0.026795094373444406,
    0.00513593435833268,
    -0.0007917506866845558,
    9.279795205957126e-05,
    -7.212098793187407e-06,
    2.7061106485692593e-07,
)
# erfcx(t) = erfc(t)*exp(t^2) ~= (1/t) * Q(1/t) on t in [2.0, 9.45]; rel err
# 4.2e-6.  erfc underflows bf16 (to 0) at t >= 9.25, inside the fit range.
_TAIL = (
    0.5640888375906445,
    0.00260326249353484,
    -0.3077097789312337,
    0.11669566632991554,
    0.2176132143140603,
    -0.1875587612113739,
)
_LOG2E = 1.4426950408889634
# bf16 rounding boundary: erfc(t) rounds to exactly 2.0 for t <= -2.046875,
# and the main<->tail split reuses the same constant on the positive side
# (the main polynomial is accurate through |t| <= 2.08).
_SAT = 2.046875
# bf16(sqrt(0.5)) — jax.nn.gelu rounds the constant to the input dtype first.
_SQRT_HALF_BF16 = float(jnp.asarray(0.5, jnp.bfloat16) ** 0.5)


def fast_erfc_f32(tf: jnp.ndarray) -> jnp.ndarray:
    """fp32 erfc whose bf16 rounding equals ``lax.erfc``'s on every finite
    bf16 input (exhaustive test).  ``tf`` must be fp32."""
    # Clamp |tf| before squaring. Values are unaffected: the main branch is
    # only selected for |tf| <= 2.05, and past |tf| = 32 the tail's
    # exp2(-u*log2e) is 0 either way (fp32 exp2 underflows at u > ~104). What
    # the clamp buys is globally finite *gradients*: without it, bf16 inputs
    # reach |tf| ~ 2.4e38, the u**8 polynomial term overflows to inf in the
    # unselected branch, and the where-VJP's 0*inf turns the whole gradient
    # to NaN for every |x| >= 932 (round-3 review finding; a single such
    # pre-GELU activation would NaN a training step).
    ta = jnp.minimum(jnp.abs(tf), jnp.float32(32.0))
    u = ta * ta
    p = jnp.float32(_MAIN[-1])
    for c in _MAIN[-2::-1]:
        p = p * u + jnp.float32(c)
    main = 1.0 - tf * p

    # Double-where: keep the unselected tail branch finite at tf == 0 so its
    # Inf/NaN cannot leak into the gradient of the selected main branch.
    # 1/t via rsqrt(t^2): the tail only applies for t > 2, and rsqrt is a
    # hardware VPU primitive where fp32 divide is a multi-op sequence.
    u_safe = jnp.where(tf > _SAT, u, jnp.float32(1.0))
    inv = lax.rsqrt(u_safe)
    q = jnp.float32(_TAIL[-1])
    for c in _TAIL[-2::-1]:
        q = q * inv + jnp.float32(c)
    tail = jnp.exp2(-u * jnp.float32(_LOG2E)) * inv * q

    out = jnp.where(tf > _SAT, tail, main)
    return jnp.where(tf <= -_SAT, jnp.float32(2.0), out)


def fast_exact_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU, bitwise-equal to ``jax.nn.gelu(x, approximate=False)`` for
    bf16 inputs (the backbone compute dtype); falls back to ``jax.nn.gelu``
    for any other dtype.

    Replicates jax.nn.gelu's op-for-op bf16 rounding chain —
    ``bf16(bf16(0.5*x) * bf16(erfc(bf16(-x * bf16(sqrt(0.5))))))`` — with the
    erfc evaluated by :func:`fast_erfc_f32`.
    """
    if x.dtype != jnp.bfloat16:
        return nn.gelu(x, approximate=False)
    t = (-x * jnp.asarray(_SQRT_HALF_BF16, jnp.bfloat16)).astype(jnp.float32)
    e = fast_erfc_f32(t).astype(jnp.bfloat16)
    return (jnp.asarray(0.5, jnp.bfloat16) * x) * e


def _reference_chain_check():  # pragma: no cover - debugging helper
    """Return (mismatch_count, total) of fast_exact_gelu vs jax.nn.gelu over
    all finite bf16 values on the current default backend."""
    import numpy as np

    bits = jnp.asarray(np.arange(65536, dtype=np.uint16))
    x = lax.bitcast_convert_type(bits, jnp.bfloat16)
    finite = jnp.isfinite(x)
    xf = jnp.where(finite, x, 0)
    a = lax.bitcast_convert_type(fast_exact_gelu(xf), jnp.uint16)
    b = lax.bitcast_convert_type(nn.gelu(xf, approximate=False), jnp.uint16)
    neq = np.asarray((a != b) & finite)
    return int(neq.sum()), int(np.asarray(finite).sum())
