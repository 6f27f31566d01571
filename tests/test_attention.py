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


@pytest.mark.parametrize(
    "variant,tol",
    [("base", 2e-4), ("opt", 5e-3), ("opt2", 5e-3), ("opt4", 5e-3), ("pipe2", 5e-3), ("pipe4", 5e-3)],
)
def test_flash_variants_match_xla(variant, tol):
    """All kernel bodies against the XLA reference. The "opt*" bodies defer
    softmax normalization to the output and use exp2 — fp32 reassociation
    drift vs the XLA op order is ~2e-3, while BOTH paths sit 3-4e-3 from the
    fp64 ground truth (opt slightly closer) — so the loose tolerance reflects
    in-family fp32 error, not a weaker kernel."""
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, d = 2, 300, 2, 64
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    ref = _xla_attention(q, k, v, d**-0.5)
    got = flash_attention(q, k, v, interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=tol, atol=tol)


@pytest.mark.parametrize("variant,nsplit", [("pipe2", 2), ("pipe4", 4)])
def test_flash_pipe_multichain(variant, nsplit):
    """The pipe bodies with a sequence long enough that the Q block really
    splits into `nsplit` 128-aligned row chains (at short sequences the
    block_q clamp collapses nsplit back to 1, which the parametrized test
    above already covers)."""
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, d = 1, 500, 2, 64
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    ref = _xla_attention(q, k, v, d**-0.5)
    # s=500 pads to 512 -> block_q 512 -> sub-chains of 512/nsplit rows; the
    # last chain covers the key-padding tail, exercising the mask path too
    got = flash_attention(q, k, v, interpret=True, variant=variant, block_q=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)


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


def test_flash_attention_bf16_gradients_near_fp32():
    """The backward keeps matmul operands in the input dtype (bf16 in
    training) with fp32 accumulation; gradients must stay within bf16
    rounding of the fp32 ground truth."""
    key = jax.random.PRNGKey(5)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, s, h, d = 1, 72, 2, 16
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    cot = jax.random.normal(kg, (b, s, h, d), dtype=jnp.float32)
    scale = d**-0.5

    def loss(dtype):
        def f(q_, k_, v_):
            out = flash_attention(
                q_.astype(dtype), k_.astype(dtype), v_.astype(dtype), scale=scale, interpret=True
            )
            return jnp.sum(out.astype(jnp.float32) * cot)

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_bf16 = loss(jnp.bfloat16)
    g_fp32 = loss(jnp.float32)
    for gb, gx, name in zip(g_bf16, g_fp32, "qkv"):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gx), rtol=0.1, atol=0.05, err_msg=name)


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (1, 72, 2, 16),  # single q block, padded keys
        (1, 300, 2, 64),  # multi q block at forced block_q=128: dk/dv accumulate
        (2, 130, 3, 32),  # batch*heads grid, padded keys
    ],
)
def test_pallas_backward_matches_xla_backward(b, s, h, d, monkeypatch):
    """The Pallas flash backward (scores recomputed in VMEM, dk/dv
    accumulated across Q blocks) against the XLA einsum VJP it replaces
    (VERDICT r4 next #1). Forced small block_q so the accumulation path is
    exercised even at test sizes."""
    from ufm_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(11)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    g = jax.random.normal(kg, (b, s, h, d), dtype=jnp.float32)
    scale = d**-0.5

    monkeypatch.setattr(fa, "_bwd_block_q", lambda *a: 128)
    got = fa._flash_attention_bwd_impl(q, k, v, g, scale=scale, interpret=True)
    ref = fa._xla_attention_bwd(scale, (q, k, v), g)
    for gp, gx, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=2e-4, atol=2e-4, err_msg=name)


def test_pallas_backward_bf16_matches_xla_backward():
    """bf16 training dtype: kernel operands are cast to the input dtype with
    fp32 accumulation — the same rounding XLA applies inside its fused
    matmuls at DEFAULT precision, so both VJPs agree to bf16 noise."""
    from ufm_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(13)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, s, h, d = 1, 200, 2, 64
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.bfloat16)
    g = jax.random.normal(kg, (b, s, h, d), dtype=jnp.bfloat16)
    scale = d**-0.5

    got = fa._flash_attention_bwd_impl(q, k, v, g, scale=scale, interpret=True)
    ref = fa._xla_attention_bwd(scale, (q, k, v), g)
    for gp, gx, name in zip(got, ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gx, np.float32),
            rtol=5e-2, atol=5e-2, err_msg=name,
        )


def test_backward_routing():
    """SPMD tracing must keep the XLA einsum VJP (GSPMD-partitionable; a
    Pallas backward would need its own per-call-site custom_partitioning,
    measured ~100x compile blowup) while the plain path defaults to the
    Pallas backward, overridable via UFM_ATTN_BWD."""
    import os

    from ufm_tpu.ops.flash_attention import _bwd_mode

    assert _bwd_mode(use_spmd=True) == "xla"
    assert _bwd_mode(use_spmd=False) == "pallas"
    os.environ["UFM_ATTN_BWD"] = "xla"
    try:
        assert _bwd_mode(use_spmd=False) == "xla"
    finally:
        del os.environ["UFM_ATTN_BWD"]


def test_backward_vmem_guard_falls_back():
    """A backward whose K/V + accumulators exceed VMEM must take the XLA VJP
    (correct at any length) rather than the Pallas kernel."""
    from ufm_tpu.ops import flash_attention as fa

    key = jax.random.PRNGKey(17)
    kq, kk, kv, kg = jax.random.split(key, 4)
    b, s, h, d = 1, 96, 2, 32
    q = jax.random.normal(kq, (b, s, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), dtype=jnp.float32)
    cot = jax.random.normal(kg, (b, s, h, d), dtype=jnp.float32)
    scale = d**-0.5

    def loss(q_, k_, v_):
        return jnp.sum(flash_attention(q_, k_, v_, scale=scale, interpret=True) * cot)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    calls = []
    orig = fa._flash_attention_bwd_impl

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    fa._flash_attention_bwd_impl = spy
    budget = fa._vmem_budget_bytes
    # forward guard needs ~0.5 MB at these shapes; backward needs more — pick
    # a budget between the two so only the backward falls back
    fwd_need = fa._vmem_bytes_estimate(128, d, 128, 4)
    bwd_need = fa._bwd_vmem_bytes_estimate(128, d, 128, 4)
    assert fwd_need < bwd_need
    fa._vmem_budget_bytes = lambda: (fwd_need + bwd_need) // 2
    try:
        g_fb = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._vmem_budget_bytes = budget
        fa._flash_attention_bwd_impl = orig
    assert not calls, "backward must take the XLA fallback under VMEM pressure"
    for a_, b_, name in zip(g_fb, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name)


def test_spmd_wrapper_threads_variant():
    """The custom_partitioning SPMD wrapper must forward the kernel-variant
    argument (round-3 review finding: it used to drop it, silently running
    the default body while reporting the requested name). An unknown variant
    raises through BOTH paths — proving the argument actually reaches the
    dispatch — and a valid explicit variant still matches XLA under SPMD."""
    from ufm_tpu.ops.flash_attention import spmd_attention

    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 96, 2, 32), dtype=jnp.float32)
    k = jax.random.normal(kk, (2, 96, 2, 32), dtype=jnp.float32)
    v = jax.random.normal(kv, (2, 96, 2, 32), dtype=jnp.float32)

    with pytest.raises(ValueError, match="unknown attention kernel variant"):
        flash_attention(q, k, v, interpret=True, variant="bogus")
    with spmd_attention():
        with pytest.raises(ValueError, match="unknown attention kernel variant"):
            flash_attention(q, k, v, interpret=True, variant="bogus")
        got = flash_attention(q, k, v, interpret=True, variant="pipe2")
    ref = _xla_attention(q, k, v, 32**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)


def test_vmem_guard_fallback():
    """An oversized key sequence must take the XLA fallback (never the
    single-pass kernel whose K/V slice would exceed VMEM) and stay exact."""
    from ufm_tpu.ops import flash_attention as fa

    assert fa.fits_vmem_single_pass(2_560, 64, 128, 2)  # model shapes: fine
    assert not fa.fits_vmem_single_pass(40_000, 128, 128, 4)  # would spill

    # tiny dims but a budget forced down so the guard must trip
    orig = fa._vmem_budget_bytes
    fa._vmem_budget_bytes = lambda: 1 << 12
    try:
        q = jnp.asarray(np.random.default_rng(0).standard_normal((1, 96, 2, 32)), jnp.float32)
        out = flash_attention(q, q, q)  # would be the pallas path normally
        ref = _xla_attention(q, q, q, 32**-0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    finally:
        fa._vmem_budget_bytes = orig


def test_pallas_attention_under_spmd_mesh():
    """The kernel's custom_partitioning: under a head-sharded mesh the pallas
    path must run per-shard (batch/head parallel) and match XLA numerics."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ufm_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    b, s, h, d = 2, 64, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    ref = _xla_attention(q, k, v, d**-0.5)

    mesh = make_mesh(8, data=2, fsdp=1, model=4)
    head_sharded = NamedSharding(mesh, P("data", None, "model", None))
    fwd = jax.jit(
        lambda a, b_, c: flash_attention(a, b_, c),
        in_shardings=(head_sharded, head_sharded, head_sharded),
    )
    with mesh:
        out = fwd(jax.device_put(q, head_sharded), jax.device_put(k, head_sharded), jax.device_put(v, head_sharded))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
