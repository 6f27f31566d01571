"""Pallas TPU flash-attention kernel.

Fused softmax attention for the framework's two transformer stacks — the hot
loops of the model (reference hot-loop ranking: SURVEY.md §3; encoder
self-attention over ~1.1-2.3k patch tokens and the two-view info-sharing
attention). Sequence lengths here are short enough that the full K/V for one
(batch, head) slice fits comfortably in VMEM, so the kernel uses a
single-pass design: each grid step loads one Q block plus the entire K/V
slice, computes the (BLOCK_Q, S) score tile in fp32 on the MXU, applies a
numerically-stable softmax on the VPU, and contracts with V — no online
rescaling passes, no HBM round-trips for the score matrix.

Inputs are (B, S, H, D); arbitrary S is handled by padding to the TPU lane
multiple with key-side masking baked in statically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["flash_attention", "fits_vmem_single_pass", "spmd_attention"]

_LANE = 128


def _vmem_budget_bytes() -> int:
    # Half the chip's VMEM (128 MiB on v5e, less on older generations —
    # ops/tpu_caps.py) so Mosaic's own double-buffering and spill headroom fit.
    from ufm_tpu.ops.tpu_caps import vmem_budget_bytes

    return vmem_budget_bytes(0.5)


def _vmem_bytes_estimate(sk_pad: int, d: int, block_q: int, itemsize: int) -> int:
    """Worst-case VMEM residency of one grid step of the single-pass kernel:
    K+V slices and Q+O blocks (×2 for pipeline double-buffering) plus the
    fp32 score tile and its softmax copy."""
    kv = 2 * sk_pad * d * itemsize * 2
    qo = 2 * block_q * d * itemsize * 2
    scores = 2 * block_q * sk_pad * 4
    return kv + qo + scores


def fits_vmem_single_pass(sk: int, d: int, block_q: int, itemsize: int) -> bool:
    sk_pad = ((sk + _LANE - 1) // _LANE) * _LANE
    return _vmem_bytes_estimate(sk_pad, d, block_q, itemsize) <= _vmem_budget_bytes()


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int):
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]  # (S, D)

    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale

    s_pad = k.shape[0]
    if valid_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < valid_len, scores, -jnp.inf)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634


def _attn_kernel_opt(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int, kv_chunks: int):
    """VPU-lean single-pass attention.

    The base kernel's MXU work at this model's shapes is ~3.2k cycles/step but
    it runs at ~half the d=64 roofline — the gap is serialized VPU softmax
    passes over the (BQ, S) score tile. This variant removes three full-tile
    passes and (with ``kv_chunks > 1``) restructures as an online softmax over
    K/V chunks so Mosaic can overlap chunk i's exp (VPU) with chunk i+1's
    score matmul (MXU):

      * ``scale`` and the exp->exp2 conversion factor fold into Q *before*
        the score matmul ((BQ, D) work instead of an (BQ, S) pass);
      * softmax normalization is deferred to the (BQ, D) output (one small
        multiply instead of an (BQ, S) divide);
      * ``exp2`` instead of ``exp`` (the VPU primitive; no hidden multiply).
    """
    bq = q_ref.shape[1]
    s_pad = k_ref.shape[1]
    d = q_ref.shape[2]
    csize = s_pad // kv_chunks

    # fold scale + log2(e) into q in fp32, round once back to the compute dtype
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)

    m_acc = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l_acc = jnp.zeros((bq, 1), jnp.float32)
    o_acc = jnp.zeros((bq, d), jnp.float32)

    for i in range(kv_chunks):
        k = k_ref[0, i * csize : (i + 1) * csize]
        v = v_ref[0, i * csize : (i + 1) * csize]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if valid_len < (i + 1) * csize:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < valid_len - i * csize, s, -jnp.inf)

        m_i = jnp.max(s, axis=-1, keepdims=True)
        if kv_chunks == 1:
            p = jnp.exp2(s - m_i)
            l_acc = jnp.sum(p, axis=-1, keepdims=True)
            o_acc = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_new = jnp.maximum(m_acc, m_i)
            alpha = jnp.exp2(m_acc - m_new)
            p = jnp.exp2(s - m_new)
            l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_acc = o_acc * alpha + pv
            m_acc = m_new

    o_ref[0] = (o_acc / l_acc).astype(o_ref.dtype)


def _attn_kernel_pipe(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_len: int, nsplit: int):
    """Software-pipelined single-pass attention.

    Same math as ``_attn_kernel_opt`` with ``kv_chunks == 1`` (identical op
    order per row, so identical numerics), but the Q block is split into
    ``nsplit`` independent row chains and the chains are manually
    interleaved: chain i+1's score matmul (MXU) is issued before chain i's
    softmax (VPU) is consumed by its AV matmul. The chains share only K/V, so
    unlike the falsified online-softmax variants there is zero extra VPU
    correction work — any overlap Mosaic's scheduler achieves between the
    independent MXU and VPU chains is pure gain.
    """
    s_pad = k_ref.shape[1]
    sub = q_ref.shape[1] // nsplit
    k = k_ref[0]
    v = v_ref[0]
    q_all = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)

    def score(i):
        s = jax.lax.dot_general(
            q_all[i * sub : (i + 1) * sub],
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if valid_len < s_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        return s

    s_cur = score(0)
    for i in range(nsplit):
        s_next = score(i + 1) if i + 1 < nsplit else None
        m = jnp.max(s_cur, axis=-1, keepdims=True)
        p = jnp.exp2(s_cur - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, i * sub : (i + 1) * sub] = (o / l).astype(o_ref.dtype)
        s_cur = s_next


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int | None = None,
    interpret: bool | None = None,
    variant: str | None = None,
) -> jnp.ndarray:
    """Softmax attention; q/k/v are (B, S, H, D), returns (B, Sq, H, D).

    Differentiable: the forward runs the Pallas kernel; the backward is the
    exact softmax-attention VJP as XLA einsums (the O(S²) score matrix fits
    comfortably at this model's sequence lengths).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if variant is None:
        # interpret mode (CPU tests) keeps the round-2 "base" body whose
        # operation order matches the XLA reference bit-for-bit closely; the
        # TPU default is the VPU-lean "opt" body (fp32-reassociation drift
        # ~2e-3, verified closer to the fp64 ground truth than "base" —
        # BENCH_NOTES.md round 3)
        variant = _kernel_variant(default="base" if interpret else "pipe2")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if block_q is None:
        # Round-3 sweep at the model's shapes (bench_kernels.py): 640 is the
        # sweet spot — the encoder shape (S_pad 1280) runs 0.76 ms/62 TFLOPS
        # at 640 vs 1.17-1.37 ms/34-40 at 1280 (the full-sequence block's
        # (1280, S) score tile schedules much worse), and 320 loses the
        # amortization again (41 TFLOPS). The info-share shape (S_pad 2560)
        # is flat within noise between 640 and 1280. Bounded below so the
        # fp32 score tile stays within VMEM for longer key sequences.
        sk_pad_est = ((sk + _LANE - 1) // _LANE) * _LANE
        vmem_budget = 24 * 1024 * 1024  # bytes for the fp32 score tile
        block_q = min(640, max(_LANE, (vmem_budget // (sk_pad_est * 4)) // _LANE * _LANE))

    # Guard the single-pass design's VMEM assumption: if the whole K/V slice
    # plus the smallest score tile can't fit, the kernel would spill or fail
    # opaquely at compile time — fall back to the exact XLA path instead
    # (numerically identical; slower but correct at any sequence length).
    if not fits_vmem_single_pass(sk, d, min(int(block_q), _LANE), q.dtype.itemsize):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", weights, v)

    return _flash_attention_vjp(
        q, k, v, float(scale), int(block_q), bool(interpret), _spmd_enabled(), variant
    )


# --- SPMD partitioning (opt-in) ----------------------------------------------
# Under a sharded jit (TP/DP meshes), a pallas_call has no partitioning rule,
# so XLA would all-gather the operands and run the kernel replicated. Softmax
# attention is independent over batch and heads, so declare exactly that:
# shard on (batch, heads), replicate (seq, head_dim), run the kernel
# per-shard on local data — collectives never touch the attention.
#
# The wrapper is OPT-IN (``spmd_attention()`` context, used by the parallel
# inference/training paths) because it is brutally expensive to compile:
# every custom_partitioning instance compiles its body through a separate
# compiler round trip with no deduplication across the model's ~36 attention
# call sites (measured: 24 chained calls compile in 4 s plain vs 516 s
# wrapped). Single-device jit needs no partitioning rule anyway.

from ufm_tpu.ops.spmd import spmd_enabled as _spmd_enabled, spmd_kernels as spmd_attention  # noqa: E402


def _attn_spec(sharding) -> P:
    spec = tuple(getattr(sharding, "spec", ()) or ())
    spec = spec + (None,) * (4 - len(spec))
    return P(spec[0], None, spec[2], None)


def _spmd_infer_sharding(scale, block_q, interpret, variant, mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, _attn_spec(arg_shapes[0].sharding))


def _spmd_partition(scale, block_q, interpret, variant, mesh, arg_shapes, result_shape):
    spec = _attn_spec(arg_shapes[0].sharding)
    arg_shardings = tuple(NamedSharding(mesh, spec) for _ in range(3))
    out_sharding = NamedSharding(mesh, spec)

    def lower_fn(q, k, v):
        return _flash_attention_impl(
            q, k, v, scale=scale, block_q=block_q, interpret=interpret, variant=variant
        )

    return mesh, lower_fn, out_sharding, arg_shardings


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _flash_attention_spmd(q, k, v, scale, block_q, interpret, variant):
    return _flash_attention_impl(
        q, k, v, scale=scale, block_q=block_q, interpret=interpret, variant=variant
    )


_flash_attention_spmd.def_partition(
    infer_sharding_from_operands=_spmd_infer_sharding,
    partition=_spmd_partition,
    # Shardy propagation rule (einsum-style): batch/head factors are shared
    # and shardable; the seq/head_dim factors are private to each operand in
    # this model's meshes (never sharded).
    sharding_rule="b s h d, b t h d, b t h d -> b s h d",
)


def _primal(q, k, v, scale, block_q, interpret, use_spmd, variant):
    if use_spmd:
        return _flash_attention_spmd(q, k, v, scale, block_q, interpret, variant)
    return _flash_attention_impl(
        q, k, v, scale=scale, block_q=block_q, interpret=interpret, variant=variant
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_attention_vjp(q, k, v, scale, block_q, interpret, use_spmd, variant):
    return _primal(q, k, v, scale, block_q, interpret, use_spmd, variant)


def _flash_attention_fwd(q, k, v, scale, block_q, interpret, use_spmd, variant):
    out = _primal(q, k, v, scale, block_q, interpret, use_spmd, variant)
    return out, (q, k, v)


def _xla_attention_bwd(scale, residuals, g):
    # Exact softmax-attention VJP as XLA einsums, fp32 operands. An
    # "operands stay in input dtype" variant (explicit bf16 casts of p/ds +
    # preferred_element_type=f32) was built and measured 498-504 vs 383 ms on
    # the flagship training step (A/B on-chip, BENCH_NOTES round 3): at
    # DEFAULT matmul precision XLA already rounds these f32 operands to bf16
    # *inside* the fused matmuls, so the explicit casts only materialized
    # extra (B, H, S, S) copies. Keep fp32 operands.
    q, k, v = residuals
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale, valid_len):
    """Flash-attention backward: one Q block against the full K/V slice.

    Recomputes the probability tile in VMEM (scores never touch HBM — the
    XLA VJP materializes four (B, H, S, S) fp32 tensors per layer there,
    ~370 MB × 4 × 24 layers of traffic at the flagship's training shapes)
    and accumulates dk/dv across Q blocks in fp32 output blocks that stay
    VMEM-resident over the inner grid dimension.

    Matmul operands are cast to the input dtype with fp32 accumulation —
    identical rounding to what XLA applies inside its fused matmuls at
    DEFAULT precision, so gradients match the XLA VJP to reassociation-level
    drift (pinned by tests/test_attention.py).
    """
    j = pl.program_id(1)
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]  # (S, D)
    g = g_ref[0]  # (BQ, D)

    # recompute the forward's probability tile (same masking semantics)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s_pad = k.shape[0]
    if valid_len < s_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (BQ, S) fp32

    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, S) fp32
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)  # grad wrt scaled logits, fp32

    ds_c = ds.astype(q.dtype)
    p_c = p.astype(q.dtype)

    dq_ref[0] = (
        jax.lax.dot_general(
            ds_c, k, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    ).astype(dq_ref.dtype)

    # dk/dv accumulate over Q blocks: their index map pins block (i, 0, 0),
    # so the fp32 accumulator stays in VMEM across the inner grid dim
    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += (
        jax.lax.dot_general(
            ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    dv_ref[0] += jax.lax.dot_general(
        p_c, g, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd_stack_bytes_estimate(sk_pad: int, block_q: int) -> int:
    """Mosaic scoped-stack footprint of the kernel's fp32 intermediates:
    ~5 live (block_q, sk_pad) tiles (scores→p, dp, ds, and the input-dtype
    casts of p/ds). Measured 4.13 tiles at (512, 2432) fp32 — 5 is margin.
    These live on the scoped-VMEM *stack*, a separate (default 16 MB) arena
    from the pipelined block windows, and are what actually bounds block_q."""
    return 5 * block_q * sk_pad * 4


def _bwd_vmem_bytes_estimate(sk_pad: int, d: int, block_q: int, itemsize: int) -> int:
    """Worst-case VMEM residency of one backward grid step: K/V slices +
    fp32 dk/dv accumulators + Q/G/dQ blocks (×2 pipeline buffers) and the
    fp32 score/probability/dp/ds tiles."""
    kv = 2 * sk_pad * d * itemsize * 2
    dkdv = 2 * sk_pad * d * 4
    qg = 3 * block_q * d * max(itemsize, 4) * 2
    return kv + dkdv + qg + _bwd_stack_bytes_estimate(sk_pad, block_q)


def _bwd_block_q(sk_pad: int, d: int, itemsize: int) -> int:
    """Largest lane-aligned Q block whose backward step fits both the total
    VMEM budget and the scoped-stack arena the fp32 tiles allocate from
    (pallas_call raises that arena to half of `_vmem_budget_bytes()`)."""
    budget = _vmem_budget_bytes()
    stack_budget = budget // 2
    bq = 512
    while bq > _LANE and (
        _bwd_vmem_bytes_estimate(sk_pad, d, bq, itemsize) > budget
        or _bwd_stack_bytes_estimate(sk_pad, bq) > stack_budget
    ):
        bq //= 2
    return bq


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_attention_bwd_impl(q, k, v, g, *, scale: float, interpret: bool):
    """(B, S, H, D) gradients via the Pallas backward kernel."""
    b, sq, h, d = q.shape
    sk = k.shape[1]

    def pad_to(x, m):
        r = (-x.shape[1]) % m
        if r:
            x = jnp.pad(x, ((0, 0), (0, r), (0, 0), (0, 0)))
        return x

    sk_pad = ((sk + _LANE - 1) // _LANE) * _LANE
    block_q = _bwd_block_q(sk_pad, d, q.dtype.itemsize)
    block_q = min(block_q, max(_LANE, ((sq + _LANE - 1) // _LANE) * _LANE))
    qp, gp = pad_to(q, block_q), pad_to(g.astype(q.dtype), block_q)
    kp, vp = pad_to(k, _LANE), pad_to(v, _LANE)
    sq_pad = qp.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf, gf = fold(qp), fold(kp), fold(vp), fold(gp)
    num_q_blocks = sq_pad // block_q

    kernel = functools.partial(_attn_bwd_kernel, scale=scale, valid_len=sk)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, sk_pad, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size + gf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
        # the fp32 score/p/dp/ds tiles allocate from Mosaic's scoped-VMEM
        # stack, whose default arena (16 MB) is far below what the chip has;
        # raise it to the budget _bwd_block_q sizes against
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_budget_bytes()),
        interpret=interpret,
    )(qf, kf, vf, gf)

    def unfold(x, s_orig, s_padded):
        return x.reshape(b, h, s_padded, d).transpose(0, 2, 1, 3)[:, :s_orig]

    return (
        unfold(dq, sq, sq_pad),
        unfold(dk, sk, sk_pad).astype(k.dtype),
        unfold(dv, sk, sk_pad).astype(v.dtype),
    )


def _bwd_mode(use_spmd: bool) -> str:
    """"pallas" (default) or "xla". The SPMD path keeps the XLA einsum VJP:
    GSPMD partitions it natively, while a Pallas backward would need its own
    custom_partitioning wrapper per call site — measured ~100x compile-time
    blowup on the remote-compile path (see the spmd_kernels docstring)."""
    import os

    if use_spmd:
        return "xla"
    return os.environ.get("UFM_ATTN_BWD", "pallas")


def _flash_attention_bwd(scale, block_q, interpret, use_spmd, variant, residuals, g):
    q, k, v = residuals
    sk_pad = ((k.shape[1] + _LANE - 1) // _LANE) * _LANE
    fits = _bwd_vmem_bytes_estimate(
        sk_pad, q.shape[3], _LANE, q.dtype.itemsize
    ) <= _vmem_budget_bytes()
    if _bwd_mode(use_spmd) == "pallas" and fits:
        return _flash_attention_bwd_impl(q, k, v, g, scale=scale, interpret=interpret)
    return _xla_attention_bwd(scale, residuals, g)


_flash_attention_vjp.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def _kernel_variant(default: str = "opt") -> str:
    """Kernel body selection: "pipe2"/"pipe4" (Q block split into 2/4
    independent row chains, next chain's score matmul interleaved with the
    current chain's softmax — pipe2 is the TPU default, measured 69-91 TFLOPS
    vs opt's 42-62 at the model's shapes), "opt" (VPU-lean single chain),
    "opt2"/"opt4" (online-softmax over 2/4 K/V chunks; measured worse), "base"
    (round-2 reference body; the interpret-mode default). Env override:
    UFM_ATTN_KERNEL."""
    import os

    return os.environ.get("UFM_ATTN_KERNEL", default)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret", "variant"))
def _flash_attention_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int,
    interpret: bool,
    variant: str | None = None,
) -> jnp.ndarray:
    if variant is None:
        variant = _kernel_variant(default="base" if interpret else "pipe2")
    b, sq, h, d = q.shape
    sk = k.shape[1]

    def pad_to(x, m):
        r = (-x.shape[1]) % m
        if r:
            x = jnp.pad(x, ((0, 0), (0, r), (0, 0), (0, 0)))
        return x

    block_q = min(block_q, max(_LANE, ((sq + _LANE - 1) // _LANE) * _LANE))
    qp = pad_to(q, block_q)
    kp = pad_to(k, _LANE)
    vp = pad_to(v, _LANE)
    sq_pad, sk_pad = qp.shape[1], kp.shape[1]

    # (B, S, H, D) -> (B*H, S, D): heads become independent grid rows.
    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qf, kf, vf = fold(qp), fold(kp), fold(vp)
    num_q_blocks = sq_pad // block_q

    if variant == "base":
        kernel = functools.partial(_attn_kernel, scale=scale, valid_len=sk)
    elif variant.startswith("pipe"):
        # sub-chain boundaries slice Q/O *rows* (the sublane dim), so they
        # only need sublane alignment (16 covers bf16), not lane alignment
        nsplit = int(variant[4:]) if len(variant) > 4 else 2
        while nsplit > 1 and (block_q // nsplit) % 16:
            nsplit //= 2
        kernel = functools.partial(_attn_kernel_pipe, scale=scale, valid_len=sk, nsplit=nsplit)
    elif variant.startswith("opt"):
        chunks = int(variant[3:]) if len(variant) > 3 else 1
        # chunk boundaries must stay lane-aligned
        while chunks > 1 and (sk_pad // chunks) % _LANE:
            chunks //= 2
        kernel = functools.partial(_attn_kernel_opt, scale=scale, valid_len=sk, kv_chunks=chunks)
    else:
        raise ValueError(
            f"unknown attention kernel variant {variant!r} (expected base, opt[N] or pipe[N])"
        )

    out = pl.pallas_call(
        kernel,
        grid=(b * h, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, sq_pad, d).transpose(0, 2, 1, 3)
    return out[:, :sq]
