"""Pallas TPU kernel for the refinement window-dots gather.

The classification-refinement stage (reference semantics
uniflowmatch/models/ufm.py:1041-1178) needs, per pixel, the dot products
between the source feature q(p) and the bicubically-sampled target features
at a P×P window around the flow-displaced position — which reduces to the
(P+3)² integer taps ``dots[v,u] = <q(p), F[yb(p)+v, xb(p)+u]>`` (see
ops/refinement.py). As XLA gathers this is element-throughput-bound: every
formulation measured on v5e moves the same ~64·C elements/pixel at ~8
elements/cycle (~60 ms per 2×560×420 refinement at C=16).

This kernel beats that by keeping the *entire padded target feature map
resident in VMEM* (C=16 at 560×420 → ~17 MB fp32; v5e VMEM is ~128 MB) and
loading each pixel's window as full (16, 256) vector tiles:

  * All dynamic offsets are hardware-aligned by construction — the x tap
    base is rounded down to a 128-lane boundary (the true offset ``s`` is
    resolved in the XLA epilogue), and the row base is rounded down to the
    8-sublane boundary (resolved by a cheap dynamic sublane roll of the
    per-pixel (16, T) result). Mosaic cannot lower unaligned dynamic starts.
  * Zero padding of the feature map replaces all edge masking: taps outside
    the image read zeros, exactly matching the XLA path's masked gathers.
    Positions are pre-clamped to [-(r+4), dim + r+4], which cannot change
    any in-range tap and keeps fully-out-of-range windows all-zero.
  * The channel reduction *and* lane compaction for all 8 pixels of a group
    happen in ONE (128, 256) @ (256, T) MXU matmul (2 K-passes per 8 pixels)
    against a static 0/1 selection matrix.

Measured on v5e at 420×560×C16: ~64 cyc/pixel for the per-pixel-matmul
variant, ~16 ms/image; this batched-matmul variant is the production one.
The kernel emits per pixel 8 row taps × T=256/C column taps; the XLA
epilogue applies the separable bicubic combination (with the per-pixel
``s`` shift folded into the x weights), temperature, bias, softmax and the
offset-weighted residual — identical math to the XLA fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

from ufm_tpu.ops.grid_sample import cubic_weights

__all__ = ["window_scores_pallas", "supports_pallas_window"]

_LANES = 256  # window width in lanes: two 128-lane tiles


def _vmem_limit_bytes() -> int:
    # nearly the whole chip VMEM — the resident feature map IS the design
    from ufm_tpu.ops.tpu_caps import vmem_capacity_bytes

    return int(vmem_capacity_bytes() * 0.94)


def supports_pallas_window(c: int, local_patch: int, h: int | None = None, w: int | None = None) -> bool:
    """The kernel loads (16, 256)-lane windows; the emitted tap count
    T = 256/C must cover the worst-case aligned offset plus the P+3 taps,
    and the kernel emits only 8 row taps per pixel (``d16[0:8]``) — a P
    window needs P+3 row taps, so P > 5 never qualifies.

    With ``h``/``w`` given, additionally checks the kernel's defining VMEM
    assumption — the whole padded target feature map stays resident — against
    the current chip's capacity (ops/tpu_caps.py)."""
    if c not in (4, 8, 16) or _LANES % c:
        return False
    taps = _LANES // c
    gpx = 128 // c  # x alignment granularity in pixels
    if local_patch + 3 > 8:
        return False
    if (gpx - 1) + local_patch + 3 > taps:
        return False
    if h is not None and w is not None:
        from ufm_tpu.ops.tpu_caps import vmem_budget_bytes

        r = (local_patch - 1) // 2
        hp = h + (2 * r + 5) + (r + 4 - r + 15)
        wp = w + 2 * (2 * r + 5) + taps
        # padded map (bf16 fast path would halve this; budget for fp32) plus
        # the per-row q/out blocks, doubled for Mosaic pipelining
        per_row = (8 * ((w + 7) // 8) * _LANES + 8 * ((w + 7) // 8) * taps) * 4 * 2
        if hp * wp * c * 4 + per_row > vmem_budget_bytes(0.9):
            return False
    return True


def _dots_kernel(
    yb_ref,
    xo_ref,
    f_ref,
    q_ref,
    o_ref,
    *,
    groups: int,
    taps: int,
    precision,
    gsz: int = 8,
    shifted: bool = False,
):
    """``gsz`` pixels per loop iteration. The op is bound by the per-pixel
    serial scalar-address/load chain (~75 cyc/pixel; BENCH_NOTES round 2-3:
    load width, load count, and DMA prefetch all measured neutral-to-worse) —
    wider groups expose gsz independent chains per iteration for the
    scheduler to interleave and amortize the q load / matmul / out store.

    ``shifted``: additionally lane-roll each pixel's tap block by its aligned
    -base offset ``s`` (packed into the low bits of the xo scalar) and emit
    only the 8 taps [s, s+8) the bicubic window consumes — rolls measure
    ~free here (round-2 post-mortem) and the pre-aligned taps let the XLA
    epilogue use static-slice multiply-adds instead of materializing the
    per-pixel one-hot weight tensors. Requires gsz >= 16 (out-lane stride)."""
    c = _LANES // taps
    out_t = 8 if shifted else taps
    # shifted: pad the selection output to 128 lanes — free on the MXU (an
    # N<128 matmul occupies a full 128-wide pass anyway) and it makes the
    # per-pixel result a (16, 128) fp32 tile, the only shape Mosaic can
    # dynamic-lane-rotate (the bf16 input block and the (16, taps) result
    # both reject tpu.dynamic_rotate)
    sel_n = 128 if shifted else taps
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (_LANES, sel_n), 0) // c
        == jax.lax.broadcasted_iota(jnp.int32, (_LANES, sel_n), 1)
    ).astype(f_ref.dtype)

    def body(g, carry):
        # ONE query load covers the whole group (row i = pixel i's
        # replicated q) — halving the slice count matters more than bytes
        qg = q_ref[0, 0, 0:gsz, pl.ds(pl.multiple_of(g * _LANES, 128), _LANES)]
        prods = []
        subrow = []
        subcol = []
        for i in range(gsz):
            x = g * gsz + i
            yb = yb_ref[0, 0, 0, x]
            xo = xo_ref[0, 0, 0, x]
            subrow.append(yb & 7)
            ya = pl.multiple_of((yb >> 3) << 3, 8)
            if shifted:
                s = xo & 127
                subcol.append(s)
                xo = xo - s
            blk = f_ref[0, pl.ds(ya, 16), pl.ds(pl.multiple_of(xo, 128), _LANES)]
            prods.append(blk * jnp.broadcast_to(qg[i : i + 1], (16, _LANES)))
        stacked = jnp.concatenate(prods, axis=0)  # (16*gsz, 256)
        dots = jnp.dot(stacked, sel, preferred_element_type=jnp.float32, precision=precision)
        outs = []
        for i in range(gsz):
            d16 = pltpu.roll(dots[16 * i : 16 * i + 16, :], shift=-subrow[i], axis=0)
            if shifted:
                d16 = pltpu.roll(d16, shift=-subcol[i], axis=1)
            outs.append(d16[0:8, 0:out_t])
        row = jnp.concatenate(outs, axis=1)  # (8, gsz*out_t)
        o_ref[0, 0, 0:8, pl.ds(pl.multiple_of(g * gsz * out_t, 128), gsz * out_t)] = row
        return carry

    jax.lax.fori_loop(0, groups, body, 0)


def _dots8_kernel(
    rowidx_ref, xo_ref, f8_ref, q_ref, o_ref, scratch_ref, sem_ref, *, groups, taps, precision, nbuf
):
    """Double-buffered DMA variant (round-3; the round-2 post-mortem's named
    fix). The feature map lives in HBM as an 8-copy row-shifted stack
    (f8[s, r, :] = f_pad[r + s, :]): each pixel's 8 window rows are ONE
    aligned (8, 256) block at a precomputed 8-aligned row index, fetched by
    an async copy into a rotating VMEM scratch slot. Group g+nbuf-1's eight
    copies are issued before computing group g, so the serial scalar
    address chain that bounds the v1 kernel (~600 cyc/group of dynamic VMEM
    loads, BENCH_NOTES.md) overlaps the DMA engine's data movement instead
    of stalling the vector pipeline. No rolls: the stack index resolves the
    sublane misalignment that v1 handled with 16-row loads + per-pixel rolls.
    """
    c = _LANES // taps
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (_LANES, taps), 0) // c
        == jax.lax.broadcasted_iota(jnp.int32, (_LANES, taps), 1)
    ).astype(f8_ref.dtype)

    batch = pl.program_id(0)  # f8 is un-blocked (ANY/HBM): index the batch axis

    def issue(g):
        slot = jax.lax.rem(jnp.int32(g), jnp.int32(nbuf))
        for i in range(8):
            x = g * 8 + i
            ri = rowidx_ref[0, 0, 0, x]
            xo = xo_ref[0, 0, 0, x]
            pltpu.make_async_copy(
                f8_ref.at[
                    batch, pl.ds(pl.multiple_of(ri, 8), 8), pl.ds(pl.multiple_of(xo, 128), _LANES)
                ],
                scratch_ref.at[slot, pl.ds(8 * i, 8), :],
                sem_ref.at[slot, i],
            ).start()

    for g0 in range(min(nbuf - 1, groups)):
        issue(g0)

    def body(g, carry):
        slot = jax.lax.rem(g, jnp.int32(nbuf))

        @pl.when(g + nbuf - 1 < groups)
        def _():
            issue(g + nbuf - 1)

        # wait on this group's copies; the descriptor is size-only for the
        # wait, so static dummy indices avoid re-reading the SMEM scalars
        for i in range(8):
            pltpu.make_async_copy(
                f8_ref.at[batch, pl.ds(0, 8), pl.ds(0, _LANES)],
                scratch_ref.at[slot, pl.ds(8 * i, 8), :],
                sem_ref.at[slot, i],
            ).wait()

        q8 = q_ref[0, 0, 0:8, pl.ds(pl.multiple_of(g * _LANES, 128), _LANES)]
        prods = []
        for i in range(8):
            blk = scratch_ref[slot, pl.ds(8 * i, 8), :]
            prods.append(blk * jnp.broadcast_to(q8[i : i + 1], (8, _LANES)))
        stacked = jnp.concatenate(prods, axis=0)  # (64, 256)
        dots = jnp.dot(stacked, sel, preferred_element_type=jnp.float32, precision=precision)
        outs = [dots[8 * i : 8 * i + 8, :] for i in range(8)]
        row = jnp.concatenate(outs, axis=1)  # (8, 8*taps)
        o_ref[0, 0, 0:8, pl.ds(pl.multiple_of(g * 8 * taps, 128), 8 * taps)] = row
        return carry

    jax.lax.fori_loop(0, groups, body, 0)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "c", "hp8", "wp", "taps", "precision", "interpret", "nbuf")
)
def _dots8(rowidx, xo, f8, q_rep, *, h, w, c, hp8, wp, taps, precision, interpret, nbuf):
    """(B,h,wk) row/lane bases + HBM row-shifted stack -> (B, h, 8, wk*taps)."""
    b = q_rep.shape[0]
    wk = rowidx.shape[-1]
    ri4 = rowidx.reshape(b, h, 1, wk)
    xo4 = xo.reshape(b, h, 1, wk)
    q4 = q_rep.reshape(b, h, 8, (wk // 8) * _LANES)
    kernel = functools.partial(
        _dots8_kernel, groups=wk // 8, taps=taps, precision=precision, nbuf=nbuf
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, wk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, wk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # the stack stays in HBM
            pl.BlockSpec(
                (1, 1, 8, (wk // 8) * _LANES), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, wk * taps), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 64, _LANES), f8.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 8)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 8, wk * taps), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(ri4, xo4, f8, q4)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "hp", "wp", "taps", "precision", "interpret", "gsz", "shifted"),
)
def _dots16(yb, xo, f_pad, q_rep, *, h, w, c, hp, wp, taps, precision, interpret, gsz=8, shifted=False):
    """(B,h,wk) bases + padded map -> (B, h, 8, wk*taps) tap dot products.

    The base/query operands get an explicit singleton axis before the lane
    axis so every per-(image,row) block equals the overall array on its last
    two dims — Mosaic requires block shapes (…, s, l) with s % 8 == 0 and
    l % 128 == 0 *or* equal to the array dims, and a (1, 1, wk·L) block over
    a (B, h, wk·L) array violates that (penultimate 1 ≠ h).
    """
    b = q_rep.shape[0]
    wk = yb.shape[-1]
    out_t = 8 if shifted else taps
    yb4 = yb.reshape(b, h, 1, wk)
    xo4 = xo.reshape(b, h, 1, wk)
    q4 = q_rep.reshape(b, h, gsz, (wk // gsz) * _LANES)
    kernel = functools.partial(
        _dots_kernel, groups=wk // gsz, taps=taps, precision=precision, gsz=gsz, shifted=shifted
    )
    f_spec = pl.BlockSpec((1, hp, wp * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, 1, wk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, wk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM),
            f_spec,
            pl.BlockSpec(
                (1, 1, gsz, (wk // gsz) * _LANES), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, wk * out_t), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 8, wk * out_t), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes()),
        interpret=interpret,
    )(yb4, xo4, f_pad, q4)


def _window_variant() -> str:
    """Kernel generation: "v2" (HBM row-shifted stack + double-buffered DMA
    prefetch; round-3) or "v1" (VMEM-resident map + dynamic loads; round-2).
    "v2n<k>" selects v2 with k scratch buffers. Env override UFM_WINDOW_KERNEL.

    Default "g32s" (round-3): 32-pixel groups + kernel-side alignment shift,
    23.3 ms/b4 vs the round-2 kernel's 72-80 ms at 420x560xC16 and exact
    fp32 epilogue (BENCH_NOTES.md round 3)."""
    import os

    return os.environ.get("UFM_WINDOW_KERNEL", "g32s")


def window_scores_pallas(
    query_features: jnp.ndarray,
    target_features: jnp.ndarray,
    flow: jnp.ndarray,
    local_patch: int,
    *,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool | None = None,
    variant: str | None = None,
) -> jnp.ndarray:
    """Raw window scores (B, H, W, P, P) — Σ_lm wy_l wx_m dots[i+l, j+m] —
    numerically matching the XLA fused path before temperature/bias/softmax.

    query_features/target_features: (B, H, W, C) float; flow: (B, H, W, 2) xy.
    """
    assert supports_pallas_window(target_features.shape[-1], local_patch), (
        target_features.shape,
        local_patch,
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if variant is None:
        variant = _window_variant()
    from ufm_tpu.ops.spmd import spmd_enabled

    fn = _window_scores_spmd if spmd_enabled() else _window_scores_impl
    return fn(
        query_features.astype(jnp.float32),
        target_features.astype(jnp.float32),
        flow.astype(jnp.float32),
        int(local_patch),
        precision,
        bool(interpret),
        str(variant),
    )


# Under a sharded jit, a pallas_call has no partitioning rule and GSPMD would
# all-gather the operands. The op is independent per image: shard the batch
# axis, replicate the rest, run per-shard (same treatment as flash_attention).
# OPT-IN via ufm_tpu.ops.spmd (the wrapper costs a separate compiler round
# trip per instance; see that module's docstring).


def _batch_spec(sharding, ndim: int) -> P:
    spec = tuple(getattr(sharding, "spec", ()) or ())
    spec = spec + (None,) * (ndim - len(spec))
    return P(spec[0], *([None] * (ndim - 1)))


def _ws_infer_sharding(p, precision, interpret, variant, mesh, arg_shapes, result_shape):
    return NamedSharding(mesh, _batch_spec(arg_shapes[0].sharding, 5))


def _ws_partition(p, precision, interpret, variant, mesh, arg_shapes, result_shape):
    b_axis = _batch_spec(arg_shapes[0].sharding, 4)[0]
    arg_shardings = tuple(
        NamedSharding(mesh, P(b_axis, *([None] * (len(s.shape) - 1)))) for s in arg_shapes
    )
    out_sharding = NamedSharding(mesh, P(b_axis, None, None, None, None))

    def lower_fn(q, f, flow):
        return _window_scores_impl(q, f, flow, p, precision, interpret, variant)

    return mesh, lower_fn, out_sharding, arg_shardings


@functools.partial(custom_partitioning, static_argnums=(3, 4, 5, 6))
def _window_scores_spmd(q, f, flow, p, precision, interpret, variant):
    return _window_scores_impl(q, f, flow, p, precision, interpret, variant)


_window_scores_spmd.def_partition(
    infer_sharding_from_operands=_ws_infer_sharding,
    partition=_ws_partition,
    sharding_rule="b h w c, b h w c, b h w k -> b h w i j",
)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _window_scores_impl(
    query_features, target_features, flow, local_patch, precision, interpret, variant="v1"
):
    p = local_patch
    r = (p - 1) // 2
    b, h, w, c = target_features.shape
    taps = _LANES // c
    gpx = 128 // c

    # "default" precision on real TPU also feeds the kernel bf16 operands —
    # halves the VMEM-resident map (headroom for larger resolutions) and the
    # selection matmul runs in one MXU pass instead of six (measured: 105 ->
    # 80 ms/b4 at 420x560). Rounding happens before the q·F products;
    # measured refined-flow drift stays ≤0.05 px (BENCH_NOTES.md). Interpret
    # mode keeps fp32 so the CPU equality tests stay exact.
    fast = precision == jax.lax.Precision.DEFAULT and not interpret
    dt = jnp.bfloat16 if fast else jnp.float32
    q = query_features.astype(dt)
    f = target_features.astype(dt)

    # Pixel-space target positions, clamped so that integer tap bases stay
    # inside the padded map; windows that were fully outside the image stay
    # fully outside (all-zero taps), so scores are unchanged by the clamp.
    from ufm_tpu.ops.refinement import base_grid  # local import: avoid cycle

    m = r + 4
    pos = flow.astype(jnp.float32) + base_grid(h, w)[None]
    pos_x = jnp.clip(pos[..., 0], -float(m), float(w + m))
    pos_y = jnp.clip(pos[..., 1], -float(m), float(h + m))

    pad_t = pad_l = 2 * r + 5
    pad_b = m - r + 15
    pad_r = m - r - 1 + taps
    hp, wp = h + pad_t + pad_b, w + pad_l + pad_r
    # lane-dim alignment: keep wp*c % 128 == 0; extra right padding is
    # never addressed (tap bases are clamped well inside)
    wp = ((wp + gpx - 1) // gpx) * gpx
    pad_r = wp - w - pad_l

    x0 = jnp.floor(pos_x)
    y0 = jnp.floor(pos_y)
    tx = pos_x - x0
    ty = pos_y - y0
    xb = x0.astype(jnp.int32) - r - 1 + pad_l  # leftmost tap, padded coords
    yb = y0.astype(jnp.int32) - r - 1 + pad_t
    xa = (xb // gpx) * gpx
    s = xb - xa  # in [0, gpx)

    # group size: pixels per kernel loop iteration ("g16"/"g32" variants);
    # a trailing "s" ("g16s"/"g32s") selects the shifted-output kernel
    shifted = variant.startswith("g") and variant.endswith("s")
    core = variant[:-1] if shifted else variant
    gsz = int(core[1:]) if core.startswith("g") else 8
    assert not shifted or gsz >= 16, "shifted output needs gsz >= 16 (out-lane stride)"

    # Pad the pixel axis to a multiple of the pixel group (bases point at
    # the always-valid padded origin; results are sliced off).
    wk = ((w + gsz - 1) // gsz) * gsz
    if wk != w:
        pad_px = ((0, 0), (0, 0), (0, wk - w))
        yb_k = jnp.pad(yb, pad_px)
        xa_k = jnp.pad(xa, pad_px)
        s_k = jnp.pad(s, pad_px)
        q_px = jnp.pad(q, ((0, 0), (0, 0), (0, wk - w), (0, 0)))
    else:
        yb_k, xa_k, s_k = yb, xa, s
        q_px = q

    # group-major replicated query: row i of group g is pixel (g*gsz+i)'s
    # (taps × c) replication — the kernel loads one (gsz, 256) slice per group
    q_rep = jnp.broadcast_to(
        q_px[:, :, :, None, :], (b, h, wk, taps, c)
    ).reshape(b, h, wk // gsz, gsz, _LANES)
    q_rep = jnp.transpose(q_rep, (0, 1, 3, 2, 4)).reshape(b, h, gsz * (wk // gsz) * _LANES)

    if variant.startswith("v2"):
        # "v2" = double-buffered; "v2n<k>" = k scratch buffers (deeper prefetch)
        nbuf = int(variant[3:]) if len(variant) > 3 else 2
        # HBM row-shifted stack: f8[s, r, :] = f_pad[r + s, :]; a pixel's 8
        # window rows [yb, yb+8) are ONE 8-aligned (8, 256) block at
        # rowidx = (yb & 7) * hp8 + ((yb >> 3) << 3) in the flattened stack.
        hp8 = ((hp + 7) // 8) * 8
        f_pad2 = jnp.pad(f, ((0, 0), (pad_t, pad_b + (hp8 - hp) + 7), (pad_l, pad_r), (0, 0)))
        f_pad2 = f_pad2.reshape(b, hp8 + 7, wp * c)
        f8 = jnp.stack([f_pad2[:, s : s + hp8] for s in range(8)], axis=1)
        f8 = f8.reshape(b, 8 * hp8, wp * c)
        rowidx = (yb_k & 7) * hp8 + ((yb_k >> 3) << 3)
        dots = _dots8(
            rowidx,
            xa_k * c,
            f8,
            q_rep,
            h=h,
            w=w,
            c=c,
            hp8=hp8,
            wp=wp,
            taps=taps,
            precision=precision,
            interpret=bool(interpret),
            nbuf=nbuf,
        )
    else:
        f_pad = jnp.pad(f, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
        f_pad = f_pad.reshape(b, hp, wp * c)
        dots = _dots16(
            yb_k,
            xa_k * c + s_k if shifted else xa_k * c,
            f_pad,
            q_rep,
            h=h,
            w=w,
            c=c,
            hp=hp,
            wp=wp,
            taps=taps,
            precision=precision,
            interpret=bool(interpret),
            gsz=gsz,
            shifted=shifted,
        )
    out_t = 8 if shifted else taps
    dots = dots.reshape(b, h, 8, wk, out_t)[:, :, :, :w, :]
    dots = jnp.transpose(dots, (0, 1, 3, 2, 4))  # (B, H, W, 8, out_t)

    wx = jnp.stack(cubic_weights(tx), axis=-1)  # (B, H, W, 4)
    wy = jnp.stack(cubic_weights(ty), axis=-1)

    if shifted:
        # taps arrive pre-aligned (tap u = window position u): the separable
        # bicubic combination is 4+4 static-slice multiply-adds — no
        # per-pixel one-hot weight tensors (same structure as the XLA fused
        # path, ops/refinement.py)
        sx = sum(
            wx[..., mm, None, None] * jax.lax.dynamic_slice_in_dim(dots, mm, p, axis=4)
            for mm in range(4)
        )  # (B, H, W, 8, P)
        scores = sum(
            wy[..., ll, None, None] * jax.lax.dynamic_slice_in_dim(sx, ll, p, axis=3)
            for ll in range(4)
        )
        return scores  # (B, H, W, P, P) [i=y, j=x]

    # Separable bicubic combination. x taps carry the per-pixel aligned-base
    # shift s: scores_x[j] = Σ_m wx_m · dots[..., s + j + m].
    it = jnp.arange(taps, dtype=jnp.int32)
    ij = jnp.arange(p, dtype=jnp.int32)
    # (B, H, W, taps, P): weight of tap t toward window column j
    wxm = jnp.zeros((b, h, w, taps, p), jnp.float32)
    for mm in range(4):
        hit = (it[:, None] == (s[..., None, None] + ij[None, :] + mm)).astype(jnp.float32)
        wxm = wxm + wx[..., mm, None, None] * hit
    scores_x = jnp.einsum("bhwvt,bhwtj->bhwvj", dots, wxm)

    iv = jnp.arange(8, dtype=jnp.int32)
    wym = jnp.zeros((b, h, w, 8, p), jnp.float32)
    for ll in range(4):
        hit = (iv[:, None] == (ij[None, :] + ll)).astype(jnp.float32)
        wym = wym + wy[..., ll, None, None] * hit
    scores = jnp.einsum("bhwvj,bhwvi->bhwij", scores_x, wym)
    return scores  # (B, H, W, P, P)
