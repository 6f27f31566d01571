"""Classification-refinement ops: neighborhood sampling + 1xP² attention.

Re-creates the math of the reference refinement stage
(uniflowmatch/models/ufm.py:1041-1178): around each pixel's predicted target
location, sample a P×P window of target-view features with *bicubic*
interpolation (zeros padding, align_corners=False), correlate with the
source-view feature (1×P² attention with temperature + learned bias), and
output the attention-weighted integer-offset residual plus the log-softmax.

TPU-first design — the fused path never materializes the (B, H, W, P, P, C)
neighborhood tensor the reference builds (ufm.py:1145, 1164-1173):

  score(Δ) = q · K(Δ)            with   K(Δ) = Σ_kl w_k w_l · F[x0+Δx+k, y0+Δy+l]

is bilinear in the (P+3)² integer taps, so we gather each tap once, reduce it
against q immediately (a (B,H,W) scalar per tap), and form all P² scores by
separable 4-tap cubic combination of those scalars. Peak memory drops from
O(B·H·W·P²·C) to O(B·H·W·(P+3)²) and the work becomes gathers + einsums that
XLA fuses; bicubic weights are computed once per pixel (they are shared by
the whole window — the coordinates differ by integers).

All arrays channel-last; positions in pixel-index space (integer pixel
centers), matching the reference's grid normalization which maps index c to
sample position c exactly (ufm.py:1164-1166).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ufm_tpu.ops.grid_sample import cubic_weights, grid_sample

__all__ = [
    "base_grid",
    "neighborhood_offsets_xy",
    "obtain_neighborhood_features",
    "refinement_attention",
    "fused_refinement_attention",
]


def base_grid(h: int, w: int) -> jnp.ndarray:
    """(H, W, 2) xy integer pixel grid (reference get_meshgrid_torch)."""
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    return jnp.asarray(np.stack([xs, ys], axis=-1))


def neighborhood_offsets_xy(p: int) -> jnp.ndarray:
    """(P, P, 2) xy offsets in reference (i, j) row-major order: entry [i, j]
    is (j - R, i - R) — the flow-residual values V of the attention
    (ufm.py:1149-1152, 1175-1176)."""
    r = (p - 1) // 2
    i, j = np.meshgrid(np.arange(p) - r, np.arange(p) - r, indexing="ij")
    return jnp.asarray(np.stack([j, i], axis=-1).astype(np.float32))


def obtain_neighborhood_features(
    flow: jnp.ndarray, other_features: jnp.ndarray, local_patch: int = 5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-semantics neighborhood sampler (materializing path).

    flow: (B, H, W, 2) xy; other_features: (B, H, W, C).
    Returns (features (B, H, W, P, P, C), offsets_xy (1, 1, 1, P, P, 2)).
    Used as the verification reference for the fused path and for API parity
    with ufm.py:1112-1178.
    """
    assert local_patch % 2 == 1, "local_patch must be odd"
    p = local_patch
    b, h, w, _ = other_features.shape

    pos = flow + base_grid(h, w)[None]  # (B, H, W, 2) xy
    offs = neighborhood_offsets_xy(p)  # (P, P, 2)
    coords = pos[:, :, :, None, None, :] + offs[None, None, None]  # (B,H,W,P,P,2)

    # normalize to the reference grid convention: index c samples position c
    norm = jnp.asarray([w, h], dtype=jnp.float32)
    grid = (coords + 0.5) / norm * 2.0 - 1.0
    feats = grid_sample(other_features, grid, mode="bicubic")
    return feats, offs[None, None, None]


def refinement_attention(
    query_features: jnp.ndarray,
    neighborhood_features: jnp.ndarray,
    neighborhood_residual: jnp.ndarray,
    classification_bias: jnp.ndarray,
    temperature: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-semantics attention over sampled neighborhoods.

    query_features: (B, H, W, C); neighborhood_features: (B, H, W, P, P, C);
    neighborhood_residual: broadcastable (..., P, P, 2);
    classification_bias: (P*P,). Returns (residual (B, H, W, 2),
    log_softmax (B, H, W, P, P)). Port of ufm.py:1041-1095.
    """
    b, h, w, p, _, _ = neighborhood_features.shape
    scores = jnp.einsum("bhwc,bhwijc->bhwij", query_features, neighborhood_features)
    scores = scores / temperature + classification_bias.reshape(p, p)

    flat = scores.reshape(b, h, w, p * p)
    attn = jax.nn.softmax(flat, axis=-1)
    log_softmax = jax.nn.log_softmax(flat, axis=-1).reshape(b, h, w, p, p)

    offs = jnp.broadcast_to(neighborhood_residual, (1, 1, 1, p, p, 2)).reshape(1, 1, 1, p * p, 2)
    residual = jnp.einsum("bhwk,xyzkd->bhwd", attn, offs)
    return residual, log_softmax


def _window_dots(
    q: jnp.ndarray,
    f: jnp.ndarray,
    x_base: jnp.ndarray,
    y_base: jnp.ndarray,
    k: int,
) -> jnp.ndarray:
    """q · F[tap] for each pixel's K×K integer tap window, zeros padding.

    q: (B, H, W, C); f: (B, H, W, C); x_base/y_base: (B, H, W) int32 leftmost
    /topmost tap. Returns (B, H, W, K, K) float32.

    One vector gather + reduce per tap position: peak memory is O(B·H·W·C)
    per tap plus the O(B·H·W·K²) scalar grid — never the K²×C window tensor.
    (A contiguous (K,K,C) patch-slice gather variant was measured ~2× slower
    on TPU — XLA scalarizes both, and per-tap keeps the reduction fused.)
    """
    b, h, w, c = f.shape
    flat = f.reshape(b, h * w, c)

    ix_valid = []
    ix_lin = []
    for u in range(k):
        ix_u = x_base + u
        ix_valid.append((ix_u >= 0) & (ix_u < w))
        ix_lin.append(jnp.clip(ix_u, 0, w - 1))

    dot_rows = []
    for v in range(k):
        iy_v = y_base + v
        y_ok = (iy_v >= 0) & (iy_v < h)
        y_lin = jnp.clip(iy_v, 0, h - 1) * w
        row = []
        for u in range(k):
            lin = y_lin + ix_lin[u]
            tap = jnp.take_along_axis(flat, lin.reshape(b, -1)[..., None], axis=1)
            tap = tap.reshape(b, h, w, c)
            d = jnp.einsum("bhwc,bhwc->bhw", q, tap)
            row.append(jnp.where(y_ok & ix_valid[u], d, 0.0))
        dot_rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(dot_rows, axis=-2)  # (B, H, W, Ky, Kx)


def fused_refinement_attention(
    query_features: jnp.ndarray,
    target_features: jnp.ndarray,
    flow: jnp.ndarray,
    classification_bias: jnp.ndarray,
    temperature: float,
    local_patch: int = 5,
    impl: str = "auto",
    precision: str = "default",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused sampler+attention (no neighborhood materialization).

    query_features / target_features: (B, H, W, C); flow: (B, H, W, 2) xy;
    classification_bias: (P*P,). Returns (residual (B, H, W, 2),
    log_softmax (B, H, W, P, P)) — numerically equal to the
    obtain_neighborhood_features + refinement_attention composition.

    ``impl``: "xla" (portable reference path), "pallas" (TPU window-dots
    kernel, ops/window_dots.py; same math, backward runs the XLA VJP), or
    "auto" (pallas on TPU when the shape qualifies). Env override:
    ``UFM_REFINE_IMPL``. ``precision``: MXU precision of the kernel's
    selection matmul, "default" (bf16 rounding, ~25% faster; refined-flow
    drift ≤0.025 px max at flagship shapes) or "highest" (fp32); env
    override ``UFM_REFINE_PRECISION``.
    """
    impl = os.environ.get("UFM_REFINE_IMPL", impl)
    precision = os.environ.get("UFM_REFINE_PRECISION", precision)
    if impl == "auto":
        from ufm_tpu.ops.window_dots import supports_pallas_window

        _, fh, fw, fc = target_features.shape
        impl = (
            "pallas"
            if jax.default_backend() == "tpu"
            and supports_pallas_window(fc, local_patch, h=fh, w=fw)
            else "xla"
        )
    if impl == "pallas":
        return _fused_refinement_pallas(
            query_features.astype(jnp.float32),
            target_features.astype(jnp.float32),
            flow.astype(jnp.float32),
            classification_bias,
            float(temperature),
            int(local_patch),
            str(precision),
        )
    return _fused_refinement_xla(
        query_features, target_features, flow, classification_bias, temperature, local_patch
    )


def _scores_tail(
    scores: jnp.ndarray, classification_bias: jnp.ndarray, temperature: float, p: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared tail: raw window scores -> (residual, log_softmax)."""
    b, h, w = scores.shape[:3]
    scores = scores / temperature + classification_bias.reshape(p, p)
    flat_scores = scores.reshape(b, h, w, p * p)
    attn = jax.nn.softmax(flat_scores, axis=-1)
    log_softmax = jax.nn.log_softmax(flat_scores, axis=-1).reshape(b, h, w, p, p)
    offs = neighborhood_offsets_xy(p).reshape(p * p, 2)
    residual = attn @ offs
    return residual, log_softmax


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_refinement_pallas(query_features, target_features, flow, bias, temperature, p, precision):
    import jax.lax as lax

    from ufm_tpu.ops.window_dots import window_scores_pallas

    prec = lax.Precision.HIGHEST if precision == "highest" else lax.Precision.DEFAULT
    scores = window_scores_pallas(query_features, target_features, flow, p, precision=prec)
    return _scores_tail(scores, bias, temperature, p)


def _fused_refinement_pallas_fwd(query_features, target_features, flow, bias, temperature, p, precision):
    out = _fused_refinement_pallas(
        query_features, target_features, flow, bias, temperature, p, precision
    )
    return out, (query_features, target_features, flow, bias)


def _fused_refinement_pallas_bwd(temperature, p, precision, residuals, cotangents):
    q, f, flow, bias = residuals
    _, vjp = jax.vjp(
        lambda q_, f_, flow_, bias_: _fused_refinement_xla(q_, f_, flow_, bias_, temperature, p),
        q,
        f,
        flow,
        bias,
    )
    return vjp(cotangents)


_fused_refinement_pallas.defvjp(_fused_refinement_pallas_fwd, _fused_refinement_pallas_bwd)


def _fused_refinement_xla(
    query_features: jnp.ndarray,
    target_features: jnp.ndarray,
    flow: jnp.ndarray,
    classification_bias: jnp.ndarray,
    temperature: float,
    local_patch: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    assert local_patch % 2 == 1, "local_patch must be odd"
    p = local_patch
    r = (p - 1) // 2
    k = p + 3  # integer tap span per axis
    b, h, w, c = target_features.shape

    q = query_features.astype(jnp.float32)
    f = target_features.astype(jnp.float32)

    pos = flow.astype(jnp.float32) + base_grid(h, w)[None]
    x0 = jnp.floor(pos[..., 0])
    y0 = jnp.floor(pos[..., 1])
    tx = pos[..., 0] - x0
    ty = pos[..., 1] - y0
    x_base = x0.astype(jnp.int32) - r - 1  # leftmost integer tap
    y_base = y0.astype(jnp.int32) - r - 1

    wx = jnp.stack(cubic_weights(tx), axis=-1)  # (B, H, W, 4)
    wy = jnp.stack(cubic_weights(ty), axis=-1)

    dots = _window_dots(q, f, x_base, y_base, k)  # (B, H, W, Ky, Kx)

    # separable cubic combination: scores[i, j] = Σ_l Σ_m wy[l] wx[m] dots[i+l, j+m]
    # combine x first: (B,H,W,Ky,Kx) -> (B,H,W,Ky,P)
    sx = sum(wx[..., None, m, None] * jax.lax.dynamic_slice_in_dim(dots, m, p, axis=4) for m in range(4))
    # then y: -> (B,H,W,P,P) indexed [i, j] = (row offset i-R, col offset j-R)
    scores = sum(wy[..., l, None, None] * jax.lax.dynamic_slice_in_dim(sx, l, p, axis=3) for l in range(4))

    return _scores_tail(scores, classification_bias, temperature, p)
