"""Refine-variant performance investigation (round 2).

Attributes the round-1 gap between the refine stage-sum (~160 ms/b2) and the
fused full forward (~395 ms/b2), and A/B-tests window-gather formulations on
the TPU. Methodology: scan-inside-jit with a data-dependent carry (defeats
CSE) + scalar fetch to sync (axon `block_until_ready` is a no-op).

Usage: python bench_refine.py [ablate|gather|full]
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C, P = 2, 420, 560, 16, 5
ITERS = 4


def timed_scan(fn, args, iters=ITERS, warmup=True):
    """Median per-iteration seconds of fn(*args) via lax.scan inside one jit."""

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(*a, carry)
            return out, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    r = run(*args)
    _ = float(np.asarray(r))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(*args)
        _ = float(np.asarray(r))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def timed_delta(fn, args, n1=1, n2=2, reps=5):
    """Per-iteration seconds via the difference of two scan lengths — the
    dispatch/tunnel constant cancels; graphs stay small enough for the
    remote compiler."""

    def make(n):
        @jax.jit
        def run(*a):
            def body(carry, _):
                return fn(*a, carry), ()

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        return run

    r1, r2 = make(n1), make(n2)
    _ = float(np.asarray(r1(*args)))
    _ = float(np.asarray(r2(*args)))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(r1(*args)))
        t1 = time.perf_counter()
        _ = float(np.asarray(r2(*args)))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(deltas))


def make_inputs(seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
    f = jax.random.normal(ks[1], (B, H, W, C), jnp.float32)
    flow = jax.random.normal(ks[2], (B, H, W, 2), jnp.float32) * 30.0
    bias = jax.random.normal(ks[3], (P * P,), jnp.float32)
    return q, f, flow, bias


# --------------------------------------------------------------------------
# gather formulations for the (B,H,W) x K x K window dots
# --------------------------------------------------------------------------
def dots_per_tap(q, f, x_base, y_base, k):
    """Round-1 default: one take_along_axis per tap (k^2 gathers)."""
    from ufm_tpu.ops.refinement import _window_dots

    return _window_dots(q, f, x_base, y_base, k)


def dots_one_big_gather(q, f, x_base, y_base, k):
    """All k^2 taps in ONE gather call: indices (B, H*W*k*k)."""
    b, h, w, c = f.shape
    flat = f.reshape(b, h * w, c)
    u = jnp.arange(k, dtype=jnp.int32)
    ix = x_base[..., None] + u  # (B,H,W,K)
    iy = y_base[..., None] + u
    x_ok = (ix >= 0) & (ix < w)
    y_ok = (iy >= 0) & (iy < h)
    lin = jnp.clip(iy, 0, h - 1)[..., :, None] * w + jnp.clip(ix, 0, w - 1)[..., None, :]
    taps = jnp.take_along_axis(flat, lin.reshape(b, -1)[..., None], axis=1)
    taps = taps.reshape(b, h, w, k, k, c)
    d = jnp.einsum("bhwc,bhwvuc->bhwvu", q, taps)
    return jnp.where(y_ok[..., :, None] & x_ok[..., None, :], d, 0.0)


def dots_row_slice(q, f, x_base, y_base, k):
    """k gathers of row-contiguous (k*C) slices from a zero-padded map.

    Pad by k per side; in-window taps then sit at exact positions (no
    realignment) and fully-out-of-range windows clip to the pad (masked
    anyway). Each gather is one dynamic (1, k*C) slice per pixel.
    """
    b, h, w, c = f.shape
    fp = jnp.pad(f, ((0, 0), (k, k), (k, k), (0, 0)))
    wp = w + 2 * k
    fp_rows = fp.reshape(b, h + 2 * k, wp * c)

    u = jnp.arange(k, dtype=jnp.int32)
    ix = x_base[..., None] + u
    iy = y_base[..., None] + u
    x_ok = (ix >= 0) & (ix < w)
    y_ok = (iy >= 0) & (iy < h)

    x_start = jnp.clip(x_base + k, 0, wp - k)  # (B,H,W)
    rows = []
    for v in range(k):
        y_v = jnp.clip(y_base + v + k, 0, h + 2 * k - 1)
        # start index per pixel into (rows, wp*c): dynamic-slice gather of k*c
        starts = jnp.stack([y_v.reshape(b, -1), (x_start * c).reshape(b, -1)], axis=-1)
        sliced = jax.vmap(
            lambda op, st: jax.lax.gather(
                op,
                st,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(1, k * c),
                mode=jax.lax.GatherScatterMode.CLIP,
            )
        )(fp_rows, starts)
        taps = sliced.reshape(b, h, w, k, c)
        d = jnp.einsum("bhwc,bhwuc->bhwu", q, taps)
        rows.append(jnp.where(y_ok[..., v, None] & x_ok, d, 0.0))
    return jnp.stack(rows, axis=-2)  # (B,H,W,Ky,Kx)


def scores_from_dots(dots_fn, q, f, flow, bias, carry):
    from ufm_tpu.ops.grid_sample import cubic_weights
    from ufm_tpu.ops.refinement import base_grid, neighborhood_offsets_xy

    p = P
    r = (p - 1) // 2
    k = p + 3
    b, h, w, c = f.shape
    q = q + carry  # data dependence to defeat CSE across scan iterations
    pos = flow + base_grid(h, w)[None]
    x0 = jnp.floor(pos[..., 0])
    y0 = jnp.floor(pos[..., 1])
    wx = jnp.stack(cubic_weights(pos[..., 0] - x0), axis=-1)
    wy = jnp.stack(cubic_weights(pos[..., 1] - y0), axis=-1)
    x_base = x0.astype(jnp.int32) - r - 1
    y_base = y0.astype(jnp.int32) - r - 1

    dots = dots_fn(q, f, x_base, y_base, k)
    sx = sum(wx[..., None, m, None] * jax.lax.dynamic_slice_in_dim(dots, m, p, axis=4) for m in range(4))
    scores = sum(wy[..., le, None, None] * jax.lax.dynamic_slice_in_dim(sx, le, p, axis=3) for le in range(4))
    scores = scores / 4.0 + bias.reshape(p, p)
    attn = jax.nn.softmax(scores.reshape(b, h, w, p * p), axis=-1)
    res = attn @ neighborhood_offsets_xy(p).reshape(p * p, 2)
    return jnp.sum(res) * 1e-6


def bench_gather():
    # correctness first, on small shapes (cheap compile)
    global B, H, W, C
    B0, H0, W0, C0 = B, H, W, C
    B, H, W, C = 1, 36, 48, 8
    qs, fs, flows, biass = make_inputs(1)
    ref = scores_from_dots(dots_per_tap, qs, fs, flows, biass, jnp.float32(0.0))
    for name, fn in [("one_big", dots_one_big_gather), ("row_slice", dots_row_slice)]:
        got = scores_from_dots(fn, qs, fs, flows, biass, jnp.float32(0.0))
        err = abs(float(np.asarray(got)) - float(np.asarray(ref)))
        print(f"correctness {name}: |err|={err:.2e}", flush=True)
        assert err < 1e-3, name
    B, H, W, C = B0, H0, W0, C0

    q, f, flow, bias = make_inputs()
    results = {}
    for name, fn in [
        ("per_tap_64_gathers", dots_per_tap),
        ("row_slice_8_gathers", dots_row_slice),
        ("one_big_gather", dots_one_big_gather),
    ]:
        try:
            t = timed_scan(functools.partial(scores_from_dots, fn, q, f, flow, bias), ())
            results[name] = round(t * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = f"FAILED: {type(e).__name__}: {str(e)[:120]}"
        print(name, results[name], flush=True)
    print(json.dumps({"gather_ms_b2": results}))


# --------------------------------------------------------------------------
# full-forward ablations
# --------------------------------------------------------------------------
def bench_ablate():
    """Attribute the stage-sum vs fused-forward gap by swapping the
    refinement op inside the full graph (monkeypatching the symbol
    network.py imported)."""
    import ufm_tpu.models.network as network_mod
    from ufm_tpu.models import UFMNet, ufm_refine_config
    from ufm_tpu.ops.refinement import fused_refinement_attention

    cfg = ufm_refine_config()
    net = UFMNet(cfg)
    img = jnp.zeros((B, 420, 560, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]

    i1 = jax.random.normal(jax.random.PRNGKey(1), (B, 420, 560, 3), jnp.float32)
    i2 = jax.random.normal(jax.random.PRNGKey(2), (B, 420, 560, 3), jnp.float32)

    def refine_zeros(q, f, flow, bias, temp, p):
        b, h, w, _ = q.shape
        return jnp.zeros((b, h, w, 2), q.dtype), jnp.zeros((b, h, w, p, p), q.dtype)

    def refine_barrier(q, f, flow, bias, temp, p):
        q, f, flow = jax.lax.optimization_barrier((q, f, flow))
        return fused_refinement_attention(q, f, flow, bias, temp, p)

    modes = {
        "full": fused_refinement_attention,
        "barrier": refine_barrier,
        "no_refine": refine_zeros,
    }
    results = {}
    for mode, op in modes.items():
        network_mod.fused_refinement_attention = op

        def fwd(a, b_, carry):
            out = net.apply({"params": params}, a + carry, b_)
            return jnp.sum(out["flow"][:, ::64, ::64]) * 1e-6

        try:
            t = timed_delta(fwd, (i1, i2))
            results[mode] = round(t * 1e3, 1)
        except Exception as e:  # noqa: BLE001
            results[mode] = f"FAILED: {type(e).__name__}: {str(e)[:100]}"
        print(mode, results[mode], "ms/b2", flush=True)
    network_mod.fused_refinement_attention = fused_refinement_attention
    print(json.dumps(results))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gather"
    print(f"devices: {jax.devices()}", flush=True)
    if which == "gather":
        bench_gather()
    elif which == "ablate":
        bench_ablate()
