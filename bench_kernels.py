"""Kernel microbenchmarks on the real TPU (scan-delta on-chip timing).

Times the Pallas flash-attention variants at the flagship model's shapes and
the window-dots refinement kernel, reporting on-chip ms and effective TFLOPS
(useful FLOPs / time; the d=64 attention hardware ceiling on v5e is ~half the
197 TFLOP/s bf16 peak — see BENCH_NOTES.md). Methodology: scan-of-N inside
one jit at two lengths; the dispatch/tunnel constant cancels in the delta
(memory: ufm-tpu-bench-methodology).

Usage: python bench_kernels.py [attn|window|all] (default all)
"""

import json
import os
import sys
import time

import numpy as np


def onchip_seconds(make_scan, n1=2, n2=6, reps=5):
    """make_scan(n) -> jitted zero-arg-result callable returning a scalar."""
    run1, run2 = make_scan(n1), make_scan(n2)
    float(np.asarray(run1()))  # compile (block_until_ready doesn't block on axon)
    float(np.asarray(run2()))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run1()))
        t1 = time.perf_counter()
        float(np.asarray(run2()))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return float(np.median(deltas))


def bench_attention():
    import jax
    import jax.numpy as jnp

    from ufm_tpu.ops.flash_attention import flash_attention

    shapes = [
        ("encoder b4 (2B=8, S1200, H16, D64)", (8, 1200, 16, 64)),
        ("info-share b4 (4, S2400, H12, D64)", (4, 2400, 12, 64)),
    ]
    variants = sys.argv[2:] if len(sys.argv) > 2 else ["base", "opt", "opt2", "opt4"]
    out = {}
    for label, (b, s, h, d) in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        flops = 4 * b * h * s * s * d
        for vname in variants:
            # "opt@640" = variant opt with block_q 640
            variant, block_q = vname, None
            if "@" in vname:
                variant, bq = vname.split("@")
                block_q = int(bq)

            def make_scan(n, variant=variant, block_q=block_q):
                @jax.jit
                def run():
                    def body(carry, _):
                        o = flash_attention(
                            q + carry * 1e-12, k, v, variant=variant, block_q=block_q
                        )
                        return jnp.sum(o[:, ::311, 0, 0].astype(jnp.float32)), None

                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                    return acc

                return run

            try:
                sec = onchip_seconds(make_scan)
                tflops = flops / sec / 1e12
                out[f"{label} [{vname}]"] = {"ms": round(sec * 1e3, 3), "TFLOPS": round(tflops, 1)}
                print(f"{label} [{vname}]: {sec*1e3:.3f} ms  {tflops:.1f} TFLOPS", flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"{label} [{vname}]"] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
                print(out[f"{label} [{vname}]"], flush=True)
    return out


def bench_attention_bwd():
    """Attention forward+backward at the flagship TRAINING shapes (b2):
    Pallas flash backward vs the XLA einsum VJP it replaces (VERDICT r4 #1).
    Reported FLOPs are fwd (4·B·H·S²·D, once) + bwd (10·B·H·S²·D: recompute
    + 4 gradient matmuls)."""
    import jax
    import jax.numpy as jnp

    from ufm_tpu.ops import flash_attention as fa

    shapes = [
        ("train-encoder (2B=4, S1200, H16, D64)", (4, 1200, 16, 64)),
        ("train-infoshare (2, S2400, H12, D64)", (2, 2400, 12, 64)),
    ]
    modes = sys.argv[2:] if len(sys.argv) > 2 else ["pallas", "xla"]
    out = {}
    for label, (b, s, h, d) in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        flops = (4 + 10) * b * h * s * s * d
        for mode in modes:
            os.environ["UFM_ATTN_BWD"] = mode

            def make_scan(n):
                def loss(q_, k_, v_):
                    o = fa.flash_attention(q_, k_, v_)
                    return jnp.sum(o[:, ::311, 0, 0].astype(jnp.float32))

                grad = jax.grad(loss, argnums=(0, 1, 2))

                @jax.jit
                def run():
                    def body(carry, _):
                        # keep the perturbation in q's dtype: the f32 carry
                        # would otherwise promote the whole measurement to f32
                        dq, dk, dv = grad(q + (carry * 1e-12).astype(q.dtype), k, v)
                        return jnp.sum(dq[:, ::311, 0, 0].astype(jnp.float32)), None

                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                    return acc

                return run

            try:
                sec = onchip_seconds(make_scan)
                tflops = flops / sec / 1e12
                out[f"{label} [bwd={mode}]"] = {"ms": round(sec * 1e3, 3), "TFLOPS": round(tflops, 1)}
                print(f"{label} [bwd={mode}]: {sec*1e3:.3f} ms  {tflops:.1f} TFLOPS", flush=True)
            except Exception as e:  # noqa: BLE001
                out[f"{label} [bwd={mode}]"] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
                print(out[f"{label} [bwd={mode}]"], flush=True)
            finally:
                os.environ.pop("UFM_ATTN_BWD", None)
    return out


def bench_window():
    import jax
    import jax.numpy as jnp

    from ufm_tpu.ops.window_dots import window_scores_pallas

    b, h, w, c, p = 4, 420, 560, 16, 5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((b, h, w, 2)) * 30, jnp.float32)

    out = {}
    prec = jax.lax.Precision.DEFAULT
    variants = sys.argv[2:] if len(sys.argv) > 2 else ["v1", "v2"]
    for vname in variants:

        def make_scan(n, variant=vname):
            @jax.jit
            def run():
                def body(carry, _):
                    s = window_scores_pallas(
                        q, f, flow + carry * 1e-12, p, precision=prec, variant=variant
                    )
                    return jnp.sum(s[:, ::97, ::97, 0, 0]), None

                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return acc

            return run

        try:
            sec = onchip_seconds(make_scan)
            out[f"window_scores b4 420x560 C16 [{vname}]"] = {"ms": round(sec * 1e3, 2)}
            print(f"window_scores b4 [{vname}]: {sec*1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"window_scores [{vname}]"] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
            print(out[f"window_scores [{vname}]"], flush=True)
    return out


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    results = {}
    if which in ("attn", "all"):
        results["attention"] = bench_attention()
    if which in ("attnbwd", "all"):
        results["attention_bwd"] = bench_attention_bwd()
    if which in ("window", "all"):
        results["window"] = bench_window()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
