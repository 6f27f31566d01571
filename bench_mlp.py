"""Transformer MLP sub-block on the real TPU: GELU evaluator comparison.

Measures the residual-MLP sub-block of a transformer layer at the flagship
encoder/info-share shapes:

    y = x + gamma * ( GELU( LN(x) @ W1 + b1 ) @ W2 + b2 )

with the three GELU evaluators: XLA's erfc expansion (the reference-exact
default through round 2), ops/gelu.py's polynomial erfc (bf16-bitwise-equal,
the round-3 production default), and the tanh approximation (the non-parity
speed bound).

A fused Pallas kernel for this block (weights VMEM-resident, hidden tile
never leaving VMEM, hidden-chunked MXU/VPU software pipeline) was built and
measured SLOWER than the XLA formulation on every variant — serial 1.462 ms,
pipe4 1.406 ms, pipe8 1.444 ms vs XLA+fast-GELU 1.120 ms at the encoder
shape (T9600, 1024->4096) — XLA's own fusion of LN/bias/GELU into the
matmuls is already better than a hand-scheduled grid here, so the kernel was
dropped (BENCH_NOTES.md round 3).

Usage: python bench_mlp.py
"""

import functools
import json

import numpy as np

from bench_kernels import onchip_seconds

SHAPES = [
    # label, tokens, model dim, hidden
    ("encoder b4 (T9600, 1024->4096)", 9600, 1024, 4096),
    ("info-share b4 (T9600, 768->3072)", 9600, 768, 3072),
]


def make_inputs(t, c, hdim, dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, hdim)) * 0.02, dtype)
    b1 = jnp.asarray(rng.standard_normal((hdim,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hdim, c)) * 0.02, dtype)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
    lns = jnp.asarray(1 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    gamma = jnp.asarray(1e-1 * rng.standard_normal((c,)), jnp.float32)
    return x, w1, b1, w2, b2, lns, lnb, gamma


def xla_mlp(x, w1, b1, w2, b2, lns, lnb, gamma, act):
    """Mirrors the flax chain: LN stats fp32, single rounding to bf16, Dense
    bf16 matmuls with fp32 params cast (here weights already bf16)."""
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum(0.0, (xf * xf).mean(-1, keepdims=True) - mu * mu)
    import jax

    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb).astype(x.dtype)
    h = (h @ w1 + b1.astype(x.dtype)).astype(x.dtype)
    h = act(h)
    h = (h @ w2 + b2.astype(x.dtype)).astype(x.dtype)
    return x + (h * gamma.astype(x.dtype))


def bench_xla():
    import jax
    import jax.numpy as jnp

    from ufm_tpu.ops.gelu import fast_exact_gelu

    acts = {
        "erfc": functools.partial(jax.nn.gelu, approximate=False),
        "fast": fast_exact_gelu,
        "tanh": jax.nn.gelu,
    }
    out = {}
    for label, t, c, hdim in SHAPES:
        args = make_inputs(t, c, hdim, jnp.bfloat16)
        flops = 2 * 2 * t * c * hdim
        for aname, act in acts.items():

            def make_scan(n, act=act):
                @jax.jit
                def run():
                    def body(carry, _):
                        y = xla_mlp(*((args[0] + carry.astype(jnp.bfloat16) * 0,) + args[1:]), act)
                        return carry + y[0, 0].astype(jnp.float32), None

                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                    return acc

                return run

            sec = onchip_seconds(make_scan)
            out[f"{label} xla[{aname}]"] = {
                "ms": round(sec * 1e3, 3),
                "TFLOPS": round(flops / sec / 1e12, 1),
            }
            print(f"{label} xla[{aname}]: {sec*1e3:.3f} ms {flops/sec/1e12:.1f} TF", flush=True)
    return out


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    print(json.dumps({"xla": bench_xla()}, indent=1))


if __name__ == "__main__":
    main()
