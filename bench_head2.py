"""Attribute the head stage inside the FULL flagship graph: time the base
model with (a) both heads, (b) flow head only (has_uncertainty_head=False),
all at b4 560x420. Complements bench_head.py (isolated-head numbers)."""

import json
import time

import numpy as np

B = 4


def _sync(out):
    x = out["flow"] if isinstance(out, dict) else out
    return float(np.asarray(x[(0,) * x.ndim]))


def median_dispatch(fn, args, reps=7):
    _ = _sync(fn(*args))
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_base_config

    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.standard_normal((B, 420, 560, 3)), jnp.float32)
    i2 = jnp.asarray(rng.standard_normal((B, 420, 560, 3)), jnp.float32)

    trivial = jax.jit(lambda x: x * 2.0)
    tunnel = median_dispatch(trivial, (i1[:1, :2, :2, 0],), reps=10)
    print(f"tunnel {tunnel:.1f} ms", flush=True)

    results = {"tunnel_ms": round(tunnel, 1), "batch": B}
    for name, cfg in [
        ("full", ufm_base_config()),
        ("flow_head_only", ufm_base_config(has_uncertainty_head=False, uncertainty_adaptors_kwargs={})),
    ]:
        net = UFMNet(cfg)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), i1, i2)["params"]

        @jax.jit
        def fwd(p, a, b, _net=net):
            return _net.apply({"params": p}, a, b)

        results[name] = round(median_dispatch(fwd, (params, i1, i2)) - tunnel, 1)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
