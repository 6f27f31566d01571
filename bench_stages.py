"""Base-model stage attribution on the TPU: encoder / info-sharing / heads.

Times nested prefixes of the flagship confidence forward (encode-only,
encode+info, full) as separate jitted programs; stage costs are the deltas.
Same dispatch-minus-tunnel methodology as bench_refine_modes.py.
"""

import json
import os
import time

import numpy as np

B = int(os.environ.get("UFM_BENCH_BATCH", "4"))


def median_dispatch(fn, args, reps=7):
    _ = float(np.asarray(fn(*args)))
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_base_config
    from ufm_tpu.nn.info_sharing import MultiViewTransformerInput

    cfg = ufm_base_config()
    net = UFMNet(cfg)
    img = jnp.zeros((B, 420, 560, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.standard_normal((B, 420, 560, 3)), jnp.float32)
    i2 = jnp.asarray(rng.standard_normal((B, 420, 560, 3)), jnp.float32)

    trivial = jax.jit(lambda x: jnp.sum(x) * 2.0)
    tunnel = median_dispatch(trivial, (i1[:1, :8, :8, 0],), reps=10)
    print(f"tunnel {tunnel*1e3:.1f} ms", flush=True)

    def encode_only(self, a, b):
        f1, f2 = self._encode_symmetrized(a, b, False)
        return f1[-1], f2[-1], f1[0], f2[0]

    def encode_info(self, a, b):
        f1, f2 = self._encode_symmetrized(a, b, False)
        final, inter = self.info_sharing(MultiViewTransformerInput(features=[f1[-1], f2[-1]]))
        return final.features[0], inter[0].features[0], inter[1].features[0]

    stages = {
        "encode": lambda p, a, b: net.apply({"params": p}, a, b, method=encode_only),
        "encode+info": lambda p, a, b: net.apply({"params": p}, a, b, method=encode_info),
        "full": lambda p, a, b: net.apply({"params": p}, a, b, method="backbone"),
    }

    results = {}
    for name, fn in stages.items():
        # consume EVERY output leaf: summing just one lets XLA dead-code-
        # eliminate whole heads (measured: heads_delta 25.3 vs 38 ms real)
        jf = jax.jit(
            lambda p, a, b, fn=fn: sum(
                jnp.sum(x[..., ::3]).astype(jnp.float32) for x in jax.tree.leaves(fn(p, a, b))
            )
            * 1e-6
        )
        t = median_dispatch(lambda a, b: jf(params, a, b), (i1, i2)) - tunnel
        results[name] = round(t * 1e3, 1)
        print(f"{name}: {results[name]} ms/b{B}", flush=True)

    if "encode" in results and "encode+info" in results and "full" in results:
        results["info_delta"] = round(results["encode+info"] - results["encode"], 1)
        results["heads_delta"] = round(results["full"] - results["encode+info"], 1)
    print(json.dumps({"stages_ms": results, "batch": B, "tunnel_ms": round(tunnel * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
