"""Refine-variant forward benchmark: staged (backbone + refine_tail) timing,
pallas window-dots vs xla gather for the refinement stage.

Why staged: the monolithic refine-forward graph is large enough that this
environment's remote-compile tunnel drops it (broken pipe ~30 min into the
compile — observed for both the scanned and the single-forward graph), and
round 1 measured the monolithic graph scheduling ~2.4x worse than the sum of
its stages anyway. ``UFMNet.backbone`` / ``UFMNet.refine_tail`` are real
production methods (models/network.py), so staged numbers are a runnable
path, not an estimate: per batch, total = t(backbone) + t(refine_tail).

Each stage compiles alone (backbone ≈ the base model, which compiles
reliably) and is timed per dispatch; the tunnel's per-dispatch constant is
measured on a trivial jitted op and subtracted. Results are written to
bench_refine.json incrementally so a killed run still leaves data; bench.py
folds that file into its output.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

B = int(os.environ.get("UFM_BENCH_BATCH", "2"))
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_refine.json")


def refine_config_hash(cfg) -> str:
    """Stable hash of the measured architecture config. bench.py recomputes
    this against the CURRENT flagship refine config and marks a cached
    bench_refine.json stale on mismatch — a number measured on an older
    kernel/config must not be republished as current.

    Training-only knobs (train_*) are excluded: they do not enter the
    inference graph being measured, so adding or flipping one must not
    invalidate a cached inference record (it did once: the round-3
    train_remat_policy field flipped the hash of an unchanged forward)."""
    import hashlib

    d = {k: v for k, v in cfg.to_dict().items() if not k.startswith("train_")}
    blob = json.dumps(d, sort_keys=True, default=str).encode()
    return hashlib.sha1(blob).hexdigest()[:16]


def _git_rev() -> str:
    try:
        return (
            subprocess.run(
                ["git", "-C", HERE, "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or "unknown"
        )
    except Exception:
        return "unknown"


def median_dispatch(fn, args, reps=7):
    """Median wall time of one dispatch (includes the tunnel round trip).
    Syncs via value fetch (block_until_ready does not block on axon)."""
    _ = float(np.asarray(fn(*args)))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(np.asarray(fn(*args)))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_refine_config

    modes = sys.argv[1:] or ["pallas", "xla"]

    cfg = ufm_refine_config()
    net = UFMNet(cfg)
    img = jnp.zeros((B, 420, 560, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]
    i1 = jax.random.normal(jax.random.PRNGKey(1), (B, 420, 560, 3), jnp.float32)
    i2 = jax.random.normal(jax.random.PRNGKey(2), (B, 420, 560, 3), jnp.float32)

    # Tunnel constant: dispatch cost of a near-empty program.
    trivial = jax.jit(lambda x: jnp.sum(x) * 2.0)
    tunnel = median_dispatch(trivial, (i1[:1, :8, :8, 0],), reps=10)
    print(f"tunnel constant: {tunnel*1e3:.1f} ms", flush=True)

    results = {}

    def flush():
        stage_b = {
            k: v for k, v in results.items() if k in ("pallas", "xla") and isinstance(v, (int, float))
        }
        rec = {
            "batch": B,
            "tunnel_ms": round(tunnel * 1e3, 1),
            "stages_ms_onchip": results,
            "methodology": (
                "staged production path (UFMNet.backbone + UFMNet.refine_tail, two "
                "dispatches); per-stage per-dispatch median minus measured tunnel constant"
            ),
            "config_hash": refine_config_hash(cfg),
            "git_rev": _git_rev(),
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "device": str(jax.devices()[0]),
        }
        if "backbone" in results and stage_b:
            best_mode = min(stage_b, key=stage_b.get)
            total = results["backbone"] + stage_b[best_mode]
            rec["refine_pairs_per_sec"] = round(B / (total / 1e3), 3)
            rec["ms_per_batch"] = round(total, 1)
            rec["refinement_impl"] = best_mode
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)

    # Stage A: backbone (encoder + info-sharing + DPT heads + cls inputs).
    # NB: params must be an ARGUMENT — closing over the 1.3 GB pytree embeds
    # it in the lowered computation and the remote-compile request balloons.
    def backbone(p, a, b_):
        out = net.apply({"params": p}, a, b_, method="backbone")
        return (
            jnp.sum(out["flow"][:, ::64, ::64]) * 1e-6,
            out["flow"],
            out["cls_in_0"],
            out["cls_in_1"],
        )

    jb = jax.jit(backbone)
    try:
        t = median_dispatch(lambda a, b_: jb(params, a, b_)[0], (i1, i2)) - tunnel
        results["backbone"] = round(t * 1e3, 1)
        print(f"backbone: {results['backbone']} ms/b{B}", flush=True)
    except Exception as e:  # noqa: BLE001
        results["backbone"] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        print("backbone", results["backbone"], flush=True)
        flush()
        return
    flush()

    _, flow, cls0, cls1 = jb(params, i1, i2)

    # Stage B: refine tail under each refinement impl ("none" ablates the
    # fused refinement op to zeros — isolates MLP head + UNet + combine cost).
    import ufm_tpu.models.network as network_mod
    from ufm_tpu.ops.refinement import fused_refinement_attention

    def refine_zeros(q, f, fl, bias, temp, p, **_kw):
        b, h, w, _ = q.shape
        return jnp.zeros((b, h, w, 2), q.dtype), jnp.zeros((b, h, w, p, p), q.dtype)

    for mode in modes:
        if mode == "none":
            network_mod.fused_refinement_attention = refine_zeros
        else:
            network_mod.fused_refinement_attention = fused_refinement_attention
            os.environ["UFM_REFINE_IMPL"] = mode

        def tail(p, a, b_, fl, c0, c1):
            out = net.apply({"params": p}, a, b_, fl, c0, c1, method="refine_tail")
            return jnp.sum(out["flow"][:, ::64, ::64]) * 1e-6

        try:
            t = median_dispatch(jax.jit(tail), (params, i1, i2, flow, cls0, cls1)) - tunnel
            results[mode] = round(t * 1e3, 1)
            total = results["backbone"] + results[mode]
            print(
                f"refine_tail[{mode}]: {results[mode]} ms/b{B} -> staged total "
                f"{total:.1f} ms = {B/(total/1e3):.2f} pairs/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            results[mode] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
            print(mode, results[mode], flush=True)
        flush()
    os.environ.pop("UFM_REFINE_IMPL", None)
    print(json.dumps({"staged_ms_onchip": results, "batch": B}), flush=True)


if __name__ == "__main__":
    main()
