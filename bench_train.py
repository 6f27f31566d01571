"""Training-step benchmark on the real TPU (round-3; VERDICT r2 #3).

Runs forward+backward+optimizer-update of the flagship confidence variant on
the chip — the first on-hardware proof of the scanned-stack backward and the
Pallas custom-VJPs (the CPU-mesh tests and the dryrun cannot see Mosaic-level
failures; the round-2 Mosaic layout bug b93736a proved this class exists).

Methodology: per-dispatch median minus the measured tunnel constant (one
train step is a single dispatch; the constant is small relative to a step).
Params are passed as jit ARGUMENTS (memory: tpu-tunnel-compile-pitfalls —
closing over the 1.3 GB pytree balloons the remote-compile request).

Writes bench_train.json incrementally; bench.py folds it into its output.
Env knobs: UFM_BENCH_BATCH (default 2), UFM_TRAIN_REMAT=1 to checkpoint the
transformer stacks if activations OOM.
"""

import json
import os
import time

import numpy as np

B = int(os.environ.get("UFM_BENCH_BATCH", "2"))
HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_train.json")


from bench_record import git_rev as _git_rev


def main():
    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import UFMNet, ufm_base_config
    from ufm_tpu.training import make_optimizer, make_train_step, synthetic_batch

    h, w = 420, 560
    cfg = ufm_base_config()
    # Remat the transformer stacks by default: the flagship's saved backward
    # residuals otherwise exceed single-chip HBM by ~4 GB at batch 2 even
    # with donated train state (measured 2026-08-17: 19.5G vs 15.75G).
    # "1"/"all" remats both stacks, "encoder" only the 24-layer encoder
    # (keeps the small info-sharing activations resident), "0" disables
    remat_env = os.environ.get("UFM_TRAIN_REMAT", "1")
    remat = remat_env != "0"
    if remat:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            train_remat="encoder" if remat_env == "encoder" else True,
            # Default: save matmul outputs AND the tagged flash-attention
            # core outputs; recompute only elementwise work. Measured B/A/B
            # on the v5e flagship at b2 (round 5): 275.3/282.7 ms for the
            # dots-only policy vs 267.3 with +attn_out (~3-5% faster; the
            # backward skips the per-layer flash-forward recompute), both
            # far ahead of 385.3 full-remat. Fits HBM with donation.
            # UFM_TRAIN_REMAT_POLICY= (empty) restores full remat.
            train_remat_policy=os.environ.get(
                "UFM_TRAIN_REMAT_POLICY",
                "dots_with_no_batch_dims_and_attn_out_saveable",
            )
            or None,
        )
    net = UFMNet(cfg)
    img = jnp.zeros((B, h, w, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), img, img)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"flagship confidence variant: {n_params/1e6:.1f}M params, batch {B}", flush=True)

    optimizer = make_optimizer(params, learning_rate=1e-4)
    opt_state = jax.jit(optimizer.init)(params)
    # donate params+opt_state: without donation the updated copies double the
    # ~5 GB of fp32 train state and the b2 step OOMs HBM by ~320 MB
    step_fn = jax.jit(make_train_step(net.apply, optimizer), donate_argnums=(0, 1))

    batch = synthetic_batch(B, h, w, seed=1)

    # tunnel constant
    trivial = jax.jit(lambda x: jnp.sum(x) * 2.0)
    _ = float(np.asarray(trivial(batch["img1"][:1, :8, :8, 0])))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(np.asarray(trivial(batch["img1"][:1, :8, :8, 0])))
        ts.append(time.perf_counter() - t0)
    tunnel = float(np.median(ts))
    print(f"tunnel constant: {tunnel*1e3:.1f} ms", flush=True)

    rec = {
        "complete": False,  # flipped at the end; bench.py must not fold partial runs
        "batch": B,
        "remat": remat_env if remat else False,
        # record the policy actually applied to the config, not the raw env
        # var (which defaults differently and is ignored when remat is off)
        "remat_policy": cfg.train_remat_policy if remat else None,
        "resolution": "560x420",
        "attn_backward": os.environ.get("UFM_ATTN_BWD", "pallas"),
        "model": "flagship confidence variant (ViT-L/14 + global-attn + 2 DPT heads)",
        "params_m": round(n_params / 1e6, 1),
        "tunnel_ms": round(tunnel * 1e3, 1),
        "git_rev": _git_rev(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device": str(jax.devices()[0]),
    }

    def flush():
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)

    flush()

    # compile + first step (proves the backward executes on real Mosaic)
    t0 = time.perf_counter()
    params2, opt_state2, metrics = step_fn(params, opt_state, batch)
    loss0 = float(np.asarray(metrics["total_loss"]))
    rec["compile_plus_first_step_s"] = round(time.perf_counter() - t0, 1)
    rec["first_loss"] = round(loss0, 4)
    assert np.isfinite(loss0), f"non-finite loss on first step: {loss0}"
    flush()
    print(f"first step done in {rec['compile_plus_first_step_s']} s, loss {loss0:.4f}", flush=True)

    # steady-state step time (per dispatch minus tunnel); feed updated state
    # back in so the measurement is the real training loop pattern
    times = []
    losses = [loss0]
    for _ in range(6):
        t0 = time.perf_counter()
        params2, opt_state2, metrics = step_fn(params2, opt_state2, batch)
        losses.append(float(np.asarray(metrics["total_loss"])))
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times) * 1e3) - tunnel * 1e3
    assert all(np.isfinite(losses)), f"non-finite loss trajectory: {losses}"

    # ~3x forward FLOPs for fwd+bwd; forward ≈ 3.5-4 TFLOP/pair at 560x420
    # (BENCH_NOTES round-2 MFU estimate) — reported as an estimate only
    est_tflops = 3.0 * 3.75e12 * B / (step_ms / 1e3) / 1e12
    rec.update(
        {
            "step_ms_onchip": round(step_ms, 1),
            "steps_per_sec": round(1e3 / step_ms, 3),
            "pairs_per_sec_training": round(B * 1e3 / step_ms, 3),
            "est_tflops_fwd_bwd": round(est_tflops, 1),
            "loss_trajectory": [round(x, 4) for x in losses],
            "loss_decreased": bool(losses[-1] < losses[0]),
            "complete": True,
        }
    )
    flush()
    print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
