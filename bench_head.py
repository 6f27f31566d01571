"""DPT-head microbench: attribute the ~44 ms/b4 head stage (bench_stages.py)
and measure candidate optimizations before changing model defaults.

Variants:
  fp32      — the ROUND-2 production configuration (fp32 dtype,
              HIGHEST-precision matmul resizes inside the head), requested
              explicitly via interp_precision="highest".
  fp32_dres — fp32 dtype, DEFAULT-precision resizes (consistent with the
              surrounding convs, which already run at TPU default = bf16
              single-pass input rounding). The round-3 production default
              (commit 9b4d8cf was justified by this comparison).
  bf16      — bf16 compute dtype throughout the head (params fp32), DEFAULT
              resizes. Reports max |Δflow| vs the fp32 variant.
  fusion / regression — stage split of the fp32 variant.
"""

import json
import time

import numpy as np

B = 4
HP, WP = 30, 40
TARGET = (420, 560)
OUT_DIM = 6  # flow(2) + cov(3) + covis(1), flagship adaptor stack


def _sync(out):
    # fetch ONE element (device-side slice): keeps the tunnel's bulk-transfer
    # cost out of the measurement; the slice dispatch itself is part of the
    # constant the tunnel term subtracts out
    return float(np.asarray(out[(0,) * out.ndim]))


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

    from ufm_tpu.nn.prediction_heads.base import PredictionHeadLayeredInput
    from ufm_tpu.nn.prediction_heads.dpt import DPTFeature, DPTRegressionProcessor

    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((B, HP, WP, c)), jnp.float32)
        for c in (1024, 768, 768, 768)
    ]

    # same call structure as the timed variants (jit dispatch + slice-sync)
    # so the subtracted constant includes both tunnel round trips
    trivial = jax.jit(lambda x: x * 2.0)
    tunnel = median_dispatch(trivial, (feats[0][:1, :2, :2, 0],), reps=10)
    print(f"tunnel {tunnel:.1f} ms", flush=True)

    results = {}

    def build(dtype, interp_precision):
        feat = DPTFeature(dtype=dtype, interp_precision=interp_precision)
        proc = DPTRegressionProcessor(
            output_dim=OUT_DIM, dtype=dtype, interp_precision=interp_precision
        )
        fp = feat.init(jax.random.PRNGKey(0), PredictionHeadLayeredInput(feats, TARGET))
        fused0 = feat.apply(fp, PredictionHeadLayeredInput(feats, TARGET))
        pp = proc.init(jax.random.PRNGKey(1), fused0, TARGET)
        return feat, proc, fp, pp

    # The "fp32" baseline is the ROUND-2 production configuration: HIGHEST
    # (true-fp32) matmul resizes. The heads' own default flipped to "default"
    # in round 3 (commit 9b4d8cf, justified by this bench), so the baseline
    # must now request it explicitly — the precision is a per-call keyword at
    # every resize site, which also means monkeypatching resize_hwc's default
    # (the previous approach) is a no-op.
    feat32, proc32, fp32p, pp32 = build(jnp.float32, "highest")

    @jax.jit
    def full32(fp, pp, fs):
        fused = feat32.apply(fp, PredictionHeadLayeredInput(list(fs), TARGET))
        return proc32.apply(pp, fused, TARGET).value

    @jax.jit
    def fusion32(fp, fs):
        return feat32.apply(fp, PredictionHeadLayeredInput(list(fs), TARGET))

    fused_in = fusion32(fp32p, feats)

    @jax.jit
    def reg32(pp, x):
        return proc32.apply(pp, x, TARGET).value

    results["fp32"] = round(median_dispatch(full32, (fp32p, pp32, feats)) - tunnel, 2)
    results["fusion"] = round(median_dispatch(fusion32, (fp32p, feats)) - tunnel, 2)
    results["regression"] = round(median_dispatch(reg32, (pp32, fused_in)) - tunnel, 2)
    ref_out = np.asarray(full32(fp32p, pp32, feats))
    print(json.dumps(results), flush=True)

    # default-precision resizes — the round-3 production configuration
    feat32d, proc32d, _, _ = build(jnp.float32, "default")

    @jax.jit
    def full32d(fp, pp, fs):
        fused = feat32d.apply(fp, PredictionHeadLayeredInput(list(fs), TARGET))
        return proc32d.apply(pp, fused, TARGET).value

    results["fp32_dres"] = round(median_dispatch(full32d, (fp32p, pp32, feats)) - tunnel, 2)
    dres_out = np.asarray(full32d(fp32p, pp32, feats))
    results["fp32_dres_max_dflow"] = float(np.abs(dres_out - ref_out).max())

    feat16 = DPTFeature(dtype=jnp.bfloat16)
    proc16 = DPTRegressionProcessor(output_dim=OUT_DIM, dtype=jnp.bfloat16)

    @jax.jit
    def full16(fp, pp, fs):
        fused = feat16.apply(fp, PredictionHeadLayeredInput(list(fs), TARGET))
        return proc16.apply(pp, fused, TARGET).value.astype(jnp.float32)

    results["bf16"] = round(median_dispatch(full16, (fp32p, pp32, feats)) - tunnel, 2)
    bf16_out = np.asarray(full16(fp32p, pp32, feats))
    results["bf16_max_dflow"] = float(np.abs(bf16_out - ref_out).max())

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
