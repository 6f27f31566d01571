"""Tiled high-resolution inference benchmark (1080p, coarse-to-fine).

Measures the TPU-native high-res extension (models/tiled.py — the capability
BASELINE.json's "tiled inference >=1024px" config asks for; the reference
only downscales, /root/reference/uniflowmatch/models/base.py:236) end to end
on a 1920x1080 pair with the flagship base model: one coarse pass plus a
Hann-feathered batched tile sweep (20 native-resolution tiles at 0.33
overlap).

Wall-clock here includes host<->device image/flow transfer through this
environment's session tunnel, which round 3 measured varying by multiples
between windows (BENCH_NOTES.md serving section) — so the record carries
both the wall number and the on-chip-equivalent forward cost (tile pairs /
the measured b4 forward rate) that a directly-attached host would approach.

Writes bench_tiled.json; run: python bench_tiled.py
"""

import json
import os
import subprocess
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_tiled.json")


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


def main():
    from bench import enable_compile_cache

    enable_compile_cache()
    import jax

    from ufm_tpu.models import UniFlowMatchConfidence, ufm_base_config
    from ufm_tpu.models.tiled import predict_correspondences_tiled

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    # smooth structure (not pure noise) so covisibility gating has something
    # to latch onto; values don't matter for timing
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        127
        + 80 * np.sin(xx / 97.0)
        + 40 * np.cos(yy / 61.0)
        + rng.integers(0, 32, (h, w))
    )
    src = np.clip(np.stack([base, base * 0.9, base * 1.1], axis=-1), 0, 255).astype(np.uint8)
    tgt = np.roll(src, (7, 13), axis=(0, 1))

    model = UniFlowMatchConfidence.from_config(ufm_base_config())
    max_batch = 4  # reuses the b4-compiled pipeline; 20 tiles = 5 full batches

    # warm (compiles the coarse 1080p pipeline + the b4 native-tile pipeline)
    t0 = time.perf_counter()
    flow, covis = predict_correspondences_tiled(model, src, tgt, max_batch=max_batch)
    warm_s = time.perf_counter() - t0
    assert flow.shape == (h, w, 2) and covis.shape == (h, w)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        predict_correspondences_tiled(model, src, tgt, max_batch=max_batch)
        times.append(time.perf_counter() - t0)
    wall_s = float(np.median(times))

    # tile geometry for the record
    from ufm_tpu.models.tiled import _tile_starts

    tile_w, tile_h = model.inference_resolution[0]
    n_tiles = len(_tile_starts(h, tile_h, 0.33)) * len(_tile_starts(w, tile_w, 0.33))
    fwd_pairs = n_tiles + 1  # + the coarse pass

    rec = {
        "resolution": f"{w}x{h}",
        "tiles": n_tiles,
        "tile_batch": max_batch,
        "forward_pairs_total": fwd_pairs,
        "wall_s_median": round(wall_s, 3),
        "megapixels_per_sec_wall": round(h * w / 1e6 / wall_s, 3),
        "compile_plus_first_s": round(warm_s, 1),
        "note": (
            "wall includes session-tunnel image/flow transfer (varies by multiples "
            "between windows); on-chip-equivalent forward cost = forward_pairs_total "
            "/ the measured b4 forward rate (BENCH_NOTES.md headline)"
        ),
        "git_rev": _git_rev(),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device": str(jax.devices()[0].device_kind),
    }
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
