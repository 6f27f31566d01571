"""AOT export roundtrip: jax.export artifacts reproduce the live network.

The artifact is the serving deliverable (runtime/export.py) — these tests
pin that a reloaded .ufmx program computes exactly what the live flax
forward computes, for both the single-program and the staged (refine)
layouts, and that the fixed-shape calling convention is enforced.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# AOT-export heavyweights: excluded from the quick lane (pytest -m "not slow")
pytestmark = pytest.mark.slow

from ufm_tpu.models import (
    UniFlowMatchClassificationRefinement,
    UniFlowMatchConfidence,
    ufm_tiny_config,
)
from ufm_tpu.runtime import export_model, load_exported


def _images(model, batch, rng, w=None, h=None):
    if w is None:
        w, h = model.inference_resolution[0]
    i1 = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((batch, h, w, 3)).astype(np.float32))
    return i1, i2


def test_export_roundtrip_confidence(tmp_path, rng):
    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    path = str(tmp_path / "base.ufmx")
    manifest = export_model(model, path, batch=2)

    assert manifest["model_class"] == "UniFlowMatchConfidence"
    assert manifest["staged"] is False
    assert manifest["n_param_leaves"] > 0

    exported = load_exported(path)
    i1, i2 = _images(model, 2, rng)
    got = exported(i1, i2)
    want = model.net.apply({"params": model.params}, i1, i2)

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_export_roundtrip_refine_staged(tmp_path, rng):
    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        refinement_range=3,
    )
    model = UniFlowMatchClassificationRefinement.from_config(cfg)
    assert model._use_staged_inference()
    path = str(tmp_path / "refine.ufmx")
    manifest = export_model(model, path, batch=1)
    assert manifest["staged"] is True

    exported = load_exported(path)
    i1, i2 = _images(model, 1, rng)
    got = exported(i1, i2)

    # reference: the production staged composition on the live model
    back = model.net.apply({"params": model.params}, i1, i2, method="backbone")
    tail = model.net.apply(
        {"params": model.params},
        i1,
        i2,
        back["flow"],
        back["cls_in_0"],
        back["cls_in_1"],
        method="refine_tail",
    )
    want = {k: v for k, v in back.items() if k not in ("cls_in_0", "cls_in_1")}
    want.update(tail)

    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_export_shape_enforcement(tmp_path, rng):
    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    path = str(tmp_path / "b1.ufmx")
    export_model(model, path, batch=1)
    exported = load_exported(path)
    i1, i2 = _images(model, 2, rng)  # wrong batch
    with pytest.raises(ValueError, match="fixed-shape"):
        exported(i1, i2)


def test_export_swappable_params(tmp_path, rng):
    """Params are call args, not baked constants: swapping params.npz serves
    different weights through the same compiled program."""
    import io
    import zipfile

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    path = str(tmp_path / "m.ufmx")
    export_model(model, path, batch=1)

    model2 = UniFlowMatchConfidence.from_config(ufm_tiny_config(), seed=1)
    leaves2, _ = jax.tree_util.tree_flatten(model2.params)

    path2 = str(tmp_path / "m2.ufmx")
    with zipfile.ZipFile(path) as zin, zipfile.ZipFile(path2, "w") as zout:
        for name in zin.namelist():
            if name == "params.npz":
                buf = io.BytesIO()
                np.savez(buf, **{f"p{i:06d}": np.asarray(l) for i, l in enumerate(leaves2)})
                zout.writestr(name, buf.getvalue())
            else:
                zout.writestr(name, zin.read(name))

    exported = load_exported(path2)
    i1, i2 = _images(model, 1, rng)
    got = exported(i1, i2)
    want = model2.net.apply({"params": model2.params}, i1, i2)
    np.testing.assert_allclose(
        np.asarray(got["flow"]), np.asarray(want["flow"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("dtype", ["bfloat16", "float16"])
def test_export_half_precision_params(tmp_path, rng, dtype):
    """params_dtype halves the params payload; the reloaded model matches the
    live forward to bf16 weight-rounding tolerance (the compiled program is
    identical — only the stored weights round-trip through half precision)."""
    import os

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    p32 = str(tmp_path / "fp32.ufmx")
    p16 = str(tmp_path / "h.ufmx")
    export_model(model, p32, batch=1)
    manifest = export_model(model, p16, batch=1, params_dtype=dtype)
    assert manifest["params_dtype"] == dtype
    assert manifest["stored_param_bytes"] < 0.55 * manifest["param_bytes"]
    assert os.path.getsize(p16) < 0.75 * os.path.getsize(p32)

    exported = load_exported(p16)
    # leaves were cast back to the program's expected fp32
    assert all(l.dtype == np.dtype(d) for l, d in zip(exported._leaves, manifest["param_orig_dtypes"]))
    i1, i2 = _images(model, 1, rng)
    got = exported(i1, i2)
    want = model.net.apply({"params": model.params}, i1, i2)
    for k in want:
        err = np.abs(np.asarray(got[k]) - np.asarray(want[k])).max()
        scale = np.abs(np.asarray(want[k])).max() + 1e-6
        assert err / scale < 0.05, f"{k}: relative drift {err/scale:.4f} from {dtype} weights"


def test_export_params_dtype_validation(tmp_path):
    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    with pytest.raises(ValueError, match="params_dtype"):
        export_model(model, str(tmp_path / "x.ufmx"), params_dtype="int8")


def test_artifact_model_full_predict_parity(tmp_path, rng):
    """ArtifactUFM wraps the raw AOT program in the FULL public predict API
    (layout/normalize/resize/unmap host pipeline); its outputs are identical
    to the live model's predict_correspondences_batched, and the fixed batch
    of the artifact is enforced with a clear error."""
    from ufm_tpu.runtime import load_artifact_model

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    path = str(tmp_path / "base.ufmx")
    export_model(model, path, batch=1)
    art = load_artifact_model(path)
    assert art.data_norm_type == model.data_norm_type

    # non-native resolution exercises resize + region unmap around the program
    src = np.asarray(rng.integers(0, 255, (150, 200, 3)), dtype=np.uint8)
    tgt = np.asarray(rng.integers(0, 255, (150, 200, 3)), dtype=np.uint8)
    live = model.predict_correspondences_batched(src, tgt)
    aot = art.predict_correspondences_batched(src, tgt)
    np.testing.assert_array_equal(
        np.asarray(live.flow.flow_output), np.asarray(aot.flow.flow_output)
    )
    np.testing.assert_array_equal(
        np.asarray(live.covisibility.mask), np.asarray(aot.covisibility.mask)
    )

    with pytest.raises(ValueError, match="fixed batch"):
        art.predict_correspondences_batched(
            np.stack([src, src]), np.stack([tgt, tgt])
        )


def test_artifact_model_staged_refine_predict(tmp_path, rng):
    """The staged (backbone+tail) artifact drives the same two-dispatch
    device-resident predict path as the live refine model."""
    from ufm_tpu.runtime import load_artifact_model

    cfg = ufm_tiny_config(has_classification_head=True, refinement_range=3)
    model = UniFlowMatchClassificationRefinement.from_config(cfg)
    path = str(tmp_path / "refine.ufmx")
    export_model(model, path, batch=1)
    art = load_artifact_model(path)
    assert art._use_staged_inference()

    src = np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8)
    tgt = np.asarray(rng.integers(0, 255, (96, 128, 3)), dtype=np.uint8)
    live = model.predict_correspondences_batched(src, tgt)
    aot = art.predict_correspondences_batched(src, tgt)
    np.testing.assert_array_equal(
        np.asarray(live.flow.flow_output), np.asarray(aot.flow.flow_output)
    )
    np.testing.assert_array_equal(
        np.asarray(live.covisibility.mask), np.asarray(aot.covisibility.mask)
    )


def test_export_multiplatform(tmp_path, rng):
    """platforms=("cpu","tpu"): one artifact lowers for both targets. On the
    CPU test backend the trace takes the XLA kernel paths, which lower on
    every platform — the tpu lowering is validated structurally here and the
    artifact still executes on the current backend after reload."""
    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    path = str(tmp_path / "multi.ufmx")
    manifest = export_model(model, path, batch=1, platforms=("cpu", "tpu"))
    assert manifest["platforms"] == ["cpu", "tpu"]

    exported = load_exported(path)
    i1, i2 = _images(model, 1, rng)
    got = exported(i1, i2)
    want = model.net.apply({"params": model.params}, i1, i2)
    np.testing.assert_allclose(
        np.asarray(got["flow"]), np.asarray(want["flow"]), rtol=1e-5, atol=1e-5
    )
