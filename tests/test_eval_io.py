"""Flow-format IO round trips and evaluation metrics."""

import numpy as np
import pytest

from ufm_tpu.eval import covisibility_metrics, flow_metrics
from ufm_tpu.utils.flow_io import read_flo, read_kitti_flow, write_flo, write_kitti_flow


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((17, 23, 2)).astype(np.float32) * 30
    path = str(tmp_path / "x.flo")
    write_flo(path, flow)
    np.testing.assert_array_equal(read_flo(path), flow)


def test_kitti_roundtrip(tmp_path, rng):
    pytest.importorskip("cv2")
    flow = (rng.standard_normal((16, 20, 2)) * 50).astype(np.float32)
    valid = rng.random((16, 20)) > 0.3
    path = str(tmp_path / "x_flow.png")
    write_kitti_flow(path, flow, valid)
    got_flow, got_valid = read_kitti_flow(path)
    np.testing.assert_array_equal(got_valid, valid)
    np.testing.assert_allclose(got_flow, flow, atol=1 / 64.0 + 1e-6)


def test_flow_metrics():
    gt = np.zeros((10, 10, 2))
    pred = gt.copy()
    pred[5:, :, 0] = 4.0  # half the pixels off by 4px
    m = flow_metrics(pred, gt)
    np.testing.assert_allclose(m["epe"], 2.0)
    np.testing.assert_allclose(m["acc_3px"], 0.5)
    np.testing.assert_allclose(m["acc_5px"], 1.0)
    assert m["fl_outlier"] == 0.5


def test_covisibility_metrics():
    pred = np.array([[0.9, 0.1], [0.8, 0.2]])
    gt = np.array([[1.0, 0.0], [0.0, 1.0]])
    m = covisibility_metrics(pred, gt)
    np.testing.assert_allclose(m["covis_precision"], 0.5)
    np.testing.assert_allclose(m["covis_recall"], 0.5)


def test_evaluate_with_oracle_model(tmp_path, rng):
    """End-to-end evaluate_pairs over synthetic data with a stub model that
    answers with the ground truth."""
    pytest.importorskip("cv2")
    import cv2

    import jax.numpy as jnp

    from examples.make_example_pairs import synthetic_pair
    from ufm_tpu.eval import evaluate_pairs
    from ufm_tpu.models.base import UFMFlowFieldOutput, UFMMaskFieldOutput, UFMOutputInterface

    img0, img1, flow, _ = synthetic_pair(h=64, w=96, seed=1, max_disp=6.0)
    cv2.imwrite(str(tmp_path / "a_0.png"), cv2.cvtColor(img0, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(tmp_path / "a_1.png"), cv2.cvtColor(img1, cv2.COLOR_RGB2BGR))
    np.save(str(tmp_path / "a_flow.npy"), flow)

    class Oracle:
        def predict_correspondences_batched(self, source_image, target_image, **_):
            out = UFMOutputInterface()
            out.flow = UFMFlowFieldOutput(flow_output=jnp.asarray(flow.transpose(2, 0, 1)[None]))
            out.covisibility = UFMMaskFieldOutput(mask=jnp.ones((1, 64, 96)), logits=None)
            return out

    agg = evaluate_pairs(Oracle(), str(tmp_path))
    assert agg["num_pairs"] == 1
    assert agg["epe"] < 1e-5
    assert agg["acc_1px"] == 1.0


def test_cycle_consistency_metrics():
    """A constant flow whose backward pass is its exact negation closes the
    cycle to 0; an inconsistent backward flow scores its full residual."""
    from ufm_tpu.eval import cycle_consistency_metrics

    fwd = np.full((12, 16, 2), 2.0, dtype=np.float32)
    bwd = np.full((12, 16, 2), -2.0, dtype=np.float32)
    m = cycle_consistency_metrics(fwd, bwd)
    assert m["cycle_epe"] < 1e-6
    assert m["cycle_acc_1px"] == 1.0
    # only in-bounds forward targets are scored: x+2 <= 15, y+2 <= 11
    assert m["cycle_coverage"] == pytest.approx((14 / 16) * (10 / 12))

    bad = bwd + np.asarray([3.0, 0.0])
    m_bad = cycle_consistency_metrics(fwd, bad)
    assert m_bad["cycle_epe"] == pytest.approx(3.0)

    # covisibility gating restricts scoring to the claimed-covisible region
    covis = np.zeros((12, 16), dtype=np.float32)
    covis[:, :8] = 1.0
    m_cov = cycle_consistency_metrics(fwd, bad, covis)
    assert m_cov["cycle_coverage"] == pytest.approx(8 * 10 / (12 * 16))

    # return_map: the per-pixel error map agrees with the scalar stats and is
    # zeroed outside the scored region (the golden-image heatmap consumer)
    m_map, err_map = cycle_consistency_metrics(fwd, bad, covis, return_map=True)
    assert m_map == m_cov
    assert err_map.shape == (12, 16)
    assert err_map[:10, :8] == pytest.approx(3.0)
    assert (err_map[:, 8:] == 0).all()  # unscored: covis-gated region


def test_cycle_consistency_different_target_shape():
    """Backward flow defined on a differently-sized target grid is sampled at
    the forward target coordinates (real pairs can differ per view)."""
    from ufm_tpu.eval import cycle_consistency_metrics

    fwd = np.zeros((10, 10, 2), dtype=np.float32)
    fwd[..., 0] = 4.0  # all source pixels map 4px right into a 20-wide target
    bwd = np.zeros((10, 20, 2), dtype=np.float32)
    bwd[..., 0] = -4.0
    m = cycle_consistency_metrics(fwd, bwd)
    assert m["cycle_epe"] < 1e-6
    assert m["cycle_coverage"] == 1.0


def test_evaluate_pairs_without_gt(tmp_path):
    """evaluate_pairs(require_gt=False) scores GT-less pairs by cycle
    consistency via two predictions (fwd + swapped)."""
    pytest.importorskip("cv2")
    import cv2

    import jax.numpy as jnp

    from ufm_tpu.eval import evaluate_pairs
    from ufm_tpu.models.base import UFMFlowFieldOutput, UFMMaskFieldOutput, UFMOutputInterface

    rng = np.random.default_rng(0)
    img0 = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    img1 = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    cv2.imwrite(str(tmp_path / "p_0.png"), img0)
    cv2.imwrite(str(tmp_path / "p_1.png"), img1)

    class ConstFlow:
        def __init__(self):
            self.calls = 0

        def predict_correspondences_batched(self, source_image, target_image, **_):
            self.calls += 1
            sign = 1.0 if self.calls % 2 == 1 else -1.0  # fwd then bwd
            flow = np.full((1, 2, 24, 32), 1.5 * sign, dtype=np.float32)
            out = UFMOutputInterface()
            out.flow = UFMFlowFieldOutput(flow_output=jnp.asarray(flow))
            out.covisibility = UFMMaskFieldOutput(mask=jnp.ones((1, 24, 32)), logits=None)
            return out

    model = ConstFlow()
    agg = evaluate_pairs(model, str(tmp_path), require_gt=False)
    assert model.calls == 2
    assert agg["num_pairs"] == 1
    assert agg["all_flows_finite"]
    assert agg["cycle_epe"] < 1e-6
    assert agg["covis_mean"] == 1.0
    # with require_gt=True (default) the GT-less pair is skipped entirely
    assert evaluate_pairs(ConstFlow(), str(tmp_path)) == {}
