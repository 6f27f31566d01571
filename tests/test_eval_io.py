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
