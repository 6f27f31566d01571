"""Training data pipeline tests (synthetic pairs with analytic flow)."""

import numpy as np
import pytest

pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pair_dir(tmp_path_factory):
    import cv2

    from examples.make_example_pairs import synthetic_pair

    d = tmp_path_factory.mktemp("pairs")
    for i in range(3):
        img0, img1, flow, _ = synthetic_pair(h=64, w=96, seed=i, max_disp=5.0)
        cv2.imwrite(str(d / f"p{i}_0.png"), cv2.cvtColor(img0, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(d / f"p{i}_1.png"), cv2.cvtColor(img1, cv2.COLOR_RGB2BGR))
        np.save(str(d / f"p{i}_flow.npy"), flow)
    return str(d)


def test_dataset_and_batches(pair_dir):
    from ufm_tpu.data import FlowPairDataset, train_batches

    ds = FlowPairDataset(pair_dir)
    assert len(ds) == 3

    batches = list(train_batches(ds, batch_size=2, resolution_hw=(42, 56), epochs=1))
    assert len(batches) == 1  # 3 pairs, batch 2, drop remainder
    b = batches[0]
    assert b["img1"].shape == (2, 42, 56, 3)
    assert b["gt_flow"].shape == (2, 42, 56, 2)
    assert b["gt_covisibility"].shape == (2, 42, 56)
    # flow rescaled: max |flow| was <=5 at 96 wide -> <=5 * 56/96 ≈ 2.9 in x
    assert np.abs(b["gt_flow"][..., 0]).max() <= 5 * 56 / 96 + 1e-3
    # images normalized (roughly zero-centered)
    assert abs(float(b["img1"].mean())) < 2.0


def test_batches_feed_train_step(pair_dir):
    import jax

    from ufm_tpu.data import FlowPairDataset, train_batches
    from ufm_tpu.models import UFMNet, ufm_tiny_config
    from ufm_tpu.training import make_optimizer, make_train_step

    cfg = ufm_tiny_config()
    net = UFMNet(cfg)
    batch = next(iter(train_batches(FlowPairDataset(pair_dir), 2, (42, 56), epochs=1)))
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}

    params = net.init(jax.random.PRNGKey(0), batch["img1"], batch["img2"])["params"]
    opt = make_optimizer(params, warmup_steps=0)
    step = jax.jit(make_train_step(net.apply, opt))
    params2, _, metrics = step(params, opt.init(params), batch)
    assert np.isfinite(float(metrics["total_loss"]))
