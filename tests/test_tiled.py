"""Tiled inference: stitching math verified with a stub model."""

import numpy as np

import jax.numpy as jnp

from ufm_tpu.models.base import UFMFlowFieldOutput, UFMMaskFieldOutput, UFMOutputInterface
from ufm_tpu.models.tiled import predict_correspondences_tiled


class StubModel:
    """Pretends the scene is shifted by a constant (dx, dy): predicts, for
    any (source, target) pair given to it, a uniform flow of
    (true shift) - (window offset already applied by the tiler). The tiler
    can't know the window offset it chose is encoded in the images, so we
    emulate a perfect model by answering with the residual shift computed
    from image content (stored in channel means)."""

    inference_resolution = [(64, 48)]  # (W, H)

    def __init__(self, dx: float, dy: float):
        self.dx, self.dy = dx, dy

    def predict_correspondences_batched(self, source_image, target_image, **_):
        src = np.asarray(source_image, dtype=np.float64)
        tgt = np.asarray(target_image, dtype=np.float64)
        if src.ndim == 3:
            src, tgt = src[None], tgt[None]
        b = src.shape[0]
        h, w = src.shape[1:3]
        # encoded positions: channel 0 = x/W*255 of the global frame,
        # channel 1 = y/H*255
        sx = src[..., 0].mean(axis=(1, 2))
        sy = src[..., 1].mean(axis=(1, 2))
        tx = tgt[..., 0].mean(axis=(1, 2))
        ty = tgt[..., 1].mean(axis=(1, 2))
        fx = (self.dx - (tx - sx))[:, None, None]
        fy = (self.dy - (ty - sy))[:, None, None]
        flow = np.zeros((b, 2, h, w), dtype=np.float32)
        flow[:, 0] = fx
        flow[:, 1] = fy
        out = UFMOutputInterface()
        out.flow = UFMFlowFieldOutput(flow_output=jnp.asarray(flow))
        out.covisibility = UFMMaskFieldOutput(mask=jnp.ones((b, h, w)), logits=None)
        return out


def _position_image(h, w):
    """uint8-ish image whose channel means encode absolute position."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), dtype=np.float32)
    img[..., 0] = xs
    img[..., 1] = ys
    return img


def test_tiled_constant_shift():
    dx, dy = 7.0, -5.0
    sh, sw = 96, 144  # larger than the 48x64 model resolution -> tiling kicks in
    src = _position_image(sh, sw)
    tgt = _position_image(sh, sw)  # same frame; stub encodes shift internally

    model = StubModel(dx, dy)
    flow, covis = predict_correspondences_tiled(model, src, tgt, overlap=0.5, max_batch=4)

    assert flow.shape == (sh, sw, 2)
    assert covis.shape == (sh, sw)
    np.testing.assert_allclose(flow[..., 0], dx, atol=1e-3)
    np.testing.assert_allclose(flow[..., 1], dy, atol=1e-3)
    assert (covis > 0.9).all()


def test_tiled_small_image_falls_back_to_coarse():
    from ufm_tpu.models import tiled

    model = StubModel(2.0, 3.0)
    # seed stale stats from a genuinely tiled call; the small-image early
    # return must overwrite them, not leave the previous call's record
    big = _position_image(96, 144)
    predict_correspondences_tiled(model, big, big, overlap=0.5, max_batch=4)
    assert tiled.last_tile_stats["tiles"] > 0

    src = _position_image(40, 60)  # smaller than model res: no tiling
    flow, covis = predict_correspondences_tiled(model, src, src)
    np.testing.assert_allclose(flow[..., 0], 2.0, atol=1e-3)
    np.testing.assert_allclose(flow[..., 1], 3.0, atol=1e-3)
    assert tiled.last_tile_stats == {"tiles": 0, "tiles_rejected": 0, "gate_px": 0.0}


class BadTileModel(StubModel):
    """Correct on the full-frame (coarse) call, catastrophically wrong on
    every native-resolution tile call — models a mislocated target window
    (textureless tile median) that round-4 robust fusion must reject."""

    def predict_correspondences_batched(self, source_image, target_image, **kw):
        out = super().predict_correspondences_batched(source_image, target_image, **kw)
        src = np.asarray(source_image)
        h = src.shape[1] if src.ndim == 4 else src.shape[0]
        if h == self.inference_resolution[0][1]:  # native-res tile call
            out.flow = UFMFlowFieldOutput(flow_output=out.flow.flow_output + 50.0)
        return out


def test_tiled_rejects_tiles_disagreeing_with_coarse():
    from ufm_tpu.models import tiled

    dx, dy = 7.0, -5.0
    src = _position_image(96, 144)
    model = BadTileModel(dx, dy)
    flow, _ = predict_correspondences_tiled(model, src, src, overlap=0.5, max_batch=4)

    # every tile disagreed with the coarse solution by ~70px >> gate; robust
    # fusion must fall back to the coarse result instead of averaging garbage
    np.testing.assert_allclose(flow[..., 0], dx, atol=1e-3)
    np.testing.assert_allclose(flow[..., 1], dy, atol=1e-3)
    assert tiled.last_tile_stats["tiles_rejected"] == tiled.last_tile_stats["tiles"] > 0


class LeftBadTileModel(StubModel):
    """Wrong only on native-res tiles from the left edge of the source frame
    (channel-0 mean < 48, i.e. tiles starting at x0=0): a PARTIAL-rejection
    scenario where accepted and rejected tiles overlap."""

    def predict_correspondences_batched(self, source_image, target_image, **kw):
        out = super().predict_correspondences_batched(source_image, target_image, **kw)
        src = np.asarray(source_image, dtype=np.float64)
        if src.ndim == 3:
            src = src[None]
        if src.shape[1] == self.inference_resolution[0][1]:  # native-res tile call
            bad = (src[..., 0].mean(axis=(1, 2)) < 48.0)[:, None, None, None]
            out.flow = UFMFlowFieldOutput(
                flow_output=out.flow.flow_output + 50.0 * jnp.asarray(bad)
            )
        return out


def test_tiled_rejected_tiles_do_not_dilute_covisibility():
    """A rejected tile's feather must not appear in the covisibility
    normalizer: a pixel overlapped by one accepted and one rejected tile
    keeps the accepted tile's covisibility (regression: the normalizer
    summed ALL tiles' feathers, halving covis wherever rejected tiles
    overlapped accepted ones)."""
    from ufm_tpu.models import tiled

    src = _position_image(96, 144)
    model = LeftBadTileModel(7.0, -5.0)
    flow, covis = predict_correspondences_tiled(model, src, src, overlap=0.5, max_batch=4)

    stats = tiled.last_tile_stats
    assert 0 < stats["tiles_rejected"] < stats["tiles"]  # genuinely partial
    # the stub reports covisibility 1.0 everywhere; accepted-tile regions and
    # the coarse fallback must both preserve it
    assert (covis > 0.99).all()
    # accepted (right-side) tiles still stitch the correct flow
    np.testing.assert_allclose(flow[:, 96:, 0], 7.0, atol=1e-3)
    np.testing.assert_allclose(flow[:, 96:, 1], -5.0, atol=1e-3)
