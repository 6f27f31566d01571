"""Bundled synthetic pairs + the reference's real photo pairs (data-only)."""

import os

import numpy as np
import pytest

from ufm_tpu.utils.example_pairs import (
    PAIR_NAMES,
    REFERENCE_PAIR_NAMES,
    ensure_bundled_pairs,
    load_pair,
    reference_pair_dir,
)


def test_ensure_bundled_pairs_regenerates_missing_flow(tmp_path):
    """A directory with images but a deleted flow .npy must be regenerated —
    the golden-image check and ``ufm eval`` require the flow files (ADVICE r3)."""
    pytest.importorskip("cv2")
    d = str(tmp_path / "pairs")
    out = ensure_bundled_pairs(d)
    assert out == d
    for n in PAIR_NAMES:
        assert os.path.exists(os.path.join(d, f"{n}_flow.npy"))

    os.remove(os.path.join(d, f"{PAIR_NAMES[0]}_flow.npy"))
    ensure_bundled_pairs(d)
    assert os.path.exists(os.path.join(d, f"{PAIR_NAMES[0]}_flow.npy"))


def test_reference_pair_dir_absent(tmp_path, monkeypatch):
    """Unmounted snapshot (or an incomplete directory) resolves to None."""
    monkeypatch.setenv("UFM_REFERENCE_PAIRS", str(tmp_path))
    assert reference_pair_dir() is None


def test_reference_pairs_load_as_rgb():
    """When the read-only reference snapshot is mounted, all five real photo
    pairs load as RGB uint8 with no ground-truth flow."""
    pytest.importorskip("cv2")
    d = reference_pair_dir()
    if d is None:
        pytest.skip("reference snapshot not mounted")
    for n in REFERENCE_PAIR_NAMES:
        img0, img1, flow = load_pair(d, n)
        assert img0.dtype == np.uint8 and img0.ndim == 3 and img0.shape[2] == 3
        assert img1.dtype == np.uint8 and img1.ndim == 3 and img1.shape[2] == 3
        assert max(img0.shape[:2] + img1.shape[:2]) == 1080  # 1080px long side
        assert flow is None  # real photos: no GT — cycle consistency instead


def test_load_pair_returns_flow_for_synthetic(tmp_path):
    pytest.importorskip("cv2")
    d = ensure_bundled_pairs(str(tmp_path / "pairs"))
    img0, img1, flow = load_pair(d, PAIR_NAMES[0])
    assert flow is not None and flow.shape == img0.shape[:2] + (2,)
