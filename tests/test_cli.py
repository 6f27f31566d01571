"""CLI smoke tests (no model downloads, no TPU)."""

import subprocess
import sys

import numpy as np
import pytest


def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "ufm_tpu.cli"], capture_output=True, text=True
    )
    assert "Available commands" in out.stdout


def test_cli_test_subcommand():
    out = subprocess.run(
        [sys.executable, "-m", "ufm_tpu.cli", "test"], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "UFM-TPU model imports" in out.stdout


def test_attention_impl_override(monkeypatch, rng):
    """UFM_TPU_ATTENTION env var forces the attention implementation."""
    import jax.numpy as jnp

    from ufm_tpu.ops import attention

    q = jnp.asarray(rng.standard_normal((1, 8, 2, 4)).astype(np.float32))
    ref = attention.dot_product_attention(q, q, q, impl="xla")
    got = attention.dot_product_attention(q, q, q, impl="pallas")  # interpret on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        attention.dot_product_attention(q, q, q, impl="bogus")


def test_flow_to_color_properties(rng):
    from ufm_tpu.utils.viz import flow_to_color

    flow = rng.standard_normal((16, 20, 2)).astype(np.float32) * 5
    img = flow_to_color(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # zero flow must map to (near-)white (colorwheel center)
    white = flow_to_color(np.zeros((4, 4, 2), np.float32))
    assert (white > 240).all()
