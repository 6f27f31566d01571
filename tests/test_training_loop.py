"""Training loop: fit() with checkpointing and resume (tiny, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ufm_tpu.models import UFMNet, ufm_tiny_config
from ufm_tpu.training import fit, synthetic_batch


def _batches(n, bs=2, h=42, w=56):
    for i in range(n):
        yield {k: np.asarray(v) for k, v in synthetic_batch(bs, h, w, seed=i).items()}


@pytest.fixture(scope="module")
def tiny_net_params():
    cfg = ufm_tiny_config()
    net = UFMNet(cfg)
    img = jnp.zeros((2, 42, 56, 3))
    params = net.init(jax.random.PRNGKey(0), img, img)["params"]
    return net, params


def test_fit_reduces_loss(tiny_net_params):
    net, params = tiny_net_params
    out = fit(net, params, _batches(12), num_steps=12, learning_rate=3e-4,
              warmup_steps=0, log_every=0)
    assert out["step"] == 12
    assert np.isfinite(float(out["metrics"]["total_loss"]))


@pytest.mark.slow
@pytest.mark.parametrize("mode", [True, "encoder"])
def test_remat_matches_plain_gradients(tiny_net_params, mode):
    """train_remat (both-stacks True and the partial "encoder" mode) must
    change only memory, not numerics: identical param structure and matching
    loss gradients (nn/layers.py scan_transformer_blocks remat path)."""
    import dataclasses

    net, params = tiny_net_params
    net_r = UFMNet(dataclasses.replace(net.cfg, train_remat=mode))
    img = jnp.zeros((2, 42, 56, 3))
    params_r = net_r.init(jax.random.PRNGKey(0), img, img)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_r)

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, 42, 56, seed=3).items()}

    def grads(n, p):
        def loss_fn(pp):
            out = n.apply({"params": pp}, batch["img1"], batch["img2"])
            return jnp.mean((out["flow"] - batch["gt_flow"]) ** 2)

        return jax.grad(loss_fn)(p)

    g0 = grads(net, params)
    g1 = grads(net_r, params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_pallas_attention_backward_matches_xla_through_model(tiny_net_params, monkeypatch):
    """Full-model training gradients with the Pallas flash backward vs the
    XLA einsum VJP (VERDICT r4 next #1): the kernel swap must not move the
    loss gradient beyond matmul-rounding noise."""
    net, params = tiny_net_params
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, 42, 56, seed=5).items()}

    def grads():
        def loss_fn(pp):
            out = net.apply({"params": pp}, batch["img1"], batch["img2"])
            return jnp.mean((out["flow"] - batch["gt_flow"]) ** 2)

        return jax.grad(loss_fn)(params)

    monkeypatch.setenv("UFM_ATTN_BWD", "pallas")
    g_pallas = grads()
    monkeypatch.setenv("UFM_ATTN_BWD", "xla")
    g_xla = grads()
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6)


@pytest.mark.slow
def test_fit_checkpoint_resume(tmp_path, tiny_net_params):
    pytest.importorskip("orbax.checkpoint")
    net, params = tiny_net_params
    ckpt = str(tmp_path / "ckpt")

    out1 = fit(net, params, _batches(4), num_steps=4, warmup_steps=0,
               checkpoint_dir=ckpt, checkpoint_every=2, log_every=0)
    assert out1["step"] == 4

    # resume: starts at 4, runs to 6
    logs = []
    out2 = fit(net, params, _batches(10), num_steps=6, warmup_steps=0,
               checkpoint_dir=ckpt, checkpoint_every=100, log_every=0,
               log_fn=logs.append)
    assert any("resumed from step 4" in l for l in logs)
    assert out2["step"] == 6


@pytest.mark.parametrize(
    "policy",
    [
        "dots_with_no_batch_dims_saveable",
        # composite: also saves the checkpoint_name-tagged flash-attention
        # core output so the backward skips the attention-forward recompute
        "dots_with_no_batch_dims_and_attn_out_saveable",
    ],
)
def test_remat_policy_matches_plain_gradients(tiny_net_params, policy):
    """train_remat_policy (jax.checkpoint_policies member) must change only
    the memory/recompute trade, not numerics — and an unknown policy name
    must fail loudly (nn/layers.py::resolve_remat_policy)."""
    import dataclasses

    net, params = tiny_net_params
    net_p = UFMNet(
        dataclasses.replace(net.cfg, train_remat=True, train_remat_policy=policy)
    )
    img = jnp.zeros((2, 42, 56, 3))
    params_p = net_p.init(jax.random.PRNGKey(0), img, img)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_p)

    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(2, 42, 56, seed=3).items()}

    def grads(n, p):
        def loss_fn(pp):
            out = n.apply({"params": pp}, batch["img1"], batch["img2"])
            return jnp.mean((out["flow"] - batch["gt_flow"]) ** 2)

        return jax.grad(loss_fn)(p)

    g0 = grads(net, params)
    g1 = grads(net_p, params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    # both nonexistent names AND policy *factories* (which would be silently
    # invoked as predicates if passed through) must fail loudly (ADVICE r3)
    for name in ("bogus", "save_only_these_names", "save_from_both_policies"):
        bad = UFMNet(dataclasses.replace(net.cfg, train_remat=True, train_remat_policy=name))
        with pytest.raises(ValueError, match="unknown remat policy"):
            jax.grad(
                lambda pp: jnp.mean(bad.apply({"params": pp}, img, img)["flow"] ** 2)
            )(params)
