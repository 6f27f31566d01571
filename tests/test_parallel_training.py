"""Sharded training-step tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

# mesh-heavy: excluded from the quick lane (pytest -m "not slow")
pytestmark = pytest.mark.slow

from ufm_tpu.models import UFMNet, ufm_tiny_config
from ufm_tpu.parallel import batch_sharding, make_mesh, shard_params
from ufm_tpu.training import make_optimizer, make_sharded_train_step, synthetic_batch


@pytest.fixture(scope="module")
def tiny_net_and_params():
    cfg = ufm_tiny_config()
    net = UFMNet(cfg)
    import jax.numpy as jnp

    w, h = (56, 42)
    img = jnp.zeros((2, h, w, 3))
    params = net.init(jax.random.PRNGKey(0), img, img)["params"]
    return net, params


def test_mesh_creation():
    assert jax.device_count() == 8, "conftest must force 8 virtual CPU devices"
    mesh = make_mesh(8, data=2, fsdp=2, model=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}


def test_shard_params_specs(tiny_net_and_params):
    _, params = tiny_net_and_params
    mesh = make_mesh(8, data=2, fsdp=2, model=2)
    shardings, placed = shard_params(params, mesh)
    # stacked (layers, in, out) qkv kernels must be column-parallel on the
    # model axis with the layer axis replicated
    qkv = shardings["encoder"]["blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == (None, None, "model"), f"qkv not tensor-parallel: {qkv.spec}"
    # placed params keep values
    np.testing.assert_allclose(
        np.asarray(placed["encoder"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["encoder"]["blocks"]["attn"]["qkv"]["kernel"]),
    )


def test_sharded_train_step_runs(tiny_net_and_params):
    net, params = tiny_net_and_params
    mesh = make_mesh(8, data=2, fsdp=2, model=2)

    optimizer = make_optimizer(params, learning_rate=1e-3, warmup_steps=0)
    step, placed_params, opt_state, place_batch = make_sharded_train_step(
        net.apply, optimizer, mesh, params
    )

    batch = place_batch(synthetic_batch(2, 42, 56))
    with mesh:
        new_params, new_opt_state, metrics = step(placed_params, opt_state, batch)

    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)
    assert float(metrics["epe"]) > 0
    # params must actually change
    before = np.asarray(params["head1"]["processor"]["conv3"]["kernel"])
    after = np.asarray(new_params["head1"]["processor"]["conv3"]["kernel"])
    assert not np.allclose(before, after)


def test_data_parallel_inference_matches_single(tiny_net_and_params, rng):
    import jax.numpy as jnp

    from ufm_tpu.models import UniFlowMatchConfidence, ufm_tiny_config
    from ufm_tpu.parallel import make_data_parallel_forward, make_mesh

    model = UniFlowMatchConfidence.from_config(ufm_tiny_config())
    mesh = make_mesh(8, data=8)

    w, h = model.inference_resolution[0]
    src = rng.standard_normal((8, h, w, 3)).astype(np.float32)
    tgt = rng.standard_normal((8, h, w, 3)).astype(np.float32)

    dp = make_data_parallel_forward(model, mesh)
    with mesh:
        sharded = dp(src, tgt)

    single = model.net.apply({"params": model.params}, jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(
        np.asarray(sharded["flow"]), np.asarray(single["flow"]), rtol=1e-4, atol=1e-4
    )


def test_tp_fsdp_forward_matches_single(tiny_net_and_params, rng):
    """A model=2 / fsdp=2 / data=2 sharded *forward* must match single-device
    numerics — pins the TP regex rules + FSDP fallback against silent
    partition errors (XLA SPMD should only change layout, never math)."""
    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as P

    net, params = tiny_net_and_params
    img1 = jnp.asarray(rng.standard_normal((4, 42, 56, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((4, 42, 56, 3)).astype(np.float32))

    single = net.apply({"params": params}, img1, img2)

    mesh = make_mesh(8, data=2, fsdp=2, model=2)
    shardings, placed = shard_params(params, mesh)
    batch_spec = NamedSharding(mesh, P("data"))

    def _sharded_apply(p, a, b):
        from ufm_tpu.ops.flash_attention import spmd_attention

        with spmd_attention():
            return net.apply({"params": p}, a, b)

    fwd = jax.jit(_sharded_apply, in_shardings=(shardings, batch_spec, batch_spec))
    with mesh:
        sharded = fwd(placed, jax.device_put(img1, batch_spec), jax.device_put(img2, batch_spec))

    for key in single:
        np.testing.assert_allclose(
            np.asarray(sharded[key]), np.asarray(single[key]), rtol=2e-4, atol=2e-4, err_msg=key
        )


def test_flagship_sharded_train_step_lowers():
    """FLAGSHIP-shape sharded lowering proof (VERDICT r3 #5): AOT-lower the
    full train step at real dims (ViT-L/14 560x420, 3x1024 fused qkv, 768
    info dim, scan-stacked rank-3 kernels, 428M params) over the (2,2,2)
    mesh using ShapeDtypeStructs — proving the TP/FSDP rules divide the real
    kernel shapes without materializing any parameters."""
    import dataclasses

    import jax.numpy as jnp

    from ufm_tpu.models import ufm_base_config
    from ufm_tpu.parallel import tree_shardings
    from ufm_tpu.training import make_optimizer, make_train_step

    cfg = dataclasses.replace(ufm_base_config(), train_remat=True)
    net = UFMNet(cfg)
    h, w = 420, 560
    img_spec = jax.ShapeDtypeStruct((2, h, w, 3), jnp.float32)
    params_spec = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((2, h, w, 3)), jnp.zeros((2, h, w, 3)))
    )["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params_spec))
    assert n_params > 400e6, "flagship confidence variant expected (~428M params)"

    mesh = make_mesh(8, data=2, fsdp=2, model=2)
    param_sh = tree_shardings(params_spec, mesh)

    # the hot kernels must actually receive model/fsdp-sharded specs at
    # flagship dims (divisibility of 3*1024 qkv and the 4096 MLP by 2)
    enc = param_sh["encoder"]["blocks"]
    assert enc["attn"]["qkv"]["kernel"].spec == (None, None, "model")
    assert enc["attn"]["proj"]["kernel"].spec == (None, "model", None)
    assert enc["mlp"]["fc1"]["kernel"].spec == (None, None, "model")
    assert enc["mlp"]["fc2"]["kernel"].spec == (None, "model", None)
    sharded_frac = sum(
        int(np.prod(s.shape))
        for s, sh in zip(jax.tree.leaves(params_spec), jax.tree.leaves(param_sh))
        if any(a is not None for a in sh.spec)
    ) / n_params
    assert sharded_frac > 0.9, f"only {sharded_frac:.0%} of params sharded"

    optimizer = make_optimizer(params_spec, learning_rate=1e-4)
    opt_spec = jax.eval_shape(optimizer.init, params_spec)
    opt_sh = tree_shardings(opt_spec, mesh)  # mu/nu mirror the param paths
    batch_spec = {
        "img1": img_spec,
        "img2": img_spec,
        "gt_flow": jax.ShapeDtypeStruct((2, h, w, 2), jnp.float32),
        "gt_covisibility": jax.ShapeDtypeStruct((2, h, w), jnp.float32),
    }
    batch_sh = {k: batch_sharding(mesh, len(v.shape)) for k, v in batch_spec.items()}

    step = make_train_step(net.apply, optimizer, spmd=True)
    with mesh:
        lowered = jax.jit(
            step, in_shardings=(param_sh, opt_sh, batch_sh), donate_argnums=(0, 1)
        ).lower(params_spec, opt_spec, batch_spec)
    text = lowered.as_text()
    assert "sharding" in text  # SPMD annotations made it into the StableHLO

    # adam moments inherited the param shardings (FSDP memory scaling is real)
    specs = [s.spec for s in jax.tree.leaves(opt_sh) if hasattr(s, "spec")]
    assert any(tuple(s) == (None, None, "model") for s in specs)


def test_flagship_dp_inference_lowers():
    """DP inference path at flagship dims: batch on all 8 devices' data axis,
    params replicated — the SURVEY §5 deployment mapping — must lower."""
    import jax.numpy as jnp

    from ufm_tpu.models import ufm_base_config
    from ufm_tpu.parallel import tree_shardings

    net = UFMNet(ufm_base_config())
    h, w = 420, 560
    params_spec = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))
    )["params"]
    mesh = make_mesh(8, data=8)
    param_sh = tree_shardings(params_spec, mesh)  # data-only mesh -> replicated
    assert all(all(a is None for a in s.spec) for s in jax.tree.leaves(param_sh))
    batch_spec = jax.ShapeDtypeStruct((8, h, w, 3), jnp.float32)
    bs = batch_sharding(mesh, 4)

    def fwd(p, a, b):
        from ufm_tpu.ops.flash_attention import spmd_attention

        with spmd_attention():
            return net.apply({"params": p}, a, b)

    with mesh:
        lowered = jax.jit(fwd, in_shardings=(param_sh, bs, bs)).lower(
            params_spec, batch_spec, batch_spec
        )
    assert "sharding" in lowered.as_text()


def test_tp_fsdp_refine_staged_matches_single(rng):
    """The refine variant's param families (patch-MLP classification head,
    UNet convs, window-dots refinement) have their own kernel shapes; push
    them through shard_params + a model=2/fsdp=2/data=2 mesh and require the
    STAGED production path (backbone + refine_tail) to match single-device
    numerics. Pins the TP regexes (incl. the generic fc\\d* rule matching the
    classification head) against divisibility/partition regressions."""
    import jax.numpy as jnp

    from jax.sharding import NamedSharding, PartitionSpec as P

    from ufm_tpu.models import UFMNet, ufm_tiny_config

    cfg = ufm_tiny_config(
        has_classification_head=True,
        use_unet_feature=True,
        refinement_range=3,
        refinement_impl="xla",
    )
    net = UFMNet(cfg)
    img1 = jnp.asarray(rng.standard_normal((4, 42, 56, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((4, 42, 56, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img1, img2)["params"]

    single_bb = net.apply({"params": params}, img1, img2, method="backbone")
    single_tail = net.apply(
        {"params": params},
        img1,
        img2,
        single_bb["flow"],
        single_bb["cls_in_0"],
        single_bb["cls_in_1"],
        method="refine_tail",
    )

    mesh = make_mesh(8, data=2, fsdp=2, model=2)
    shardings, placed = shard_params(params, mesh)
    batch_spec = NamedSharding(mesh, P("data"))

    bb = jax.jit(
        lambda p, a, b: net.apply({"params": p}, a, b, method="backbone"),
        in_shardings=(shardings, batch_spec, batch_spec),
        # pin stage-boundary tensors to the batch sharding: the staged
        # production contract (tail consumes data-sharded activations)
        out_shardings=batch_spec,
    )
    tail = jax.jit(
        lambda p, a, b, f, c0, c1: net.apply(
            {"params": p}, a, b, f, c0, c1, method="refine_tail"
        ),
        in_shardings=(shardings, batch_spec, batch_spec, batch_spec, batch_spec, batch_spec),
    )
    with mesh:
        s_bb = bb(placed, jax.device_put(img1, batch_spec), jax.device_put(img2, batch_spec))
        s_tail = tail(
            placed,
            jax.device_put(img1, batch_spec),
            jax.device_put(img2, batch_spec),
            s_bb["flow"],
            s_bb["cls_in_0"],
            s_bb["cls_in_1"],
        )

    for key in single_bb:
        np.testing.assert_allclose(
            np.asarray(s_bb[key]), np.asarray(single_bb[key]), rtol=2e-4, atol=2e-4, err_msg=key
        )
    for key in single_tail:
        np.testing.assert_allclose(
            np.asarray(s_tail[key]),
            np.asarray(single_tail[key]),
            rtol=2e-4,
            atol=2e-4,
            err_msg=key,
        )
