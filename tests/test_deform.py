"""Deformation nets vs a torch mirror with identical weights
(reference: DirectTemporalNeRF, gaussian_model.py:242-316)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from gs_deformable_tpu.config import DeformConfig
from gs_deformable_tpu.models import deform


def torch_mirror(params, x, t, multires_x, multires_t, skips):
    """Independent torch implementation of posenc + skip-MLP + heads."""

    def enc(v, L):
        feats = [v]
        for i in range(L):
            feats += [torch.sin(v * 2.0**i), torch.cos(v * 2.0**i)]
        return torch.cat(feats, -1)

    xe = enc(x, multires_x)
    te = enc(t, multires_t)
    h = torch.cat([xe, te], -1)
    for i, layer in enumerate(params["layers"]):
        w = torch.from_numpy(np.asarray(layer["w"]))
        b = torch.from_numpy(np.asarray(layer["b"]))
        h = torch.relu(h @ w + b)
        if i in skips:
            h = torch.cat([xe, h], -1)
    outs = []
    for head in params["heads"]:
        w = torch.from_numpy(np.asarray(head["w"]))
        b = torch.from_numpy(np.asarray(head["b"]))
        outs.append(h @ w + b)
    return outs


def test_offset_net_matches_torch_mirror(rng):
    cfg = DeformConfig(depth=4, width=64)
    params = deform.init_offset_net(jax.random.PRNGKey(0), cfg)
    n = 17
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    t = np.float32(0.375)
    got = deform.deform_offsets(
        params, jnp.asarray(xyz), t, jnp.asarray(5000), cfg
    )
    tx = torch.from_numpy(xyz)
    tt = torch.full((n, 1), float(t))
    want = torch_mirror(params, tx, tt, cfg.multires_xyz, cfg.multires_time, cfg.skips)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=2e-4, atol=2e-5)


def test_warmup_gate(rng):
    cfg = DeformConfig(depth=2, width=32, warmup_iters=3000)
    params = deform.init_offset_net(jax.random.PRNGKey(1), cfg)
    xyz = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    outs_warm = deform.deform_offsets(params, xyz, 0.5, jnp.asarray(2999), cfg)
    for o in outs_warm:
        np.testing.assert_array_equal(np.asarray(o), 0.0)
    outs_live = deform.deform_offsets(params, xyz, 0.5, jnp.asarray(3000), cfg)
    assert any(float(jnp.abs(o).max()) > 0 for o in outs_live)


def test_se3_net_rigid_motion(rng):
    cfg = DeformConfig(depth=2, width=32)
    params = deform.init_se3_net(jax.random.PRNGKey(2), cfg)
    xyz = jnp.asarray(rng.normal(size=(12, 3)), jnp.float32)
    # warmup: identity
    same = deform.deform_se3(params, xyz, 0.3, jnp.asarray(100), cfg)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(xyz))
    moved = deform.deform_se3(params, xyz, 0.3, jnp.asarray(5000), cfg)
    assert np.isfinite(np.asarray(moved)).all()
    assert float(jnp.abs(moved - xyz).max()) > 0
    # gradients flow to the net parameters
    g = jax.grad(
        lambda p: jnp.sum(deform.deform_se3(p, xyz, 0.3, jnp.asarray(5000), cfg) ** 2)
    )(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_opacity_mask_gate(rng):
    cfg = DeformConfig(depth=2, width=32)
    heads = deform.make_latent_heads(jax.random.PRNGKey(3), cfg)
    xyz = jnp.asarray(rng.normal(size=(6, 3)), jnp.float32)
    ones = deform.opacity_mask_gate(heads, xyz, 0.2, jnp.asarray(10), cfg)
    np.testing.assert_array_equal(np.asarray(ones), 1.0)
    gate = deform.opacity_mask_gate(heads, xyz, 0.2, jnp.asarray(9000), cfg)
    a = np.asarray(gate)
    assert ((a > 0) & (a < 1)).all()


def test_bfloat16_compute_close_to_fp32(rng):
    cfg = DeformConfig(depth=4, width=64)
    params = deform.init_offset_net(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    a = deform.deform_offsets(params, xyz, 0.4, jnp.asarray(5000), cfg)
    b = deform.deform_offsets(params, xyz, 0.4, jnp.asarray(5000), cfg,
                              compute_dtype=jnp.bfloat16)
    for x, y in zip(a, b):
        scale = float(jnp.abs(x).max()) + 1e-6
        assert float(jnp.abs(x - y).max()) < 0.05 * scale


def test_bf16_cotangent_backward_close_to_bf16(rng):
    """The bfloat16_bwd tier: identical FORWARD to the bf16 tier (same
    one-pass bf16 dots), and a backward whose bf16-truncated cotangents stay
    within bf16-relative error of the fp32-cotangent bf16-tier gradients."""
    cfg = DeformConfig(depth=4, width=64)
    params = deform.init_offset_net(jax.random.PRNGKey(0), cfg)
    xyz = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)

    def loss(p, dtype):
        outs = deform.deform_offsets(
            p, xyz, 0.4, jnp.asarray(5000), cfg, compute_dtype=dtype)
        return sum(jnp.sum(o * o) for o in outs)

    la, ga = jax.value_and_grad(loss)(params, jnp.bfloat16)
    lb, gb = jax.value_and_grad(loss)(params, "bfloat16_bwd")
    assert float(la) == float(lb)  # same forward dots
    leaves_a = jax.tree_util.tree_leaves(ga)
    leaves_b = jax.tree_util.tree_leaves(gb)
    for x, y in zip(leaves_a, leaves_b):
        assert bool(jnp.isfinite(y).all())
        scale = float(jnp.abs(x).max()) + 1e-6
        assert float(jnp.abs(x - y).max()) < 0.05 * scale


def test_block_rows_matches_unblocked():
    """lax.map row blocking is a pure scheduling change: identical outputs."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gs_deformable_tpu.config import DeformConfig
    from gs_deformable_tpu.models import deform as deform_mod

    cfg0 = DeformConfig(depth=2, width=32, warmup_iters=0, sh_coeffs=4,
                        block_rows=0)
    cfgb = dataclasses.replace(cfg0, block_rows=8)
    params = deform_mod.init_offset_net(jax.random.PRNGKey(1), cfg0)
    xyz = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (32, 3)), jnp.float32)
    t = jnp.float32(0.4)
    it = jnp.asarray(10)
    out0 = deform_mod.deform_offsets(params, xyz, t, it, cfg0)
    outb = deform_mod.deform_offsets(params, xyz, t, it, cfgb)
    for a, b in zip(out0, outb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # gradients agree too (lax.map differentiates as a scan)
    def loss(c, x):
        o = deform_mod.deform_offsets(params, x, t, it, c)
        return sum(jnp.sum(v * v) for v in o)
    g0 = jax.grad(lambda x: loss(cfg0, x))(xyz)
    gb = jax.grad(lambda x: loss(cfgb, x))(xyz)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(gb),
                               rtol=1e-6, atol=1e-7)

    se3_0 = deform_mod.deform_se3(
        deform_mod.init_se3_net(jax.random.PRNGKey(2), cfg0), xyz, t, it, cfg0)
    se3_b = deform_mod.deform_se3(
        deform_mod.init_se3_net(jax.random.PRNGKey(2), cfgb), xyz, t, it, cfgb)
    np.testing.assert_array_equal(np.asarray(se3_0), np.asarray(se3_b))
