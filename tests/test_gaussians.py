"""Gaussian state, Adam parity with torch, densify/prune slot semantics
(reference: gaussian_model.py:632-1257)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from gs_deformable_tpu.models import gaussians as G


def make_state(rng, n=6, cap=16):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return G.init_from_points(pts, cols, capacity=cap, sh_degree=3)


def test_init_from_points(rng):
    st = make_state(rng)
    assert int(st.num_alive) == 6
    assert st.capacity == 16
    np.testing.assert_allclose(np.asarray(st.get_opacity())[:6], 0.1, rtol=1e-5)
    # scales replicate log(sqrt(knn)) across the 3 axes
    s = np.asarray(st.scaling[:6])
    assert (s[:, 0] == s[:, 1]).all() and (s[:, 1] == s[:, 2]).all()
    # identity quats everywhere (incl. dead slots for finite activations)
    np.testing.assert_array_equal(np.asarray(st.rotation[:, 0]), 1.0)
    assert not bool(st.alive[6:].any())


def test_adam_matches_torch(rng):
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    lr = 0.01
    params = {"xyz": jnp.asarray(p0)}
    opt = G.adam_init(params)
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, eps=1e-15)
    for i in range(4):
        g = rng.normal(size=(5, 3)).astype(np.float32)
        params, opt = G.adam_step(
            params, {"xyz": jnp.asarray(g)}, opt, {"xyz": jnp.float32(lr)}
        )
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["xyz"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def _zero_moments(st):
    p = st.params()
    z = {k: jnp.zeros_like(v) for k, v in p.items()}
    return z, {k: jnp.zeros_like(v) for k, v in p.items()}


def test_densify_clone_and_split(rng):
    st = make_state(rng, n=4, cap=32)
    # gaussian 0: high grad + small scale -> clone; 1: high grad + big scale -> split
    scal = np.asarray(st.scaling).copy()
    scal[:] = np.log(0.001)  # below percent_dense * extent -> clone regime
    scal[1] = np.log(10.0)  # above -> split regime
    st = st.replace(scaling=jnp.asarray(scal))
    accum = np.zeros((32, 1), np.float32)
    accum[0] = accum[1] = 1.0
    denom = np.zeros((32, 1), np.float32)
    denom[:4] = 1.0
    st = st.replace(xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom))
    mu, nu = _zero_moments(st)
    mu["xyz"] = mu["xyz"] + 7.0  # sentinel: surviving moments preserved
    st2, mu2, nu2, info = G.densify_and_prune(
        st, mu, nu, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, use_screen_prune=False,
    )
    assert int(info.n_cloned) == 1 and int(info.n_split) == 1
    # 4 alive - 1 split parent + 1 clone + 2 children = 6
    assert int(info.n_alive) == 6
    alive = np.asarray(st2.alive)
    assert not alive[1]  # split parent killed
    # clone of 0 exists somewhere with identical params
    xyz2 = np.asarray(st2.xyz)
    clones = [i for i in range(4, 32) if alive[i] and np.allclose(xyz2[i], xyz2[0])]
    assert len(clones) == 1
    # children carry scale/1.6 of the parent
    child_scale = np.log(10.0 / 1.6)
    children = [i for i in range(4, 32) if alive[i] and np.allclose(np.asarray(st2.scaling)[i], child_scale)]
    assert len(children) == 2
    # moments: new slots zeroed, survivors keep the sentinel
    mu_xyz = np.asarray(mu2["xyz"])
    assert np.all(mu_xyz[clones[0]] == 0.0) and np.all(mu_xyz[0] == 7.0)
    # stats reset (densification_postfix :1123-1127)
    assert float(jnp.abs(st2.xyz_gradient_accum).max()) == 0.0
    assert float(st2.max_radii2d.max()) == 0.0


def test_densify_prune_low_opacity(rng):
    st = make_state(rng, n=4, cap=8)
    op = np.asarray(st.opacity).copy()
    op[2] = -10.0  # sigmoid ~ 0 < min_opacity
    st = st.replace(opacity=jnp.asarray(op))
    mu, nu = _zero_moments(st)
    st2, _, _, info = G.densify_and_prune(
        st, mu, nu, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, use_screen_prune=False,
    )
    assert not bool(st2.alive[2])
    assert int(info.n_pruned) == 1


def test_densify_capacity_overflow_drops(rng):
    st = make_state(rng, n=6, cap=8)  # only 2 free slots
    st = st.replace(scaling=jnp.full_like(st.scaling, np.log(0.001)))  # clone regime
    accum = np.ones((8, 1), np.float32)
    denom = np.ones((8, 1), np.float32)
    st = st.replace(xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom))
    mu, nu = _zero_moments(st)
    st2, _, _, info = G.densify_and_prune(
        st, mu, nu, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, use_screen_prune=False,
    )
    assert int(info.n_dropped) == 4  # 6 clones wanted, 2 slots
    assert int(info.n_alive) == 8


def test_screen_prune_world_size(rng):
    st = make_state(rng, n=4, cap=8)
    scal = np.asarray(st.scaling).copy()
    scal[3] = np.log(100.0)  # way over 0.1 * extent
    st = st.replace(scaling=jnp.asarray(scal))
    mu, nu = _zero_moments(st)
    st2, _, _, _ = G.densify_and_prune(
        st, mu, nu, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, use_screen_prune=True,
    )
    assert not bool(st2.alive[3])


def test_reset_opacity(rng):
    st = make_state(rng)
    mu, nu = _zero_moments(st)
    mu["opacity"] = mu["opacity"] + 3.0
    st2, mu2, _ = G.reset_opacity(st, mu, nu)
    assert float(st2.get_opacity().max()) <= 0.01 + 1e-6
    assert float(jnp.abs(mu2["opacity"]).max()) == 0.0


def test_stats_accumulation(rng):
    st = make_state(rng, n=4, cap=8)
    grad = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    vis = jnp.asarray([True, False, True, False, False, False, False, False])
    radii = jnp.asarray([5, 0, 9, 0, 0, 0, 0, 0], jnp.int32)
    st2 = G.add_densification_stats(st, grad, vis, radii)
    want0 = np.linalg.norm(np.asarray(grad)[0, :2])
    np.testing.assert_allclose(float(st2.xyz_gradient_accum[0, 0]), want0, rtol=1e-6)
    assert float(st2.denom[1, 0]) == 0.0
    assert float(st2.max_radii2d[2]) == 9.0


def test_densify_offset_gated(rng):
    """Latent densify_and_prune_4offset capability (gaussian_model.py:1154-1249):
    the offset mask gates which gaussians may clone/split."""
    st = make_state(rng, n=4, cap=16)
    st = st.replace(scaling=jnp.full_like(st.scaling, np.log(0.001)))
    accum = np.zeros((16, 1), np.float32)
    accum[:4] = 1.0
    denom = np.zeros((16, 1), np.float32)
    denom[:4] = 1.0
    st = st.replace(xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom))
    mu, nu = _zero_moments(st)
    offset_mask = jnp.asarray(
        [True, False, False, False] + [False] * 12
    )
    st2, _, _, info = G.densify_and_prune(
        st, mu, nu, jax.random.PRNGKey(0),
        grad_threshold=0.5, min_opacity=0.005, extent=1.0,
        percent_dense=0.01, use_screen_prune=False, offset_mask=offset_mask,
    )
    assert int(info.n_cloned) == 1  # only the masked gaussian densifies
    assert int(info.n_split) == 0


def test_offset_gated_densification():
    """densify_offset_gate restricts clone/split to gaussians whose latest
    deformation offset norm passes the threshold (reference latent
    densify_and_prune_4offset, gaussian_model.py:1154-1249 via train.py:659:
    offset_mask = norm(means3D_offset) >= 0.3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gs_deformable_tpu import training
    from gs_deformable_tpu.config import Config, OptimizationConfig
    from gs_deformable_tpu.models import gaussians as G

    rng = np.random.default_rng(3)
    n, cap = 24, 64
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=1)
    # every alive row passes the grad gate; only rows 0..11 pass the offset gate
    accum = np.zeros((cap, 1), np.float32)
    accum[:n] = 1.0
    offs = np.zeros(cap, np.float32)
    offs[:12] = 0.5
    state = state.replace(
        xyz_gradient_accum=jnp.asarray(accum),
        denom=jnp.asarray(np.ones((cap, 1), np.float32)),
        last_offset_norm=jnp.asarray(offs),
    )

    def run(gate):
        cfg = Config(opt=OptimizationConfig(densify_offset_gate=gate))
        # fresh buffers each run: the densify step donates its input state
        st = jax.tree_util.tree_map(jnp.array, state)
        ts = training.init_train_state(st, seed=0, cfg=cfg)
        dens = training.make_densify_step(cfg, extent=3.0,
                                          use_screen_prune=False)
        ts2, info = dens(ts, jnp.float32(1e-4), jnp.float32(0.005))
        return ts2, {k: int(v) for k, v in info.items()}

    _, ungated = run(0.0)
    _, gated = run(0.3)
    assert ungated["n_cloned"] + ungated["n_split"] == n
    assert gated["n_cloned"] + gated["n_split"] == 12
    assert gated != ungated


def test_train_step_records_offset_norms():
    """The fused step stores the latest per-gaussian |dx| for the gate."""
    import jax.numpy as jnp
    import numpy as np
    from gs_deformable_tpu import training
    from gs_deformable_tpu.config import Config, DeformConfig, ModelConfig, RasterizeConfig
    from gs_deformable_tpu.models import gaussians as G
    from gs_deformable_tpu.renderer import CameraArrays
    from gs_deformable_tpu.ops import transforms as tf

    rng = np.random.default_rng(0)
    n, cap = 20, 32
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                    rng.uniform(3, 6, n)], -1).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    state = G.init_from_points(pts, cols, capacity=cap, sh_degree=1)
    cfg = Config(
        model=ModelConfig(sh_degree=1),
        deform=DeformConfig(depth=2, width=32, warmup_iters=2, sh_coeffs=4),
        raster=RasterizeConfig(instance_capacity=1024, chunk=8),
    )
    ts = training.init_train_state(state, seed=0, cfg=cfg)
    fov = 0.8
    view = np.eye(4, dtype=np.float32)
    proj = tf.projection_matrix(0.01, 100.0, fov, fov)
    cam = CameraArrays(
        world_view=jnp.asarray(view), full_proj=jnp.asarray(view @ proj),
        camera_center=jnp.zeros(3), time=jnp.float32(0.3),
    )
    step = training.make_train_step(
        cfg, width=32, height=32, tan_fovx=float(np.tan(fov / 2)),
        tan_fovy=float(np.tan(fov / 2)), active_sh_degree=0,
        spatial_lr_scale=1.0,
    )
    gt = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)), jnp.float32)
    ts, _ = step(ts, cam, gt, jnp.zeros(3), jnp.asarray(10))  # past warmup
    norms = np.asarray(ts.gaussians.last_offset_norm)
    assert (norms[:n] > 0).any()  # deformation active -> nonzero offsets
    assert (norms[n:] == 0).all()  # dead slots stay zero
