"""Fixed-capacity Gaussian parameter state + Adam + densification (all jittable).

TPU re-design of ``GaussianModel`` (/root/reference/scene/gaussian_model.py:632-1257).
The reference reallocates every parameter tensor and performs "optimizer
surgery" on each densify/prune (cat/prune/replace at :1027-1105).  On TPU all
shapes are static: the state has a fixed *capacity* ``P_max`` with an ``alive``
mask; densification writes clones/split-children into free slots and pruning
clears bits — pure functions, stable shapes, no reallocation, the exact
semantics of the reference's surgery (new slots get zeroed Adam moments, as
``cat_tensors_to_optimizer`` does at :1093-1094; survivors keep theirs).

Faithfully-preserved reference quirks (documented, deliberate):
- ``densification_postfix`` zeroes ``max_radii2D`` for *all* points
  (:1127) before ``densify_and_prune`` evaluates its ``big_points_vs`` screen
  -size prune (:1228) — so the screen-size prune never fires.  We replicate
  that: the radii-based term is computed after the same zeroing.
- Gradient stats are reset after every densify round (:1123-1126).
- Split gate uses grads >= threshold on the *scalar accumulated norm*, clone
  gate uses ``torch.norm(grads, dim=-1)`` of the same (P, 1) array — identical
  values (:1134, :1188).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import knn as knn_ops
from ..ops import sh as sh_ops
from ..ops.transforms import quat_to_rotmat
from ..utils.general import inverse_sigmoid

Tree = Any

PARAM_GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


@struct.dataclass
class GaussianState:
    """The capture-tuple analog (gaussian_model.py:686-700), fixed capacity."""

    xyz: jnp.ndarray  # (P, 3)
    f_dc: jnp.ndarray  # (P, 1, 3)
    f_rest: jnp.ndarray  # (P, K-1, 3)
    opacity: jnp.ndarray  # (P, 1) logit
    scaling: jnp.ndarray  # (P, 3) log
    rotation: jnp.ndarray  # (P, 4) unnormalized quat
    alive: jnp.ndarray  # (P,) bool
    max_radii2d: jnp.ndarray  # (P,) float32
    xyz_gradient_accum: jnp.ndarray  # (P, 1)
    denom: jnp.ndarray  # (P, 1)
    # |dx| of the latest rendered frame per gaussian — the offset-gated
    # densification input (reference train.py:659,673: offset_mask =
    # norm(means3D_offset) >= threshold, from the current frame's offsets).
    last_offset_norm: jnp.ndarray  # (P,)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return self.alive.sum()

    # Activations (setup_functions, gaussian_model.py:634-649).
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)

    def get_features(self) -> jnp.ndarray:
        """(P, K, 3) concat of DC + rest (gaussian_model.py:789-793)."""
        return jnp.concatenate([self.f_dc, self.f_rest], axis=1)

    def params(self) -> Dict[str, jnp.ndarray]:
        return {k: getattr(self, k) for k in PARAM_GROUPS}

    def with_params(self, p: Dict[str, jnp.ndarray]) -> "GaussianState":
        return self.replace(**p)


def init_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    sh_degree: int,
) -> GaussianState:
    """create_from_pcd (gaussian_model.py:807-832) into a fixed-capacity state.

    scales = log(sqrt(clamp(knn3_mean_sq_dist, 1e-7))) replicated per axis;
    identity quaternions; opacity = inverse_sigmoid(0.1); SH DC from RGB.
    """
    n = points.shape[0]
    assert n <= capacity, f"{n} points exceed capacity {capacity}"
    K = (sh_degree + 1) ** 2
    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(knn_ops.mean_sq_dist_knn3(pts), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    f_dc = sh_ops.rgb2sh(jnp.asarray(colors, jnp.float32))[:, None, :]
    rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    op = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    return GaussianState(
        xyz=pad(pts),
        f_dc=pad(f_dc),
        f_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        opacity=pad(op),
        scaling=pad(scales),
        # dead-slot quats stay identity so activations remain finite
        rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0),
        alive=pad(jnp.ones(n, bool), False),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
        last_offset_norm=jnp.zeros(capacity, jnp.float32),
    ).replace(rotation=jnp.zeros((capacity, 4), jnp.float32).at[:, 0].set(1.0))


# ---------------------------------------------------------------------------
# Adam with per-group LR and moment surgery (torch.optim.Adam semantics,
# gaussian_model.py:856: eps=1e-15, per-group lr updated per step).
# ---------------------------------------------------------------------------


@struct.dataclass
class AdamState:
    mu: Tree
    nu: Tree
    step: jnp.ndarray  # () int32


def adam_init(params: Tree) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_step(
    params: Tree,
    grads: Tree,
    opt: AdamState,
    lrs: Dict[str, jnp.ndarray],
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> Tuple[Tree, AdamState]:
    """One torch-convention Adam step.  ``params``/``grads`` are dicts keyed by
    group name; ``lrs`` maps the same keys to scalar learning rates (subtrees
    share their group's LR, like torch param groups)."""
    step = opt.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    new_p, new_m, new_v = {}, {}, {}
    for k in params:
        lr = lrs[k]
        out = jax.tree_util.tree_map(
            lambda p, g, m, v: upd(p, g, m, v, lr), params[k], grads[k],
            opt.mu[k], opt.nu[k],
        )
        new_p[k] = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        new_m[k] = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        new_v[k] = jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)


# ---------------------------------------------------------------------------
# Densification statistics (add_densification_stats, gaussian_model.py:1252-1257
# + the max_radii2D running max at train.py:613-615).
# ---------------------------------------------------------------------------


def add_densification_stats(
    state: GaussianState, means2d_ndc_grad: jnp.ndarray, visibility: jnp.ndarray,
    radii: jnp.ndarray,
) -> GaussianState:
    vis = visibility & state.alive
    gn = jnp.linalg.norm(means2d_ndc_grad[:, :2], axis=-1, keepdims=True)
    return state.replace(
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis[:, None], gn, 0.0),
        denom=state.denom + vis[:, None].astype(jnp.float32),
        max_radii2d=jnp.where(
            vis, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


# ---------------------------------------------------------------------------
# Densify / prune / opacity reset.
# ---------------------------------------------------------------------------


class DensifyInfo(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # children that did not fit in capacity
    n_alive: jnp.ndarray


def _scatter_rows(leaf: jnp.ndarray, dest: jnp.ndarray, values: jnp.ndarray):
    return leaf.at[dest].set(values, mode="drop")


def densify_and_prune(
    state: GaussianState,
    mu: Dict[str, jnp.ndarray],
    nu: Dict[str, jnp.ndarray],
    key: jnp.ndarray,
    *,
    grad_threshold,
    min_opacity,
    extent,
    percent_dense: float,
    use_screen_prune: bool,
    max_screen_size: float = 20.0,
    offset_mask: jnp.ndarray = None,
) -> Tuple[GaussianState, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray], DensifyInfo]:
    """densify_and_prune (gaussian_model.py:1219-1233) with static shapes.

    ``mu``/``nu`` are the Adam moment subtrees for the six gaussian param
    groups; children slots get zeroed moments (cat_tensors_to_optimizer
    semantics, :1093-1094).

    ``offset_mask`` optionally gates clone/split to gaussians whose deformation
    offsets are large — the latent ``densify_and_prune_4offset`` capability
    (gaussian_model.py:1154-1249, invoked from the commented train.py:651-676).
    """
    cap = state.capacity
    alive = state.alive
    grads = state.xyz_gradient_accum / state.denom  # (P, 1); NaN where denom=0
    grads = jnp.nan_to_num(jnp.where(alive[:, None], grads, 0.0), nan=0.0)[:, 0]

    act_scaling = jnp.exp(state.scaling)
    max_scale = act_scaling.max(axis=1)
    grad_ok = grads >= grad_threshold
    if offset_mask is not None:
        grad_ok = grad_ok & offset_mask
    clone_mask = grad_ok & (max_scale <= percent_dense * extent) & alive
    split_mask = grad_ok & (max_scale > percent_dense * extent) & alive

    free_idx = jnp.nonzero(~alive, size=cap, fill_value=cap)[0]
    free_count = (~alive).sum()

    n_clone = clone_mask.sum()
    clone_rank = jnp.cumsum(clone_mask) - 1
    pos_c = jnp.where(clone_mask, clone_rank, cap)
    dest_c = jnp.where(
        clone_mask, free_idx[jnp.minimum(pos_c, cap - 1)], cap
    )

    split_rank = jnp.cumsum(split_mask) - 1
    pos_s0 = n_clone + 2 * split_rank
    pos_s1 = pos_s0 + 1
    dest_s0 = jnp.where(split_mask, free_idx[jnp.minimum(pos_s0, cap - 1)], cap)
    dest_s1 = jnp.where(split_mask, free_idx[jnp.minimum(pos_s1, cap - 1)], cap)
    dest_s0 = jnp.where(pos_s0 >= cap, cap, dest_s0)
    dest_s1 = jnp.where(pos_s1 >= cap, cap, dest_s1)

    n_split = split_mask.sum()
    needed = n_clone + 2 * n_split
    n_dropped = jnp.maximum(0, needed - free_count)

    # Split children: x + R @ N(0, diag(exp(scaling))) with the normalized
    # quaternion rotation; child scale = log(scale / (0.8 * 2))
    # (densify_and_split, gaussian_model.py:1138-1144; build_rotation
    # normalizes, general_utils.py:78-95).
    N = 2
    samples = jax.random.normal(key, (cap, N, 3)) * act_scaling[:, None, :]
    rotn = state.rotation / jnp.linalg.norm(state.rotation, axis=-1, keepdims=True)
    R = quat_to_rotmat(rotn)  # (P, 3, 3)
    offsets = jnp.einsum("pij,pnj->pni", R, samples,
                         precision=jax.lax.Precision.HIGHEST)
    child_xyz = state.xyz[:, None, :] + offsets  # (P, 2, 3)
    child_scaling = jnp.log(act_scaling / (0.8 * N))

    params = state.params()
    new_params = {}
    new_mu, new_nu = dict(mu), dict(nu)
    for k in PARAM_GROUPS:
        leaf = params[k]
        # clones copy the parent row (densify_and_clone, :1192-1197)
        leaf = _scatter_rows(leaf, dest_c, leaf)
        if k == "xyz":
            leaf = _scatter_rows(leaf, dest_s0, child_xyz[:, 0])
            leaf = _scatter_rows(leaf, dest_s1, child_xyz[:, 1])
        elif k == "scaling":
            leaf = _scatter_rows(leaf, dest_s0, child_scaling)
            leaf = _scatter_rows(leaf, dest_s1, child_scaling)
        else:
            leaf = _scatter_rows(leaf, dest_s0, params[k])
            leaf = _scatter_rows(leaf, dest_s1, params[k])
        new_params[k] = leaf
        zeros = jnp.zeros_like(mu[k])
        for moments, store in ((mu, new_mu), (nu, new_nu)):
            m = moments[k]
            m = _scatter_rows(m, dest_c, zeros)
            m = _scatter_rows(m, dest_s0, zeros)
            m = _scatter_rows(m, dest_s1, zeros)
            store[k] = m

    alive = alive.at[dest_c].set(True, mode="drop")
    alive = alive.at[dest_s0].set(True, mode="drop")
    alive = alive.at[dest_s1].set(True, mode="drop")
    # split parents are pruned (prune_filter, :1151-1152)
    alive = alive & ~split_mask

    # Prune (:1226-1231).  max_radii2D has just been zeroed by the postfix
    # quirk (:1127), so the screen-size term is replicated as always-false;
    # the world-size and opacity terms are live.
    new_opacity_act = jax.nn.sigmoid(new_params["opacity"][:, 0])
    new_max_scale = jnp.exp(new_params["scaling"]).max(axis=1)
    prune = new_opacity_act < min_opacity
    if use_screen_prune:
        prune = prune | (new_max_scale > 0.1 * extent)
    n_pruned = (prune & alive).sum()
    alive = alive & ~prune

    new_state = state.with_params(new_params).replace(
        alive=alive,
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
        last_offset_norm=jnp.zeros_like(state.last_offset_norm),
    )
    info = DensifyInfo(
        n_cloned=n_clone - jnp.maximum(0, n_clone - free_count),
        n_split=n_split,
        n_pruned=n_pruned,
        n_dropped=n_dropped,
        n_alive=alive.sum(),
    )
    return new_state, new_mu, new_nu, info


def reset_opacity(
    state: GaussianState, mu: Dict[str, jnp.ndarray], nu: Dict[str, jnp.ndarray]
) -> Tuple[GaussianState, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """reset_opacity (gaussian_model.py:960-963): clamp activated opacity to
    <= 0.01 and zero the opacity Adam moments (replace_tensor_to_optimizer,
    :1027-1040)."""
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(state.opacity), 0.01)
    )
    mu = dict(mu)
    nu = dict(nu)
    mu["opacity"] = jnp.zeros_like(mu["opacity"])
    nu["opacity"] = jnp.zeros_like(nu["opacity"])
    return state.replace(opacity=new_op), mu, nu
