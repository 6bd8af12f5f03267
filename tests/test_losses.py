"""Loss layer vs an independent torch-CPU implementation of the reference SSIM
(loss_utils.py:23-63)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from gs_deformable_tpu.utils import losses


def torch_reference_ssim(img1, img2, window_size=11, sigma=1.5):
    """Independent re-statement of the reference's grouped-2D-conv SSIM."""
    xs = torch.arange(window_size, dtype=torch.float64)
    g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).float()
    win2d = (g[:, None] @ g[None, :]).unsqueeze(0).unsqueeze(0)
    C = img1.shape[0]
    win = win2d.expand(C, 1, window_size, window_size).contiguous()
    a, b = img1.unsqueeze(0), img2.unsqueeze(0)
    pad = window_size // 2
    mu1 = F.conv2d(a, win, padding=pad, groups=C)
    mu2 = F.conv2d(b, win, padding=pad, groups=C)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F.conv2d(a * a, win, padding=pad, groups=C) - mu1_sq
    s2 = F.conv2d(b * b, win, padding=pad, groups=C) - mu2_sq
    s12 = F.conv2d(a * b, win, padding=pad, groups=C) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item()


def test_ssim_matches_torch_reference(rng):
    a = rng.uniform(size=(3, 40, 56)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape).astype(np.float32), 0, 1)
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = torch_reference_ssim(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ssim_identity():
    a = jnp.ones((3, 32, 32)) * 0.5
    assert float(losses.ssim(a, a)) > 0.999


def test_l1_l2(rng):
    a = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    b = rng.uniform(size=(3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b))),
        np.abs(a - b).mean(), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(losses.l2_loss(jnp.asarray(a), jnp.asarray(b))),
        ((a - b) ** 2).mean(), rtol=1e-6,
    )
