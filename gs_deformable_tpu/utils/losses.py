"""Training losses: L1/L2 and windowed SSIM.

Reference: /root/reference/utils/loss_utils.py.  The reference's SSIM builds an
11x11 window as the outer product of a 1D Gaussian (sigma=1.5) and runs one
grouped 2D conv per channel (loss_utils.py:23-63); because the window is
separable, two 1D convs are mathematically identical and map better onto the
TPU's convolution path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    """(loss_utils.py:17-18)."""
    return jnp.abs(pred - target).mean()


def l2_loss(pred, target):
    """(loss_utils.py:20-21)."""
    return ((pred - target) ** 2).mean()


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1D Gaussian, normalized (loss_utils.py:23-26)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _filter2d(img: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Depthwise 'same' filtering of (C, H, W) with a separable window."""
    C = img.shape[0]
    k = win.shape[0]
    pad = k // 2
    x = img[None]  # (1, C, H, W)
    kern_h = jnp.asarray(win).reshape(1, 1, k, 1)
    kern_w = jnp.asarray(win).reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, k, 1), ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x,
        jnp.tile(kern_h, (C, 1, 1, 1)),
        window_strides=(1, 1),
        padding=((pad, pad), (0, 0)),
        dimension_numbers=dn,
        feature_group_count=C,
    )
    x = jax.lax.conv_general_dilated(
        x,
        jnp.tile(kern_w, (C, 1, 1, 1)),
        window_strides=(1, 1),
        padding=((0, 0), (pad, pad)),
        dimension_numbers=dn,
        feature_group_count=C,
    )
    return x[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over a (C, H, W) image pair (loss_utils.py:33-63).

    Matches the reference's constants C1 = 0.01^2, C2 = 0.03^2 and its
    padding = window_size // 2 'same' convolution.
    """
    win = _gaussian_window(window_size, sigma)
    mu1 = _filter2d(img1, win)
    mu2 = _filter2d(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, win) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, win) - mu2_sq
    sigma12 = _filter2d(img1 * img2, win) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()
