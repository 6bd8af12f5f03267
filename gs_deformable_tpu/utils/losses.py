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
    """Depthwise 'same' filtering of (C, H, W) with a separable window.

    Implemented as k shifted multiply-adds per axis (zero-padded slices), not
    lax.conv: a 3-channel grouped NCHW convolution lowers pathologically on
    TPU (measured 4ms forward for 11x11 at 800x800 vs ~0.3ms for this form,
    which XLA fuses into one elementwise kernel per axis).  Same math, same
    zero 'same' padding as the reference conv (loss_utils.py:37-40).
    """
    k = win.shape[0]
    pad = k // 2

    def blur_axis(x, axis):
        size = x.shape[axis]
        padding = [(0, 0)] * x.ndim
        padding[axis] = (pad, pad)
        xp = jnp.pad(x, padding)
        acc = None
        for j in range(k):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(j, j + size)
            term = float(win[j]) * xp[tuple(sl)]
            acc = term if acc is None else acc + term
        return acc

    return blur_axis(blur_axis(img, 1), 2)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             sigma: float = 1.5) -> jnp.ndarray:
    """Per-pixel SSIM map over a (C, H, W) image pair (loss_utils.py:33-60).

    Matches the reference's constants C1 = 0.01^2, C2 = 0.03^2 and its
    padding = window_size // 2 'same' convolution.  ``ssim`` is its mean;
    the sharded loss partition (parallel/sharding.py) sums band slices of
    this map.
    """
    win = _gaussian_window(window_size, sigma)
    C = img1.shape[0]
    # One stacked blur for all five filtered quantities (single fused pass
    # per axis instead of six separate filters).
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    f = _filter2d(stacked, win)
    mu1, mu2 = f[0:C], f[C : 2 * C]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = f[2 * C : 3 * C] - mu1_sq
    sigma2_sq = f[3 * C : 4 * C] - mu2_sq
    sigma12 = f[4 * C : 5 * C] - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5):
    """Mean SSIM over a (C, H, W) image pair (loss_utils.py:33-63)."""
    return ssim_map(img1, img2, window_size, sigma).mean()
