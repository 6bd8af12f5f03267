"""General helpers: LR schedules, activations inverses, image metrics.

Reference: /root/reference/utils/general_utils.py and utils/image_utils.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    """log(x / (1-x)) (general_utils.py:18-19)."""
    return jnp.log(x / (1 - x))


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear LR decay with optional sine delay (general_utils.py:29-62).

    jnp-traceable in ``step`` so it can live inside the jitted update.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    lr = delay_rate * log_lerp
    # Reference disables the LR for step < 0 (general_utils.py:47-49).
    return jnp.where(step < 0, 0.0, lr)


def mse(img1, img2):
    """(image_utils.py:14-15)."""
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(1, keepdims=True)


def psnr(img1, img2):
    """(image_utils.py:17-19)."""
    m = mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(m))


def safe_state(silent: bool = False, seed: int = 0) -> None:
    """Console timestamping + global seeding (general_utils.py:112-133).

    Wraps stdout so every completed line gets a "[dd/mm HH:MM:SS]" suffix
    (and is suppressed entirely when silent), and seeds the stdlib and numpy
    RNGs that drive camera shuffling/popping.  The reference also pins the
    CUDA device here; device selection on TPU belongs to JAX/the tunnel.
    """
    import random
    import sys
    from datetime import datetime

    old_f = sys.stdout

    class _F:
        def write(self, x):
            if silent:
                return
            if x.endswith("\n"):
                stamp = datetime.now().strftime("%d/%m %H:%M:%S")
                old_f.write(x.replace("\n", f" [{stamp}]\n"))
            else:
                old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = _F()
    random.seed(seed)
    np.random.seed(seed)
