"""Shared types for the rasterization pipeline."""

from __future__ import annotations

from typing import NamedTuple


class CompositeParams(NamedTuple):
    """Compositing constants (config.h:16-17, forward.cu:343-347)."""

    tile_x: int = 16
    tile_y: int = 16
    alpha_max: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_eps: float = 1e-4
