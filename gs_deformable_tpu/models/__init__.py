"""Model layer: Gaussian parameter state + deformation networks."""
