"""Frozen operator configurations (pytree-static kwargs bundles).

The reference configures everything through function kwargs with hard-coded
defaults (SURVEY §5 'Config'): mode='O', n_points=200, stretched-grid
sharpness 10, ODE tolerances, apex-refinement budgets. These dataclasses
bundle the same knobs as hashable static objects that can be passed through
``jax.jit`` static args; each maps 1:1 onto the kwargs of the corresponding
public function, with identical defaults.
"""

import dataclasses

__all__ = ["OperatorConfig", "SnellConfig", "GradientTracerConfig",
           "RetrievalConfig"]


@dataclasses.dataclass(frozen=True)
class OperatorConfig:
    """vertical_forward_operator / ionogram_pallas knobs (ref :459-509)."""
    mode: str = "O"
    n_points: int = 200
    sharpness: float = 10.0          # stretched-grid exponent (ref :363)
    dh_backoff_km: float = 1e-6      # reflection backoff (ref :378)
    p_chunk: int = 512               # Pallas point-axis chunk


@dataclasses.dataclass(frozen=True)
class SnellConfig:
    """Layered Snell tracer knobs (ref :1096, :1460-1473)."""
    mode: str = "O"
    substeps: int = 64               # spherical regular-interval substeps
    apex_substeps: int = 32          # √-substituted apex substeps
    R_E_km: float = 6371.0


@dataclasses.dataclass(frozen=True)
class GradientTracerConfig:
    """Ray-ODE tracer knobs (ref :1278-1291, :2135-2145)."""
    step_km: float = 1.0
    s_max_km: float = 5000.0
    z_ground_km: float = 0.0
    z_max_km: float = 1000.0
    x_min_km: float = -1e6
    x_max_km: float = 1e6


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """minimize_parameters / retrieve_gradient knobs (ref :672-717)."""
    method: str = "brute"
    percent_sigma: float = 20.0
    step: float = 1.0
    mode: str = "O"
    n_points: int = 200
    bottom_type: str = "B_bot"
    lm_steps: int = 25
    crit_margin: float = 0.995
