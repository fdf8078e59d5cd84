"""pyrayhf_tpu — TPU-native HF ionospheric ray tracing & virtual-height engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PyRayHF
(victoriyaforsythe/PyRayHF): Appleton–Hartree magnetoionic theory, the
stretched-grid vertical forward operator (profile in → ionogram out), 2-D
oblique ray tracers, oblique↔vertical conversion, a differentiable parametric
EDP model, and electron-density retrieval — all as fused, branch-free,
batched XLA programs that vmap over frequency and shard over profile meshes.

Public API mirrors the reference's function names where a counterpart exists
(docstrings cite ``/root/reference/PyRayHF/library.py`` line ranges).
"""

from .constants import C_KM_S, CP, G_P, R_E, constants
from .magnetoionic import (den2freq, find_mu_mup, find_mu_mup_masked, find_X,
                           find_Y, freq2den, mode_multiplier)
from .grid import regrid_to_nonuniform_grid, smooth_nonuniform_grid
from .forward import (find_vh, vertical_forward_operator,
                      vertical_forward_operator_batch, vertical_phase_operator,
                      vh_and_mask)
from .fields import (build_mup_function,
                     build_refractive_index_interpolator_cartesian,
                     build_refractive_index_interpolator_spherical)
from .geodesy import (azimuth_between_points, calculate_gcd,
                      earth_radius_at_latitude, great_circle_point,
                      oblique_to_vertical, vertical_to_magnetic_angle)
from .snell import (trace_ray_cartesian_snells, trace_ray_spherical_snells,
                    trace_rays_cartesian_snells, trace_rays_spherical_snells)
from .gradient import (trace_ray_cartesian_gradient,
                       trace_ray_spherical_gradient,
                       trace_rays_cartesian_gradient,
                       trace_rays_spherical_gradient)
from .interp import interp_exact
from .edp import (derive_dependent_F1_parameters, epstein_layer,
                  f2_bottom_b0b1, f2_bottom_thickness, f2_topside,
                  reconstruct_density_1level, reconstruct_density_continuous,
                  valley_transition)
from .retrieval import (minimize_parameters, model_VH, residual_VH,
                        retrieve_gradient, retrieve_gradient_batch)
from .pallas_vh import (ionogram_fast_xla, ionogram_pallas,
                        ionogram_pallas_gather, ionogram_pallas_mxu)
from . import ccir, edp, envgen, fields, geodesy, gradient, grid, igrf, \
    io, magnetoionic, parallel, profiling, retrieval, snell
from .envgen import (find_mean_gradient_error, generate_input_1D,
                     generate_input_2D, generate_input_3D)
from .igrf import calculate_magnetic_field
from .io import load_input, save_to_file
from . import config, rays
from .config import (GradientTracerConfig, OperatorConfig, RetrievalConfig,
                     SnellConfig)
from .rays import (event_ground, event_x_left, event_x_right, event_z_bottom,
                   event_z_top, find_turning_point, ray_rhs_cartesian,
                   rhs_spherical, tan_from_mu_scalar)
from .fields import (eval_refractive_index_and_grad, make_n_and_grad,
                     n_and_grad, n_and_grad_rphi)

# Version from installed metadata when available (mirrors the reference's
# importlib.metadata pattern, ref __init__.py:8-19); source-tree fallback
# keeps `import pyrayhf_tpu` working without an install step.
try:
    from importlib import metadata as _metadata
    __version__ = _metadata.version("pyrayhf-tpu")
except Exception:
    __version__ = "0.6.0"
from .oblique import (synthesize_oblique_ionogram,
                      synthesize_oblique_ionogram_2d)
from . import oblique
from .absorption import (absorption_coefficient, collision_frequency,
                         vertical_absorption_operator)
from . import absorption
from .true_height import (retrieve_profile, retrieve_profile_batch,
                          retrieve_profile_joint)
from . import true_height
from .faraday import faraday_rotation_vertical
from . import faraday
from .doppler import doppler_shift_vertical, phase_height_and_mask
from . import doppler
from .ground import (fresnel_coefficients, fresnel_coefficients_real,
                     ground_reflection_loss_db)
from . import ground
from .muf import (muf_from_profile, muf_from_vertical_ionogram, muf_map,
                  vertical_to_oblique)
from .oblique_inversion import retrieve_from_oblique
from . import oblique_inversion
from . import muf
from .trace3d import (build_field_3d, home_ray_3d,
                      synthesize_oblique_ionogram_3d, trace_ray_3d,
                      trace_rays_3d)
from . import trace3d
from .trace3d_aniso import (build_field_3d_aniso, igrf_volume,
                            home_ray_3d_anisotropic,
                            synthesize_oblique_ionogram_3d_anisotropic,
                            trace_ray_3d_anisotropic,
                            trace_rays_3d_anisotropic)
from . import trace3d_aniso
