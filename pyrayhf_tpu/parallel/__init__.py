"""Multi-chip scaling: mesh sharding for ionogram synthesis & retrieval."""

from .mesh import (ionogram_mesh, synthesize_ionograms_sharded,
                   vh_height_sharded, retrieval_step_sharded,
                   retrieve_gradient_batch_sharded, trace_fan_3d_sharded,
                   trace_fan_3d_aniso_sharded, doppler_batch_sharded)

__all__ = ["ionogram_mesh", "synthesize_ionograms_sharded",
           "vh_height_sharded", "retrieval_step_sharded",
           "retrieve_gradient_batch_sharded", "trace_fan_3d_sharded",
           "trace_fan_3d_aniso_sharded", "doppler_batch_sharded"]
