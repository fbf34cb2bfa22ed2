from .geometry import parallel_beam_geometry, joseph_system_matrix, ell_from_coo
from .ray_trafo import RayTransform, make_parallel_beam_trafo, make_matmul_trafo
from .simulation import simulate
