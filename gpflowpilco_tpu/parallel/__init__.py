from .mesh import make_mesh, particle_sharding, replicated
from .pathwise import constrain_paths, make_pathwise_train_step
from .hmc import run_hmc_sharded
from .resample import (
    systematic_resample,
    systematic_resample_indices,
    systematic_resample_sharded,
)
