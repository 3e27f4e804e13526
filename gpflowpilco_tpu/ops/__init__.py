from . import bvn, kexp, linalg
from .bvn import bvn_cdf, bvnu, ndtr, owens_t
from .kexp import ekff, ekff_mo, ekfu_mo, ekuffu_mo, ekxz, ekzxxz
from .linalg import bcho_solve, bsolve_triangular
