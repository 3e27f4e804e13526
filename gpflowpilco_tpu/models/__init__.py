from .builders import build_gpr, build_svgp, dynamics_mask, policy_mask
from .gp import GPR, SVGP, gpr_lml, gpr_predict_f, kl_qu_pu, kuu, svgp_elbo, svgp_predict_f
from .kernels import RBF
from .pathwise import (
    PathState,
    PathwiseSVGPTransform,
    eval_paths_gpr,
    eval_paths_svgp,
    generate_paths_gpr,
    generate_paths_svgp,
)
from .priors import log_snr, pilco_snr_penalty
from .hmc import HMCConfig, HMCResult, run_hmc
from .natgrad import natgrad_step
