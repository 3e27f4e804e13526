from ..moments import Chain, GaussianMatch, GaussianMoments
from .gp import GPRTransform, SVGPTransform, match_gpr, match_svgp
from .rules import (
    Cos,
    Identity,
    MatVec,
    Probit,
    Scale,
    Shift,
    Sin,
    SinCos,
    moment_matching,
    sincos,
)
