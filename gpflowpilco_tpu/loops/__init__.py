from .core import EpisodeData, EpisodeSpec, stack_episodes
from .pilco import (
    DriftSpec,
    MomentMatchingPILCO,
    PathwisePILCO,
    PILCOBase,
    PolicySpec,
)
