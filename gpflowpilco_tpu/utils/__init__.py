from . import bijectors
from .optimizers import adam_minimize, lbfgs_minimize, make_policy_schedule
from .trees import combine, mask_from_names, partition
