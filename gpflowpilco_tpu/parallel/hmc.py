"""HMC chains sharded across a device mesh.

BASELINE.md config 5: "HMC hyperparameter chains sharded across N>=2 hosts with
... step-size adaptation statistics" — chains ride the 'dp' mesh axis; the only
cross-device traffic is the warmup's cross-chain mean acceptance (one scalar
mean per warmup step, inserted by GSPMD from the sharding constraints).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hmc import HMCConfig, HMCResult, run_hmc


def run_hmc_sharded(
    log_prob_fn,
    init_params,
    key: jax.Array,
    mesh: Mesh,
    config: HMCConfig = HMCConfig(),
) -> HMCResult:
    """run_hmc with the leading chain axis of every leaf sharded over 'dp'."""
    chain_sharding = NamedSharding(mesh, P("dp"))

    def constrain(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x,
                NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))),
            ),
            tree,
        )

    @jax.jit
    def run(init_params, key):
        return run_hmc(log_prob_fn, constrain(init_params), key, config)

    return run(init_params, key)
