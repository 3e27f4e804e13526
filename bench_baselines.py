"""Independent CPU baseline for bench.py: the pathwise policy-optimization step
re-implemented in PyTorch (CPU).

The reference stack (TF/gpflow on CPU) is not installable in this image, so
bench.py's ``vs_baseline`` needs a CPU measurement that is not this framework
measuring itself. torch-CPU is a second, independently-engineered stack (ATen
kernels + its own autodiff) running the *same mathematical workload* as the
reference's policy-training inner step (reference train_utils.py:108-135,
loops/pilco.py:263-303): fresh decoupled GP sample paths, a 30-step Euler
particle rollout through encoder -> squashed GP policy -> sampled drift, the
Gaussian objective accumulated per step, mean over particles, backward, global
clip, Adam.

Faithfulness is checked, not assumed: ``torch_loss_given`` evaluates the loss
on path/initial-state tensors exported from the JAX build, and bench.py asserts
agreement before trusting the timing.
"""
from __future__ import annotations

import math
import time


def _to_torch(a, torch):
    import numpy as np

    return torch.from_numpy(np.asarray(a).copy())


class TorchPathwiseWorkload:
    """Mirror of bench.build_step's loss on torch CPU (f32).

    Parameters are exported (constrained-space) from the JAX models so both
    stacks run identical numbers; the policy leaves are torch Parameters.
    """

    def __init__(self, encoder_active, drift_model, policy_model, objective,
                 batch_size, num_bases, num_steps):
        import torch

        self.torch = torch
        t = lambda a: _to_torch(a, torch).float()
        self.batch, self.bases, self.steps = batch_size, num_bases, num_steps
        self.active = tuple(encoder_active)

        # drift (frozen): constrained-space export
        self.d_var = t(drift_model.kernel.variance)  # (L,)
        self.d_ls = t(drift_model.kernel.lengthscales)  # (L, D)
        self.d_z = t(drift_model.z)  # (L, M, D)
        self.d_q_mu = t(drift_model.q_mu)  # (M, L)
        self.d_q_sqrt = torch.tril(t(drift_model.q_sqrt))  # (L, M, M)
        self.d_mean_const = t(drift_model.mean_const)
        self.d_whiten = bool(drift_model.whiten)
        m = self.d_z.shape[1]
        kuu = self._gram(self.d_var, self.d_ls, self.d_z) + 1e-4 * torch.eye(m)
        self.d_luu = torch.linalg.cholesky(kuu)  # (L, M, M)

        # policy (trained): Parameters
        P = torch.nn.Parameter
        self.p_var = P(t(policy_model.kernel.variance))
        self.p_ls = P(t(policy_model.kernel.lengthscales))
        self.p_z = P(t(policy_model.z))
        self.p_q_mu = P(t(policy_model.q_mu))
        self.p_mean_const = P(t(policy_model.mean_const))
        self.params = [self.p_var, self.p_ls, self.p_z, self.p_q_mu,
                       self.p_mean_const]

        self.target = t(objective.target)
        self.precis = t(objective.precis)
        self.x0_mean = torch.tensor([0.0, math.pi, 0.0, 0.0])
        self.x0_tril = 0.1 * torch.eye(4)

    @staticmethod
    def _gram_xz(var, ls, x, z):
        """k(x, z): x (N, D) shared inputs, z (L, M, D) -> (L, N, M)."""
        xs = x.unsqueeze(0) / ls.unsqueeze(1)  # (L, N, D)
        zs = z / ls.unsqueeze(1)  # (L, M, D)
        d2 = (xs.unsqueeze(2) - zs.unsqueeze(1)).pow(2).sum(-1)  # (L, N, M)
        return var.reshape(-1, 1, 1) * (-0.5 * d2).exp()

    @staticmethod
    def _gram(var, ls, z):
        """k(z, z) per latent: z (L, M, D) -> (L, M, M)."""
        zs = z / ls.unsqueeze(1)  # (L, M, D)
        d2 = (zs.unsqueeze(2) - zs.unsqueeze(1)).pow(2).sum(-1)  # (L, M, M)
        return var.reshape(-1, 1, 1) * (-0.5 * d2).exp()

    def encode(self, x):
        torch = self.torch
        a = list(self.active)
        inactive = [i for i in range(x.shape[-1]) if i not in self.active]
        xa = x[..., a]
        return torch.cat([xa.sin(), xa.cos(), x[..., inactive]], -1)

    def policy_action(self, e):
        """Squashed deterministic SVGP: scale * (ndtr(mean(e)) - 0.5)."""
        torch = self.torch
        m = self.p_z.shape[1]
        kuu = self._gram(self.p_var, self.p_ls, self.p_z) + 1e-4 * torch.eye(m)
        luu = torch.linalg.cholesky(kuu)  # (L, M, M)
        kxu = self._gram_xz(self.p_var, self.p_ls, e, self.p_z)  # (L, N, M)
        a = torch.linalg.solve_triangular(
            luu, kxu.transpose(-1, -2), upper=False
        )  # (L, M, N)
        mean = torch.einsum(
            "lmn,ml->nl", a, self.p_q_mu
        ) + self.p_mean_const  # whitened
        return (20.0 - 1e-5) * (torch.special.ndtr(mean) - 0.5)

    def generate_paths(self, gen):
        torch = self.torch
        L, M, D = self.d_z.shape
        S, B = self.batch, self.bases
        r = lambda *shape: torch.randn(*shape, generator=gen)
        omega = r(L, B, D) / self.d_ls.unsqueeze(1)
        phase = 2.0 * math.pi * torch.rand(L, B, generator=gen)
        w = r(S, L, B)
        eps = r(S, L, M)
        v_sample = self.d_q_mu.T + torch.einsum("lmn,sln->slm", self.d_q_sqrt, eps)
        u_sample = (
            torch.einsum("lmn,sln->slm", self.d_luu, v_sample)
            if self.d_whiten else v_sample
        )
        scale = (2.0 * self.d_var / B).sqrt()  # (L,)
        proj_z = torch.einsum("lmd,lbd->lmb", self.d_z, omega) + phase.unsqueeze(1)
        feats_z = scale.reshape(-1, 1, 1) * proj_z.cos()  # (L, M, B)
        f_prior_z = torch.einsum("lmb,slb->slm", feats_z, w)
        resid = (u_sample - f_prior_z).permute(1, 2, 0)  # (L, M, S)
        v = torch.cholesky_solve(resid, self.d_luu).permute(2, 0, 1)  # (S, L, M)
        return omega, phase, w, v

    def drift_eval(self, paths, x):
        torch = self.torch
        omega, phase, w, v = paths
        B = omega.shape[1]
        scale = (2.0 * self.d_var / B).sqrt()
        proj = torch.einsum("sd,lbd->slb", x, omega) + phase  # (S, L, B)
        f = torch.einsum("slb,slb->sl", scale.unsqueeze(-1) * proj.cos(), w)
        xs = x.unsqueeze(1) / self.d_ls  # (S, L, D)
        zs = self.d_z / self.d_ls.unsqueeze(1)  # (L, M, D)
        d2 = (xs.unsqueeze(2) - zs).pow(2).sum(-1)  # (S, L, M)
        kxz = self.d_var.unsqueeze(-1) * (-0.5 * d2).exp()
        f = f + torch.einsum("slm,slm->sl", kxz, v)
        return f + self.d_mean_const

    def objective_cost(self, feats):
        err = feats - self.target
        dist2 = (err * self.torch.einsum("ij,...j->...i", self.precis, err)).sum(-1)
        return -(-0.5 * dist2).exp()

    def loss(self, paths, x0):
        loss = self.torch.zeros(x0.shape[0])
        x = x0
        for _ in range(self.steps):
            e = self.encode(x)
            u = self.policy_action(e)
            f = self.drift_eval(paths, self.torch.cat([e, u], -1))
            x = x + f
            loss = loss + self.objective_cost(self.encode(x))
        return loss.mean()

    def train_step(self, gen, optimizer):
        torch = self.torch
        paths = self.generate_paths(gen)
        rvs = torch.randn(self.batch, 4, generator=gen)
        x0 = self.x0_mean + rvs @ self.x0_tril.T
        optimizer.zero_grad(set_to_none=True)
        loss = self.loss(paths, x0)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(self.params, 1.0)
        optimizer.step()
        return float(loss.detach())


def torch_loss_given(workload, omega, phase, w, v, x0):
    """Loss on path/initial-state arrays exported from JAX (parity probe)."""
    torch = workload.torch
    t = lambda a: _to_torch(a, torch).float()
    with torch.no_grad():
        return float(workload.loss((t(omega), t(phase), t(w), t(v)), t(x0)))


def _build_workload(batch, bases, steps, m_drift):
    from __graft_entry__ import _build_models
    import jax.numpy as jnp

    encoder, drift_model, policy_model, objective = _build_models(
        jnp.float32, m_drift=m_drift
    )
    return TorchPathwiseWorkload(
        encoder_active=(1,), drift_model=drift_model,
        policy_model=policy_model, objective=objective,
        batch_size=batch, num_bases=bases, num_steps=steps,
    )


def torch_parity_check(batch=64, bases=32, steps=10, m_drift=16):
    """|torch loss - jax loss| on identical exported paths/x0 (small sizes —
    the math is size-independent)."""
    (omega, phase, w, v), x0, jax_loss = jax_parity_probe(
        batch, bases, steps, m_drift
    )
    wl = _build_workload(batch, bases, steps, m_drift)
    got = torch_loss_given(wl, omega, phase, w, v, x0)
    return abs(got - float(jax_loss))


def run_torch_baseline(batch, bases, steps, m_drift=256, reps=3, budget_s=None):
    """Time the torch-CPU workload: seconds per optimization step.

    budget_s: if the warm-up step alone exceeds this, report its time from the
    single warm-up rep instead of running ``reps`` more.
    """
    import torch

    torch.manual_seed(0)
    wl = _build_workload(batch, bases, steps, m_drift)
    gen = torch.Generator().manual_seed(1)
    optimizer = torch.optim.Adam(wl.params, lr=1e-2)
    t0 = time.perf_counter()
    wl.train_step(gen, optimizer)  # warm-up (allocator, thread pool)
    warm = time.perf_counter() - t0
    if budget_s is not None and warm > budget_s:
        return warm  # slow enough that one rep is representative
    t0 = time.perf_counter()
    for _ in range(reps):
        wl.train_step(gen, optimizer)
    return (time.perf_counter() - t0) / reps


def jax_parity_probe(batch=64, bases=32, steps=10, m_drift=16):
    """Small-size probe: export (paths, x0) from the JAX stack and its loss so
    the torch re-implementation can be checked against it (size-independent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_models
    from gpflowpilco_tpu.dynamics.forward import forward_concrete
    from gpflowpilco_tpu.dynamics.solvers import euler_rollout
    from gpflowpilco_tpu.models.pathwise import (
        PathwiseSVGPTransform,
        generate_paths_svgp,
    )
    from gpflowpilco_tpu.moments import Chain
    from gpflowpilco_tpu.moment_matching.gp import SVGPTransform
    from gpflowpilco_tpu.moment_matching.rules import Probit, Scale, Shift

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        encoder, drift_model, policy_model, objective = _build_models(
            jnp.float32, m_drift=m_drift
        )
        paths = generate_paths_svgp(
            drift_model, jax.random.PRNGKey(5), batch, bases
        )
        mean0 = jnp.asarray([0.0, math.pi, 0.0, 0.0], jnp.float32)
        x0 = mean0 + jax.random.normal(
            jax.random.PRNGKey(7), (batch, 4), jnp.float32
        ) @ (0.1 * jnp.eye(4)).T
        drift_fn = PathwiseSVGPTransform(model=drift_model, paths=paths)
        pol = Chain(
            Scale(scale=jnp.float32(20.0 - 1e-5)),
            Shift(shift=jnp.float32(-0.5)),
            Probit(),
            SVGPTransform(model=policy_model, deterministic=True),
        )
        f = lambda t, x: forward_concrete(x, drift_fn, policy=pol, encoder=encoder)
        acc = lambda t, x, l: l + objective(encoder(x))
        _, loss, _ = euler_rollout(
            f, x0, dt=1.0, num_steps=steps, accumulate=acc,
            acc_init=jnp.zeros((batch,), jnp.float32),
        )
        jax_loss = float(loss.mean())
    to_np = lambda a: np.asarray(a)
    return (
        (to_np(paths.omega), to_np(paths.phase), to_np(paths.w), to_np(paths.v)),
        to_np(x0),
        jax_loss,
    )
