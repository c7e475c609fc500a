"""Progressive distillation (Salimans & Ho, arXiv:2202.00512).

Beyond-reference capability for the serving path: starting from a trained
DDPM teacher, train a student (same architecture, teacher-initialized) so
that ONE student DDIM step reproduces TWO teacher DDIM steps; repeat,
halving the sampler budget each round. The reference has no few-step
story at all (its samplers are strictly T-step ancestral,
diffusion_DANRA_conditional.py:105-159); combined with the fused DDIM scan
(sampling/ancestral.py) this turns the 1000-step flagship sampler into a
~4-8 step one at equal compute per step.

Discrete-time adaptation: the student learns on an N-step DDIM grid
(the same evenly spaced grid ``ddim_sample(num_steps=N)`` uses), and the
teacher runs t -> s -> u with s the midpoint index. The regression target
is expressed in epsilon space: given the teacher's two-step landing point
x_u, the unique eps* for which one student DDIM step from (x_t, t) to u
lands exactly on x_u is

    eps* = (x_u - sqrt(abar_u/abar_t) x_t)
           / (sqrt(1-abar_u) - sqrt(abar_u (1-abar_t)/abar_t))

(the denominator is strictly negative for u < t, so the division is
well-conditioned away from u == t). The loss applies the paper's
truncated-SNR weighting (Appendix E): w(SNR) = max(SNR, 1) on the
x0-space error, which in this epsilon-space loss is max(1, 1/SNR)
(eps_err^2 = SNR * x0_err^2).

Every step is a single donated jit; under a mesh the batch shards on the
``data`` axis like the main Trainer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.ddpm import GaussianDiffusion
from .optim import make_optimizer
from .state import TrainState

Batch = Dict[str, jnp.ndarray]


def student_ddim_grid(n_timesteps: int, num_steps: int) -> jnp.ndarray:
    """The (num_steps+1)-point timestep grid t_0 > t_1 > ... > t_N = -1,
    matching ``sampling.ddim_sample``'s evenly spaced sub-sequence."""
    seq = jnp.linspace(n_timesteps - 1, 0, num_steps).round().astype(jnp.int32)
    return jnp.concatenate([seq, jnp.array([-1], jnp.int32)])


def _abar(diffusion: GaussianDiffusion, t: jnp.ndarray, like: jnp.ndarray):
    """alpha_bar at t with the t = -1 -> 1.0 clean-image convention,
    broadcast to ``like``'s rank."""
    flat = jnp.where(
        t >= 0, diffusion.alpha_bar[jnp.maximum(t, 0)], jnp.ones_like(t, jnp.float32)
    )
    return flat.reshape(t.shape + (1,) * (like.ndim - t.ndim)).astype(like.dtype)


def distillation_target(
    diffusion: GaussianDiffusion,
    x_t: jnp.ndarray,
    x_u: jnp.ndarray,
    t: jnp.ndarray,
    u: jnp.ndarray,
) -> jnp.ndarray:
    """eps* such that one DDIM step from (x_t, t) to u lands on x_u."""
    a_t = _abar(diffusion, t, x_t)
    a_u = _abar(diffusion, u, x_t)
    ratio = jnp.sqrt(a_u / a_t)
    denom = jnp.sqrt(1.0 - a_u) - ratio * jnp.sqrt(1.0 - a_t)
    return (x_u - ratio * x_t) / denom


@dataclasses.dataclass
class DistillConfig:
    num_student_steps: int = 8  # student DDIM grid; teacher runs 2x
    optimizer: str = "adamw"
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None
    ema: bool = True
    ema_decay: float = 0.995
    # The paper's truncated-SNR weighting (max(SNR,1) on the x0 error) is
    # max(1, 1/SNR) in this epsilon-space loss — UNBOUNDED as SNR -> 0
    # (~3100x at t=799 of an 800-step linear schedule). Measured on the
    # parity flagship (scripts/probe_distill_r3.py, one N=400 round,
    # student scored at DDIM-50 vs its teacher's 5.41 RMSE / 162 FID):
    # weighted loss DIVERGES and corrupts the student (flat lr 11.18 /
    # 1999; even warmup-cosine 8.63 / 665) while unweighted + warmup-
    # cosine holds 5.87 / 193. Default False; True reproduces the paper's
    # Appendix-E weighting for x0/v-parameterized setups where it is
    # bounded.
    snr_loss_weight: bool = False
    # Per-round warmup-cosine schedule (both must be set): ramps 0 ->
    # learning_rate over ``warmup_steps`` then cosine-decays to 0 at
    # ``total_steps``. A fully-converged teacher ends its own cosine at
    # ~0 lr; restarting a FLAT-lr Adam on it takes large early steps that
    # corrupt the student before the distill target re-anchors it
    # (unweighted flat-lr arm: 9.09 RMSE / 899 FID vs warmup-cosine's
    # 5.87 / 193 — scripts/probe_distill_r3.py).
    warmup_steps: int = 0
    total_steps: Optional[int] = None


class ProgressiveDistiller:
    """One halving round of progressive distillation.

    ``model`` follows the framework's black-box signature
    model(x, t, y, cond_img, lsm_cond, topo_cond) -> eps_hat; the teacher
    is frozen ``teacher_params`` for the same module. Chain rounds by
    promoting the distilled student to teacher and halving
    ``num_student_steps``.
    """

    def __init__(
        self,
        model,
        diffusion: GaussianDiffusion,
        teacher_params,
        config: DistillConfig = DistillConfig(),
    ):
        self.model = model
        self.diffusion = diffusion
        # device_put ONCE: the teacher is passed as a jit argument every
        # step (see distill_step), and host (numpy) leaves — e.g. params
        # freshly deserialized from a checkpoint — would be re-uploaded
        # per call (62 MB/step over a remote-TPU tunnel = ~1 s/step,
        # measured round 3). Device arrays pass by reference.
        self.teacher_params = jax.device_put(teacher_params)
        self.config = config
        if config.num_student_steps > diffusion.n_timesteps:
            # linspace spacing < 1 would round to duplicate grid entries,
            # making the eps* denominator zero (NaN targets)
            raise ValueError(
                f"num_student_steps ({config.num_student_steps}) must not "
                f"exceed n_timesteps ({diffusion.n_timesteps})"
            )
        self.grid = student_ddim_grid(
            diffusion.n_timesteps, config.num_student_steps
        )
        # The grid is passed to the jitted step as an ARGUMENT, padded to a
        # fixed length (n_timesteps + 2 bounds every legal grid), and the
        # round's step count as a traced scalar. This keeps the step's HLO
        # byte-identical across halving rounds — with grid/num_steps as
        # closure constants every round was a full recompile (~10 min each
        # on the remote backend; 8 rounds of scripts/distill_quality.py is
        # ~80 min of pure compile), now round 2+ hit the persistent
        # compilation cache.
        pad = diffusion.n_timesteps + 2 - self.grid.size
        self._grid_padded = jnp.concatenate(
            [self.grid, jnp.full((pad,), -1, jnp.int32)]
        )
        self._n_steps = jnp.asarray(config.num_student_steps, jnp.int32)
        schedule = None
        if config.warmup_steps and config.total_steps:
            import optax

            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=config.learning_rate,
                warmup_steps=config.warmup_steps,
                decay_steps=config.total_steps,
                end_value=0.0,
            )
        self.tx = make_optimizer(
            config.optimizer,
            config.learning_rate,
            weight_decay=config.weight_decay,
            grad_clip_norm=config.grad_clip_norm,
            schedule=schedule,
        )
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))
        self._scan = jax.jit(self._scan_impl, donate_argnums=(0,))

    def init_state(self) -> TrainState:
        """Student starts as a copy of the teacher (the paper's init).

        A REAL copy: the jitted step donates the state, so aliasing the
        teacher's buffers would delete them on the first step."""
        return TrainState.create(
            apply_fn=self.model.apply,
            params=jax.tree_util.tree_map(jnp.copy, self.teacher_params),
            tx=self.tx,
            use_ema=self.config.ema,
            ema_decay=self.config.ema_decay,
        )

    # -- internals -----------------------------------------------------------

    def _eps(self, params, batch: Batch, x, t):
        return self.model.apply(
            {"params": params},
            x,
            t,
            batch.get("classifier"),
            batch.get("img_cond"),
            batch.get("lsm"),
            batch.get("topo"),
        )

    def _step_impl(
        self,
        state: TrainState,
        teacher_params,
        batch: Batch,
        rng: jax.Array,
        grid: jnp.ndarray,
        n_steps: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng_i, rng_noise = jax.random.split(rng)
        x0 = batch["img"]
        b = x0.shape[0]

        # pick a student step (t -> u) per sample; teacher midpoint s
        i = jax.random.randint(rng_i, (b,), 0, n_steps)
        t = grid[i]
        u = grid[i + 1]
        # midpoint, clamped to 0: for the final sliver (t=0 -> u=-1) the
        # first teacher "step" t->s degenerates to the identity and the
        # target reduces to the teacher's own eps — correct, and it keeps
        # ddim_step's alpha_bar gather in range (a raw -1 would wrap)
        s = jnp.maximum((t + u) // 2, 0)

        noise = jax.random.normal(rng_noise, x0.shape, jnp.float32)
        x_t = self.diffusion.q_sample(x0, t, noise)

        # two frozen teacher DDIM steps t -> s -> u
        eps1 = self._eps(teacher_params, batch, x_t, t)
        x_s = self.diffusion.ddim_step(x_t, t, s, eps1)
        eps2 = self._eps(teacher_params, batch, x_s, s)
        x_u = self.diffusion.ddim_step(x_s, s, u, eps2)
        target = jax.lax.stop_gradient(
            distillation_target(self.diffusion, x_t, x_u, t, u)
        )

        def loss_fn(params):
            pred = self._eps(params, batch, x_t, t)
            err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
            if self.config.snr_loss_weight:
                # truncated SNR max(SNR, 1) on the x0-space error; the
                # epsilon-space equivalent is max(1, 1/SNR) since
                # eps_err^2 = SNR * x0_err^2
                a_t = _abar(self.diffusion, t, err)
                w = jnp.maximum(1.0, (1.0 - a_t) / a_t)
                err = err * w
            return err.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss}

    def _scan_impl(
        self,
        state: TrainState,
        teacher_params,
        data: Batch,
        idx: jnp.ndarray,
        rngs: jax.Array,
        grid: jnp.ndarray,
        n_steps: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def body(st, xs):
            ii, rr = xs
            batch = {k: v[ii] for k, v in data.items()}
            st, m = self._step_impl(
                st, teacher_params, batch, rr, grid, n_steps
            )
            return st, m["loss"]

        state, losses = jax.lax.scan(body, state, (idx, rngs))
        return state, {"loss": losses[-1], "loss_mean": losses.mean()}

    # -- public --------------------------------------------------------------

    def distill_step(
        self, state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # teacher/grid/num_steps passed as jit ARGUMENTS: captured in the
        # closure they would be baked into the HLO as constants (executable
        # bloat and a guaranteed compile-cache miss per halving round)
        return self._step(
            state, self.teacher_params, batch, rng,
            self._grid_padded, self._n_steps,
        )

    def distill_scan(
        self, state: TrainState, data: Batch, idx: jnp.ndarray,
        rngs: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """K updates in ONE jitted call (lax.scan), gathering each step's
        batch on-device from the full device-resident ``data`` dict with
        an (K, B) int32 ``idx`` array and (K,) ``rngs`` keys.

        The small-map regime this exists for: at 64px batch 20 a single
        ``distill_step`` is dispatch- and H2D-bound on a remote backend
        (~1.6 MB of conditioning upload + one round-trip per update —
        measured 2026-08-20 on the tunneled v5e: the 6.4x-smaller-FLOP
        step ran only 1.5x faster than the 128px train step). Scanning K
        updates per call uploads K*B*4 bytes of indices instead and pays
        dispatch once per K. Semantically identical to K sequential
        ``distill_step`` calls on ``data[idx[k]]`` batches (same RNG per
        step; tests/test_distill.py asserts equivalence)."""
        return self._scan(
            state, self.teacher_params, data, idx, rngs,
            self._grid_padded, self._n_steps,
        )


def progressive_distill(
    model,
    diffusion: GaussianDiffusion,
    teacher_params,
    batches,
    *,
    start_steps: int = 8,
    end_steps: int = 1,
    steps_per_round: int = 100,
    rng: Optional[jax.Array] = None,
    config: DistillConfig = DistillConfig(),
):
    """Full halving schedule: start_steps -> ... -> end_steps.

    ``batches`` is an (endless) iterator of training batches. Returns
    (params, num_steps) — the final student and its sampler budget. The
    distilled student samples with
    ``ddim_sample(..., num_steps=num_steps)``.
    """
    rng = jax.random.key(0) if rng is None else rng
    end_steps = max(end_steps, 1)
    if end_steps > start_steps:
        raise ValueError(
            f"end_steps ({end_steps}) must not exceed start_steps "
            f"({start_steps})"
        )
    n = start_steps
    params = teacher_params
    it = iter(batches)
    trained_n = start_steps
    while n >= end_steps:
        cfg = dataclasses.replace(config, num_student_steps=n)
        d = ProgressiveDistiller(model, diffusion, params, cfg)
        state = d.init_state()
        for k in range(steps_per_round):
            state, _ = d.distill_step(
                state, next(it), jax.random.fold_in(rng, n * 100003 + k)
            )
        params = state.ema_params if cfg.ema else state.params
        trained_n = n
        n //= 2
    # report the grid the student was ACTUALLY distilled on (the halving
    # sequence from start_steps may not hit end_steps exactly)
    return params, trained_n


__all__ = [
    "DistillConfig",
    "ProgressiveDistiller",
    "distillation_target",
    "progressive_distill",
    "student_ddim_grid",
]
