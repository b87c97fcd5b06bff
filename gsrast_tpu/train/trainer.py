"""Training loop: per-parameter Adam, jittable train step, densify schedule.

Capability add over the forward-only reference (SURVEY.md §2.3); BASELINE
config 4. Follows the standard 3DGS optimizer recipe: separate learning rates
per parameter group, exponential decay on the means' LR scaled by scene
extent, masked updates so dead capacity slots stay frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import config as cfg
from ..camera import Camera
from ..render.api import render
from ..scene.gaussians import GaussianScene, merge_params, split_params
from . import densify as densify_mod
from .loss import psnr, rgb_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_means: float = 1.6e-4          # x scene_extent, exp-decayed
    lr_means_final: float = 1.6e-6
    lr_decay_steps: int = 30000
    lr_sh: float = 2.5e-3
    lr_sh_rest_div: float = 20.0      # rest bands train 20x slower than DC
    lr_opacity: float = 5e-2
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    ssim_weight: float = 0.2
    densify_from: int = 500
    densify_until: int = 15000
    densify_every: int = 100
    opacity_reset_every: int = 3000
    grad_threshold: float = 2e-4
    max_new_per_densify: int = 4096


class TrainState(NamedTuple):
    scene: GaussianScene
    opt_state: optax.OptState
    densify_state: densify_mod.DensifyState
    step: jax.Array


def make_optimizer(
    tc: TrainConfig, scene_extent: float
) -> optax.GradientTransformation:
    means_schedule = optax.exponential_decay(
        init_value=tc.lr_means * scene_extent,
        transition_steps=tc.lr_decay_steps,
        decay_rate=max(tc.lr_means_final / tc.lr_means, 1e-8),
        end_value=tc.lr_means_final * scene_extent,
    )
    labels = {
        "means": "means",
        "log_scales": "scales",
        "quats": "quats",
        "opacity_logits": "opacity",
        "sh": "sh",
    }
    return optax.multi_transform(
        {
            "means": optax.adam(means_schedule, eps=1e-15),
            "scales": optax.adam(tc.lr_scales, eps=1e-15),
            "quats": optax.adam(tc.lr_quats, eps=1e-15),
            "opacity": optax.adam(tc.lr_opacity, eps=1e-15),
            "sh": optax.adam(tc.lr_sh, eps=1e-15),
        },
        labels,
    )


def _scale_sh_rest(grads: dict, div: float) -> dict:
    """The 3DGS recipe: SH rest bands train at lr_sh/20 — implemented by
    scaling their gradient before Adam."""
    sh = grads["sh"]
    if sh.shape[1] > 1:
        sh = sh.at[:, 1:, :].multiply(1.0 / div)
    return dict(grads, sh=sh)


def make_train_step(
    render_cfg: cfg.RenderConfig,
    tc: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Build a jittable train step: (state, camera, target) -> (state, metrics).

    The mean2d_delta zero-perturbation exposes the screen-space positional
    gradient (the 3DGS densification signal) without a second render.
    """

    def loss_fn(params, delta, mask, camera, target):
        scene = merge_params(params, mask)
        out = render(scene.activated(), camera, render_cfg, mean2d_delta=delta)
        loss = rgb_loss(out.image, target, tc.ssim_weight)
        return loss, (out.image, out.stats["radii"])

    def train_step(state: TrainState, camera: Camera, target: jax.Array):
        params, mask = split_params(state.scene)
        delta = jnp.zeros((state.scene.capacity, 2), jnp.float32)
        (loss, (image, radii)), (grads, d_mean2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, delta, mask, camera, target)

        grads = _scale_sh_rest(grads, tc.lr_sh_rest_div)
        # Freeze dead slots.
        live = mask.astype(jnp.float32)
        grads = jax.tree.map(
            lambda g: g * live.reshape((-1,) + (1,) * (g.ndim - 1)), grads
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        scene = merge_params(params, mask)

        densify_state = densify_mod.accumulate_stats(
            state.densify_state, d_mean2d, radii
        )
        metrics = {
            "loss": loss,
            "psnr": psnr(image, target),
            "num_active": scene.num_active(),
        }
        return (
            TrainState(scene, opt_state, densify_state, state.step + 1),
            metrics,
        )

    return train_step


def init_train_state(
    scene: GaussianScene,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    params, _ = split_params(scene)
    return TrainState(
        scene=scene,
        opt_state=optimizer.init(params),
        densify_state=densify_mod.init_densify_state(scene.capacity),
        step=jnp.int32(0),
    )


def _zero_capacity_slots(tree, changed: jax.Array):
    """Zero every leading-dim-capacity leaf (Adam mu/nu rows) at `changed`
    slots; scalars (Adam count) and other leaves pass through."""
    m = changed.shape[0]

    def fix(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == m:
            sel = changed.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return jnp.where(sel, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(fix, tree)


def surgery_opt_state(
    opt_state: optax.OptState,
    changed: Optional[jax.Array] = None,
    reset_opacity_moments: bool = False,
    capacity: int | None = None,
) -> optax.OptState:
    """Moment surgery after a structural scene change: zero the Adam moments
    ONLY of (re)written/freed slots, preserving every untouched Gaussian's
    optimizer state (the standard 3DGS `replace_tensor_to_optimizer`
    semantics; r1/r2 re-initialized the whole optimizer instead).

    `reset_opacity_moments` additionally zeroes the opacity parameter's
    moments for ALL slots — the official recipe's behavior on the periodic
    opacity reset (every slot's opacity logit was clamped)."""
    if changed is not None:
        opt_state = _zero_capacity_slots(opt_state, changed)
    if reset_opacity_moments:
        inner = dict(opt_state.inner_states)  # multi_transform partition
        inner["opacity"] = _zero_capacity_slots(
            inner["opacity"], jnp.ones((capacity,), bool)
        )
        opt_state = opt_state._replace(inner_states=inner)
    return opt_state


def maybe_densify(
    state: TrainState,
    tc: TrainConfig,
    key: jax.Array,
    scene_extent: float,
    optimizer: optax.GradientTransformation,
) -> Tuple[TrainState, Optional[dict]]:
    """Host-side densify scheduler (called between jitted steps).

    On a structural change the optimizer moments are surgically zeroed for
    exactly the slots that changed (new clones/children, freed parents,
    pruned); untouched Gaussians keep their Adam state (`optimizer` is kept
    as an argument for API stability; the fixed-capacity SoA means the state
    STRUCTURE never changes, only slot contents)."""
    step = int(state.step)
    info = None
    scene = state.scene
    opt_state = state.opt_state
    densify_state = state.densify_state
    changed = False
    if (
        tc.densify_from <= step <= tc.densify_until
        and step % tc.densify_every == 0
    ):
        scene, densify_state, info = densify_mod.densify_and_prune(
            scene,
            densify_state,
            key,
            grad_threshold=tc.grad_threshold,
            scene_extent=scene_extent,
            max_new=tc.max_new_per_densify,
        )
        opt_state = surgery_opt_state(opt_state, info["changed_slots"])
        changed = True
    if step > 0 and step % tc.opacity_reset_every == 0:
        scene = densify_mod.reset_opacity(scene)
        opt_state = surgery_opt_state(
            opt_state, reset_opacity_moments=True, capacity=scene.capacity
        )
        changed = True
    if changed:
        return (
            TrainState(scene, opt_state, densify_state, state.step),
            info,
        )
    return state, info
