"""Classifier training step: cross-entropy with optional MixUp/CutMix-style
soft labels (the reference trains with Adam 1e-3 + cosine, CE loss, MixUp
alpha 0.4 / CutMix alpha 1.0 at p=0.7, grad-clip 1.0 — reference:
train-model-tsr-tt100k.ipynb cells 12-13, 19-23)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from flax import linen as nn


@dataclasses.dataclass
class ClassifierTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - registered below
        return (self.params, self.batch_stats, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    ClassifierTrainState,
    ClassifierTrainState.tree_flatten,
    ClassifierTrainState.tree_unflatten,
)


def make_optimizer(lr: float = 1e-3, total_steps: int = 10_000):
    """Adam + cosine decay + grad clip 1.0, mirroring the reference recipe."""
    schedule = optax.cosine_decay_schedule(lr, decay_steps=total_steps)
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(schedule),
    )


def create_classifier_train_state(
    model: nn.Module,
    input_size: int = 64,
    seed: int = 0,
    lr: float = 1e-3,
    total_steps: int = 10_000,
) -> Tuple[ClassifierTrainState, optax.GradientTransformation]:
    from litepi_tpu.models.init_utils import fast_init

    variables = fast_init(model, seed=seed, spatial=input_size)
    tx = make_optimizer(lr, total_steps)
    state = ClassifierTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def classifier_train_step(
    model: nn.Module,
    tx: optax.GradientTransformation,
    state: ClassifierTrainState,
    batch: Dict[str, jnp.ndarray],
    dropout_key: jnp.ndarray,
) -> Tuple[ClassifierTrainState, Dict[str, jnp.ndarray]]:
    """One CE step.  ``batch``: images (B, c, c, 3) normalised; labels either
    (B,) int or (B, nc) soft (MixUp/CutMix collate produces soft labels)."""

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )
        labels = batch["labels"]
        if labels.ndim == 1:
            labels = jax.nn.one_hot(labels, out.shape[-1])
        loss = optax.softmax_cross_entropy(out, labels).mean()
        acc = (out.argmax(-1) == labels.argmax(-1)).mean()
        return loss, (acc, mutated["batch_stats"])

    (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = ClassifierTrainState(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        step=state.step + 1,
    )
    return new_state, {"loss": loss, "accuracy": acc}
