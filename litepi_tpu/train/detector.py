"""Detector training step (the reference trains via Ultralytics on GPU —
train-yolo-custom-tt100k.ipynb cell 36; here it is a native jitted JAX step
designed to shard over a ('data', 'model') mesh).

The step is one pure function of (state, batch): forward in bfloat16, loss in
float32, grads, optimizer update, BN batch-stats update.  Under a mesh with
batch-sharded inputs and replicated params, XLA inserts the gradient psum over
ICI automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from litepi_tpu.core.types import DetectorConfig
from litepi_tpu.models import YoloLitePi
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.train.losses import detection_loss


@dataclasses.dataclass
class DetectorTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None

    def tree_flatten(self):  # pragma: no cover - registered below
        return (
            self.params,
            self.batch_stats,
            self.opt_state,
            self.step,
            self.ema_params,
        ), None

    @classmethod
    def tree_unflatten(cls, _, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    DetectorTrainState,
    DetectorTrainState.tree_flatten,
    DetectorTrainState.tree_unflatten,
)


def make_lr_schedule(
    lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    final_lr_fraction: float = 0.01,
):
    """Ultralytics one-cycle shape: linear warmup from lr/10, cosine decay
    to ``lr * final_lr_fraction``."""
    return optax.warmup_cosine_decay_schedule(
        init_value=lr / 10.0,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=lr * final_lr_fraction,
    )


def make_optimizer(
    lr: float = 1e-2,
    weight_decay: float = 5e-4,
    momentum: float = 0.937,
    total_steps: int = 0,
    warmup_steps: int = 0,
    final_lr_fraction: float = 0.01,
) -> optax.GradientTransformation:
    """SGD + nesterov momentum + weight decay — the Ultralytics default
    recipe family the reference trained with (30 epochs, batch 16).

    With ``total_steps`` > 0 the learning rate follows the Ultralytics
    one-cycle shape: linear warmup from lr/10 over ``warmup_steps``
    (warmup_epochs=3 default upstream), then cosine decay to
    ``lr * final_lr_fraction`` (lrf=0.01).  ``total_steps=0`` keeps a
    constant lr (the round-1 behaviour, used by short smoke runs).
    """
    schedule = (
        make_lr_schedule(lr, total_steps, warmup_steps, final_lr_fraction)
        if total_steps > 0
        else lr
    )
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(schedule, momentum=momentum, nesterov=True),
    )


def create_detector_train_state(
    cfg: DetectorConfig,
    seed: int = 0,
    lr: float = 1e-2,
    dtype: jnp.dtype = jnp.bfloat16,
    total_steps: int = 0,
    warmup_steps: int = 0,
    model: Any = None,
) -> Tuple[YoloLitePi, DetectorTrainState, optax.GradientTransformation]:
    """Build (model, train state, optimizer).

    ``model`` overrides the default YoloLitePi — any detector with the
    ``{reg, cls}`` head contract trains under the same TAL loss (the
    baseline fine-tuning path: YoloV11, YoloV5(anchor_free=True)); ``cfg``
    then only supplies the anchor grid / reg_max for the loss (pass it to
    :func:`detector_train_step` explicitly, such models carry no ``.cfg``).
    """
    from litepi_tpu.models.init_utils import fast_init

    if model is None:
        model = YoloLitePi(cfg, dtype=dtype)
    variables = fast_init(model, seed=seed)
    tx = make_optimizer(lr, total_steps=total_steps, warmup_steps=warmup_steps)
    state = DetectorTrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ema_params=variables["params"],
    )
    return model, state, tx


# Ultralytics ModelEMA recipe: decay ramps from 0 with time constant
# tau=2000 updates towards 0.9999, so early training moves the EMA quickly
# and late training averages over ~10k steps.  BN batch-stats are already an
# exponential average (momentum 0.97), so only params are EMA'd here.
EMA_DECAY = 0.9999
EMA_TAU = 2000.0


def ema_update(ema: Any, params: Any, step: jnp.ndarray) -> Any:
    d = EMA_DECAY * (1.0 - jnp.exp(-step.astype(jnp.float32) / EMA_TAU))
    return jax.tree.map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype), ema, params
    )


def detector_train_step(
    model: YoloLitePi,
    tx: optax.GradientTransformation,
    state: DetectorTrainState,
    batch: Dict[str, jnp.ndarray],
    cfg: DetectorConfig = None,
) -> Tuple[DetectorTrainState, Dict[str, jnp.ndarray]]:
    """One optimization step.

    ``batch``: images (B, S, S, 3) float32 in [0,1]; gt_boxes (B, G, 4) xyxy
    pixels (padded); gt_labels (B, G); gt_mask (B, G) bool.
    Wrap with ``jax.jit(functools.partial(detector_train_step, model, tx),
    donate_argnums=0)`` and shard the batch over the mesh's data axis.
    ``cfg`` (anchor grid + reg_max for the loss) defaults to ``model.cfg``;
    required for models without one (YoloV11 / anchor-free YoloV5).
    """
    cfg = cfg if cfg is not None else model.cfg
    anchors, strides = make_anchors(cfg.input_size, cfg.strides)
    anchors = jnp.asarray(anchors)
    strides = jnp.asarray(strides)

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
        )
        loss, aux = detection_loss(
            out,
            anchors,
            strides,
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_mask"],
            reg_max=cfg.reg_max,
        )
        return loss, (aux, mutated["batch_stats"])

    (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_step = state.step + 1
    new_state = DetectorTrainState(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
        step=new_step,
        ema_params=ema_update(state.ema_params, new_params, new_step)
        if state.ema_params is not None
        else None,
    )
    metrics = {"loss": loss, **aux}
    return new_state, metrics
