"""Training engine: state, jitted train step, distributed binding.

Semantics mirror the reference Trainer (models/trainer.py:52-238):
  * frozen IR-SE50 encoder in inference mode during training
    (models/trainer.py:62-63,79) — its params never receive gradients
  * RecNet forward on the clean then the masked branch, BOTH in train mode
    (BN batch stats; running stats updated clean-branch-first, matching the
    sequential in-place torch updates, models/trainer.py:144-145)
  * four-part weighted loss (training/losses.py)
  * elementwise grad clip at 1.0 -> optimizer step (models/trainer.py:182-187)
  * MultiStepLR([5000, 10000, 15000], 0.5) advanced per iteration

TPU-native: one jitted function per step (forward both branches, loss,
grads, update), pjit-sharded over a ('data', 'model') mesh — batch on
'data', the CosFace classifier (and its optimizer moments) on 'model'; XLA
inserts the gradient psum and logits collectives.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ffrnet_tpu.models import irse, recnet
from ffrnet_tpu.models.recnet import RecNetConfig
from ffrnet_tpu.parallel.mesh import batch_sharding, recnet_param_shardings, replicated
from ffrnet_tpu.training import losses, optimizers, schedules


@dataclass(frozen=True)
class TrainerConfig:
    optimizer: str = "adam"
    lr: float = 1e-1
    beta1: float = 0.9
    beta2: float = 0.999
    momentum: float = 0.9
    weight_decay: float = 0.0
    loss_weight: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    milestones: Tuple[int, ...] = (5000, 10000, 15000)
    lr_gamma: float = 0.5
    clip_value: float = 1.0
    faithful_ce_weight: bool = True
    compute_dtype: str = "fp32"  # 'bf16' = mixed precision: bf16 fwd/bwd,
    # fp32 master params / optimizer / loss reductions / BN statistics
    recnet: RecNetConfig = field(default_factory=RecNetConfig)

    def lr_schedule(self):
        return schedules.multistep_lr(self.lr, self.milestones, self.lr_gamma)

    def make_tx(self) -> optax.GradientTransformation:
        return optimizers.make_optimizer(
            self.optimizer, self.lr_schedule(), b1=self.beta1, b2=self.beta2,
            momentum=self.momentum, weight_decay=self.weight_decay,
            clip_value=self.clip_value, base_lr=self.lr)


class TrainState(NamedTuple):
    params: Any        # RecNet params (trainable)
    model_state: Any   # RecNet BN running stats
    opt_state: Any
    step: jnp.ndarray  # completed update count


def create_train_state(rng, cfg: TrainerConfig) -> TrainState:
    params, model_state = recnet.init(rng, cfg.recnet)
    tx = cfg.make_tx()
    return TrainState(params, model_state, tx.init(params),
                      jnp.zeros([], jnp.int32))


def train_step(encoder_params, encoder_state, state: TrainState, batch,
               *, cfg: TrainerConfig):
    """One optimization step. batch: dict with
    'img_non'/'img_ocl' (N,112,112,3) in [-1,1] BGR and 'label' (N,).

    Returns (new_state, metrics). Pure — jit/pjit it (cfg is static).
    """
    rc = cfg.recnet
    if cfg.compute_dtype not in ("fp32", "bf16"):
        raise ValueError(f"compute_dtype must be fp32|bf16, "
                         f"got {cfg.compute_dtype!r}")
    half = jnp.bfloat16 if cfg.compute_dtype == "bf16" else None

    from ffrnet_tpu.ops.nn import tree_cast_floats

    def cast(tree):
        return tree_cast_floats(tree, half)

    enc_p, enc_s = cast(encoder_params), cast(encoder_state)
    # one 2N encoder forward for both branches (frozen/eval mode: no batch
    # statistics, so concatenation is numerically identical to two passes
    # and halves conv dispatches)
    n = batch["img_non"].shape[0]
    both = jnp.concatenate(
        [cast(batch["img_non"]), cast(batch["img_ocl"])], axis=0)
    featmap_both, embed_both, _ = irse.apply(enc_p, enc_s, both,
                                             training=False)
    featmap_non, featmap_ocl = featmap_both[:n], featmap_both[n:]
    embed_non, embed_ocl = embed_both[:n], embed_both[n:]
    labels = batch["label"]

    def loss_fn(params):
        # mixed precision: bf16 compute params; grads flow back to the fp32
        # masters through the cast (loss reductions stay fp32, losses.py)
        p = cast(params)
        out_non, st1 = recnet.apply(p, state.model_state, featmap_non,
                                    labels, cfg=rc, training=True)
        out_ocl, st2 = recnet.apply(p, st1, featmap_ocl,
                                    labels, cfg=rc, training=True)
        lb = losses.ffrnet_objective(
            featmap_non=featmap_non, embed_non=embed_non, embed_ocl=embed_ocl,
            out_non=out_non, out_ocl=out_ocl, labels=labels,
            loss_weight=cfg.loss_weight,
            faithful_ce_weight=cfg.faithful_ce_weight, ss_impl=rc.ss_impl)
        return lb.total, (lb, st2)

    (_, (lb, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = cfg.make_tx().update(
        grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_model_state, new_opt_state,
                           state.step + 1)
    metrics = {
        "SelfSimilarityLoss": lb.self_similarity,
        "TripletLoss": lb.triplet,
        "IdentityLoss": lb.identity,
        "ClassifierLoss": lb.classifier,
        "TotalLoss": lb.total,
        "TrainAcc": lb.accuracy,
        "PosDist": lb.pos_dist,
        "NegDist": lb.neg_dist,
        "LR": cfg.lr_schedule()(state.step),
    }
    return new_state, metrics


def _opt_state_shardings(mesh, opt_state, cls_shape):
    """Replicate optimizer state except moments matching the classifier
    weight shape, which shard over 'model' like the weight itself."""
    rep = replicated(mesh)
    cls = NamedSharding(mesh, P("model", None))

    def leaf(x):
        if hasattr(x, "shape") and tuple(x.shape) == tuple(cls_shape):
            return cls
        return rep

    return jax.tree.map(leaf, opt_state)


def make_distributed_step(mesh, cfg: TrainerConfig, encoder_params,
                          encoder_state, state: TrainState):
    """Bind train_step to a mesh.

    Returns (jitted_step, (enc_params, enc_state, state) placed with their
    shardings). Call as step(enc_p, enc_s, state, batch) with the batch
    already sharded over 'data' (see ffrnet_tpu.parallel.batch_sharding).
    """
    rep = replicated(mesh)
    p_shard = recnet_param_shardings(mesh, state.params)
    cls_shape = state.params["classifier"]["w"].shape
    state_shard = TrainState(
        params=p_shard,
        model_state=jax.tree.map(lambda _: rep, state.model_state),
        opt_state=_opt_state_shardings(mesh, state.opt_state, cls_shape),
        step=rep,
    )
    enc_p_shard = jax.tree.map(lambda _: rep, encoder_params)
    enc_s_shard = jax.tree.map(lambda _: rep, encoder_state)
    bs = batch_sharding(mesh)
    batch_shard = {"img_non": bs, "img_ocl": bs, "label": bs}

    step = jax.jit(
        partial(train_step, cfg=cfg),
        in_shardings=(enc_p_shard, enc_s_shard, state_shard, batch_shard),
        out_shardings=(state_shard, rep),
        donate_argnums=(2,),
    )

    placed = (
        jax.device_put(encoder_params, enc_p_shard),
        jax.device_put(encoder_state, enc_s_shard),
        TrainState(
            jax.device_put(state.params, p_shard),
            jax.device_put(state.model_state, state_shard.model_state),
            jax.device_put(state.opt_state, state_shard.opt_state),
            jax.device_put(state.step, rep),
        ),
    )
    return step, placed
