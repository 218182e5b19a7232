"""Float trainer: behavior cloning over trajectory datasets.

JAX re-implementation of the vitfly TRAINER semantics the reference
builds on (SURVEY.md section 2.5: trajectory-folder dataset, workspace +
logger, lr warmup/decay, val split, early stopping, periodic
checkpoints; flags per reference training/config/train.txt):

- loss: masked MSE between predicted and expert velocity commands,
  unrolled over each trajectory with the LSTM state threaded by
  lax.scan (the reference feeds full trajectories through the
  stateful model the same way);
- optimizer: Adam with linear warmup then cosine decay, gradient clip;
- spectral-norm power iteration advances once per step (torch updates
  u/v on every training forward);
- checkpoints: flat .npz pytrees (models/params_io), ``model_{epoch}``
  naming like the reference's model_000205.pth lineage.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import MODEL_ZOO, ModelConfig
from ..models import layers as L
from ..models import params_io, vit_lstm as M
from . import dataset as D


@dataclasses.dataclass
class TrainConfig:
    dataset_dir: str = ""
    workspace: str = "workspace"
    model: str = "ITA_single_layer_upsample_shuffle"
    lr: float = 1e-4
    epochs: int = 50
    lr_warmup_epochs: int = 10
    batch_size: int = 4
    val_split: float = 0.2
    seed: int = 42
    save_model_freq: int = 10
    val_freq: int = 1
    early_stopping_patience: int = 15
    grad_clip: float = 1.0
    load_checkpoint: str = ""
    # 'ita' trains MODEL_ZOO[model] via models/vit_lstm; 'vitfly' trains
    # the upstream ITALSTM family (models/vitfly.py) — the reference
    # trains that family with the SAME trainer semantics
    # (training/qa_train.py warm-starts the upstream checkpoint).
    family: str = "ita"


def sequence_loss(cfg: ModelConfig, params, batch, rng, training=True,
                  forward_fn=None):
    """Masked MSE over a padded trajectory batch (B, T, ...)."""
    forward_fn = forward_fn or M.forward
    b = batch["frames"].shape[0]
    state0 = M.zero_state(cfg, b)

    def tick(carry, xs):
        state, rng = carry
        frames, vel, quat, gt, mask = xs
        rng, sub = jax.random.split(rng)
        cmd, state_new = forward_fn(
            cfg, params,
            frames.astype(jnp.float32) / 255.0,
            vel, quat, state,
            training=training, rng=sub if training else None,
        )
        # Freeze state on padded steps.
        state_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(mask[None, :, None] > 0, new, old),
            state_new, state,
        )
        err = jnp.sum((cmd - gt) ** 2, axis=-1) * mask
        return (state_new, rng), jnp.sum(err)

    xs = (
        jnp.moveaxis(batch["frames"], 0, 1),
        jnp.moveaxis(batch["vel_des"], 0, 1),
        jnp.moveaxis(batch["quat"], 0, 1),
        jnp.moveaxis(batch["cmd_gt"], 0, 1),
        jnp.moveaxis(batch["mask"], 0, 1),
    )
    (_, _), errs = jax.lax.scan(tick, (state0, rng), xs)
    denom = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
    return jnp.sum(errs) / denom


def update_spectral_vectors(params):
    """One power-iteration step for every spectral-norm layer."""
    new = dict(params)
    for name in ("decoder", "fc2"):
        p = dict(params[name])
        _, u, v = L.spectral_norm_weight(p["w"], p["u"], p["v"], update=True)
        p["u"], p["v"] = u, v
        new[name] = p
    return new


class Trainer:
    """Float behavior-cloning trainer (vitfly-TRAINER-shaped)."""

    def __init__(self, tcfg: TrainConfig, trajectories=None):
        self.tcfg = tcfg
        if tcfg.family == "vitfly":
            from ..models import vitfly as VF

            self.cfg = VF.VITFLY_LSTM
            self._init_params = VF.init_params
            self._forward = VF.forward
        else:
            self.cfg = MODEL_ZOO[tcfg.model]
            self._init_params = M.init_params
            self._forward = M.forward
        self.workspace = pathlib.Path(tcfg.workspace)
        self.workspace.mkdir(parents=True, exist_ok=True)
        self.log_file = self.workspace / "train_log.jsonl"

        trajs = trajectories or D.load_dataset(tcfg.dataset_dir)
        n_val = max(1, int(len(trajs) * tcfg.val_split)) if len(trajs) > 1 else 0
        self.val_trajs = trajs[:n_val]
        self.train_trajs = trajs[n_val:]

        key = jax.random.PRNGKey(tcfg.seed)
        self.params = self._init_params(self.cfg, key)
        if tcfg.load_checkpoint:
            self.params = params_io.load_params(tcfg.load_checkpoint, self.params)
        self.rng = jax.random.fold_in(key, 1)

        steps_per_epoch = max(1, -(-len(self.train_trajs) // tcfg.batch_size))
        warmup_steps = tcfg.lr_warmup_epochs * steps_per_epoch
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=tcfg.lr,
            warmup_steps=warmup_steps,
            decay_steps=max(tcfg.epochs * steps_per_epoch, warmup_steps + 1),
            end_value=tcfg.lr * 0.1,
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adam(schedule),
        )
        self.opt_state = self.optimizer.init(self.params)

        def train_step(params, opt_state, batch, rng):
            params = update_spectral_vectors(params)
            loss, grads = jax.value_and_grad(
                lambda p: sequence_loss(
                    self.cfg, p, batch, rng, forward_fn=self._forward
                )
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(train_step)
        self._eval_loss = jax.jit(
            lambda params, batch: sequence_loss(
                self.cfg, params, batch, jax.random.PRNGKey(0),
                training=False, forward_fn=self._forward,
            )
        )

    def mylogger(self, msg: str, **extra) -> None:
        line = {"t": time.time(), "msg": msg, **extra}
        print(f"[trainer] {msg} {extra if extra else ''}")
        with open(self.log_file, "a") as f:
            f.write(json.dumps(line) + "\n")

    def _to_device_batch(self, b: D.Batch) -> dict:
        return {k: jnp.asarray(v) for k, v in b._asdict().items()}

    def evaluate(self) -> float:
        if not self.val_trajs:
            return float("nan")
        losses = [
            float(self._eval_loss(self.params, self._to_device_batch(b)))
            for b in D.batches(self.val_trajs, self.tcfg.batch_size, shuffle=False)
        ]
        return float(np.mean(losses))

    def save(self, tag: str) -> pathlib.Path:
        path = self.workspace / f"model_{tag}.npz"
        params_io.save_params(str(path), self.params)
        return path

    def save_resume_state(self, epoch: int) -> pathlib.Path:
        """Full training state (params + optimizer + epoch) for resume —
        the analog of the reference TRAINER's checkpoint_path resume."""
        path = self.workspace / "resume_state.npz"
        params_io.save_params(
            str(path),
            {"params": self.params, "opt_state": self.opt_state,
             "epoch": jnp.int32(epoch)},
        )
        return path

    def load_resume_state(self, path: str | pathlib.Path | None = None) -> int:
        """Restore params/optimizer; returns the next epoch index."""
        like = {"params": self.params, "opt_state": self.opt_state,
                "epoch": jnp.int32(0)}
        state = params_io.load_params(
            str(path or self.workspace / "resume_state.npz"), like
        )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        return int(state["epoch"]) + 1

    def train(self, start_epoch: int = 0, on_epoch=None) -> dict:
        """Run the training loop.

        ``on_epoch(epoch, params) -> None`` is an optional hook called
        after every epoch — scripts/dagger_train.py uses it to run a
        closed-loop validation and keep the best-by-success checkpoint,
        because val LOSS is anti-correlated with closed-loop success on
        this task (measured round 2; see scripts/qat_deploy.py header).
        """
        best_val, best_epoch, bad_epochs = float("inf"), -1, 0
        history = []
        for epoch in range(start_epoch, self.tcfg.epochs):
            epoch_losses = []
            for b in D.batches(
                self.train_trajs, self.tcfg.batch_size,
                seed=self.tcfg.seed + epoch,
            ):
                self.rng, sub = jax.random.split(self.rng)
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, self._to_device_batch(b), sub
                )
                epoch_losses.append(float(loss))
            train_loss = float(np.mean(epoch_losses))

            val_loss = float("nan")
            if self.val_trajs and (epoch + 1) % self.tcfg.val_freq == 0:
                val_loss = self.evaluate()
                if val_loss < best_val:
                    best_val, best_epoch, bad_epochs = val_loss, epoch, 0
                    self.save("best")
                else:
                    bad_epochs += 1
            history.append({"epoch": epoch, "train": train_loss, "val": val_loss})
            if on_epoch is not None:
                on_epoch(epoch, self.params)
            self.mylogger(
                f"epoch {epoch}", train=round(train_loss, 6),
                val=None if np.isnan(val_loss) else round(val_loss, 6),
            )
            if (epoch + 1) % self.tcfg.save_model_freq == 0:
                self.save(f"{epoch + 1:06d}")
                self.save_resume_state(epoch)
            if (
                self.val_trajs
                and bad_epochs >= self.tcfg.early_stopping_patience
            ):
                self.mylogger(f"early stopping at epoch {epoch}")
                break
        final = self.save("final")
        return {
            "best_val": best_val,
            "best_epoch": best_epoch,
            "final_checkpoint": str(final),
            "history": history,
        }


def main(argv=None):
    import argparse

    from ..utils.config import parse_with_config

    ap = argparse.ArgumentParser()
    for f in dataclasses.fields(TrainConfig):
        ap.add_argument(
            f"--{f.name}",
            type=type(f.default) if f.default is not None else str,
            default=f.default,
        )
    args = parse_with_config(ap, argv)
    tcfg = TrainConfig(
        **{f.name: getattr(args, f.name) for f in dataclasses.fields(TrainConfig)}
    )
    result = Trainer(tcfg).train()
    print(json.dumps({k: v for k, v in result.items() if k != "history"}))


if __name__ == "__main__":
    main()
