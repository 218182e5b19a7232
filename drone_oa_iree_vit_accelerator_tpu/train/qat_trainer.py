"""QAT fine-tune trainer: float checkpoint -> int8 deployment params.

JAX analog of the reference's QATTrainer (training/qa_train.py:17-95):
warm-start from a float checkpoint, fine-tune at a lower lr with the
fake-quant blocks active (observers updating every step), then
``finalize()`` converts observers + weights into the integer parameter
set (the analog of torch convert() + model_quantized_final.pth).
Defaults mirror training/config/qat.txt (lr 1e-5, few epochs, val every
epoch).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import params_io, vit_lstm as M
from .. import quant as QZ
from . import dataset as D
from .trainer import TrainConfig, Trainer, update_spectral_vectors


@dataclasses.dataclass
class QATConfig(TrainConfig):
    lr: float = 1e-5
    epochs: int = 20
    lr_warmup_epochs: int = 2
    load_checkpoint_qat: str = ""  # float checkpoint to warm-start from


def qat_sequence_loss(cfg, params, observers, batch, rng):
    """Masked MSE with fake-quant blocks; returns (loss, new_observers)."""
    b = batch["frames"].shape[0]
    state0 = M.zero_state(cfg, b)

    def tick(carry, xs):
        state, obs, rng = carry
        frames, vel, quat, gt, mask = xs
        rng, sub = jax.random.split(rng)
        attn_fn, ffn_fn, collect = QZ.qat_block_fns(params, obs, cfg.H)
        cmd, state_new = M.forward(
            cfg, params,
            frames.astype(jnp.float32) / 255.0,
            vel, quat, state,
            attn_fn=attn_fn, ffn_fn=ffn_fn,
            training=True, rng=sub,
        )
        obs = collect()
        state_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(mask[None, :, None] > 0, new, old),
            state_new, state,
        )
        err = jnp.sum((cmd - gt) ** 2, axis=-1) * mask
        return (state_new, obs, rng), jnp.sum(err)

    xs = tuple(
        jnp.moveaxis(batch[k], 0, 1)
        for k in ("frames", "vel_des", "quat", "cmd_gt", "mask")
    )
    (_, new_obs, _), errs = jax.lax.scan(tick, (state0, observers, rng), xs)
    denom = jnp.maximum(jnp.sum(batch["mask"]), 1.0)
    return jnp.sum(errs) / denom, new_obs


class QATTrainer(Trainer):
    """Fine-tunes with fake quantization and converts to int8."""

    def __init__(self, tcfg: QATConfig, trajectories=None):
        super().__init__(tcfg, trajectories)
        if tcfg.load_checkpoint_qat:
            self.params = params_io.load_params(
                tcfg.load_checkpoint_qat, self.params
            )
        self.observers = QZ.QATObservers.init(self.cfg.num_layers)

        def train_step(params, observers, opt_state, batch, rng):
            params = update_spectral_vectors(params)
            (loss, new_obs), grads = jax.value_and_grad(
                lambda p: qat_sequence_loss(self.cfg, p, observers, batch, rng),
                has_aux=True,
            )(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_obs, opt_state, loss

        self._qat_step = jax.jit(train_step)
        self._qat_eval = jax.jit(
            lambda params, observers, batch: qat_sequence_loss(
                self.cfg, params, observers, batch, jax.random.PRNGKey(0)
            )[0]
        )

    def evaluate(self) -> float:
        if not self.val_trajs:
            return float("nan")
        losses = [
            float(
                self._qat_eval(
                    self.params, self.observers, self._to_device_batch(b)
                )
            )
            for b in D.batches(self.val_trajs, self.tcfg.batch_size, shuffle=False)
        ]
        return float(np.mean(losses))

    def train_one_epoch(self, epoch: int) -> float:
        """One pass over the training set; returns mean train loss.

        Exposed so deployment pipelines can interleave epochs with
        closed-loop validation (val LOSS selection is anti-correlated
        with closed-loop success on this task — measured in the DAgger
        runs, scripts/dagger_train.py)."""
        epoch_losses = []
        for b in D.batches(
            self.train_trajs, self.tcfg.batch_size,
            seed=self.tcfg.seed + epoch,
        ):
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.observers, self.opt_state, loss = self._qat_step(
                self.params, self.observers, self.opt_state,
                self._to_device_batch(b), sub,
            )
            epoch_losses.append(float(loss))
        return float(np.mean(epoch_losses))

    def train(self) -> dict:
        best_val, best_epoch, bad_epochs = float("inf"), -1, 0
        history = []
        for epoch in range(self.tcfg.epochs):
            train_loss = self.train_one_epoch(epoch)
            val_loss = self.evaluate() if self.val_trajs else float("nan")
            history.append({"epoch": epoch, "train": train_loss, "val": val_loss})
            self.mylogger(
                f"qat epoch {epoch}", train=round(train_loss, 6),
                val=None if np.isnan(val_loss) else round(val_loss, 6),
            )
            if self.val_trajs:
                if val_loss < best_val:
                    best_val, best_epoch, bad_epochs = val_loss, epoch, 0
                else:
                    bad_epochs += 1
                if bad_epochs >= self.tcfg.early_stopping_patience:
                    self.mylogger(f"early stopping at epoch {epoch}")
                    break
        final = self.finalize()
        return {
            "best_val": best_val,
            "best_epoch": best_epoch,
            "final_checkpoint": str(final),
            "history": history,
        }

    def finalize(self) -> pathlib.Path:
        """Convert to integer params and save both float + int artifacts
        (the analog of reference qa_train.py:81-95 finalize())."""
        self.save("qat_final")
        int_params = jax.jit(QZ.convert_model, static_argnums=2)(
            self.params, self.observers, self.cfg.H
        )
        path = self.workspace / "model_quantized_final.npz"
        params_io.save_params(str(path), int_params)
        self.mylogger(f"saved int8 params to {path}")
        return path

    def load_int_params(self, path: str | pathlib.Path | None = None) -> dict:
        like = QZ.convert_model(self.params, self.observers, self.cfg.H)
        return params_io.load_params(
            str(path or self.workspace / "model_quantized_final.npz"), like
        )


def main(argv=None):
    import argparse

    from ..utils.config import parse_with_config

    ap = argparse.ArgumentParser()
    for f in dataclasses.fields(QATConfig):
        ap.add_argument(
            f"--{f.name}",
            type=type(f.default) if f.default is not None else str,
            default=f.default,
        )
    args = parse_with_config(ap, argv)
    tcfg = QATConfig(
        **{f.name: getattr(args, f.name) for f in dataclasses.fields(QATConfig)}
    )
    result = QATTrainer(tcfg).train()
    print(json.dumps({k: v for k, v in result.items() if k != "history"}))


if __name__ == "__main__":
    main()
