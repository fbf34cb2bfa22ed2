"""Score-model training loop: one jitted SPMD step, orbax checkpoints.

TPU-native re-design of `score_model_simple_trainer`
(`/root/reference/src/utils/trainer.py:19-108`):

- the whole optimization step (loss, grads, Adam, EMA) is ONE jitted
  program; the host only feeds data and occasionally reads the loss,
- data parallelism over a `jax.sharding.Mesh` ('data' axis): batches are
  sharded, parameters replicated, XLA inserts the grad psum over ICI,
- EMA with the reference's warm start (trainer.py:52-55) and decay ramp,
  implemented as a `lax.cond` inside the step instead of host branching,
- orbax checkpoints of (params, EMA, opt_state, step) — unlike the
  reference (which saves weights only, trainer.py:57-63), training is fully
  resumable mid-run (SURVEY.md §5.4),
- optional periodic unconditional sample grids (trainer.py:67-104).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.sde import SDE
from .ema import EmaState, ema_init, ema_update
from .losses import epsilon_matching_loss, score_matching_loss

__all__ = ["TrainState", "make_train_step", "train_score_model"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: jnp.ndarray


def make_train_step(model_apply: Callable, sde: SDE, optimizer,
                    ema_decay: float, ema_warm_start_steps: int,
                    loss_kwargs: Optional[dict] = None):
    """Build the jitted (state, batch, key) -> (state, loss) step.

    `loss_kwargs` are forwarded to the loss (e.g. ``sigma_alpha`` for the
    σ-stratified reweighting of `score_matching_loss`)."""

    loss_impl = (score_matching_loss if sde.prediction_type == "score"
                 else epsilon_matching_loss)
    loss_kwargs = dict(loss_kwargs or {})
    if sde.prediction_type != "score" and "sigma_alpha" in loss_kwargs:
        # σ-stratified reweighting targets the VESDE top-σ-decade pathology;
        # the epsilon loss takes no such kwarg (DDPM's noise scale is
        # bounded) — drop it instead of crashing the first train step
        print("note: sigma_alpha ignored for the epsilon-matching loss")
        loss_kwargs.pop("sigma_alpha")

    def loss_fn(params, key, batch):
        model = lambda x, t: model_apply(params, x, t)
        return loss_impl(key, batch, model, sde, **loss_kwargs)

    def step_fn(state: TrainState, batch: jnp.ndarray, key: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, key, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA warm start: track params verbatim until `ema_warm_start_steps`,
        # then switch to exponential averaging (reference trainer.py:52-55).
        def warm(_):
            return EmaState(shadow=params, num_updates=jnp.zeros((), jnp.int32))

        def update(_):
            return ema_update(state.ema, params, ema_decay)

        ema = jax.lax.cond(state.step < ema_warm_start_steps, warm, update,
                           operand=None)
        return TrainState(params, opt_state, ema, state.step + 1), loss

    return jax.jit(step_fn, donate_argnums=(0,))


def _restructure(template, data):
    """Re-impose the TrainState pytree structure (namedtuples incl. Adam/EMA
    states) onto the nested dicts/lists of a template-free orbax restore."""
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        vals = [data[f] if isinstance(data, dict) else data[i]
                for i, f in enumerate(template._fields)]
        return type(template)(*[_restructure(getattr(template, f), v)
                                for f, v in zip(template._fields, vals)])
    if isinstance(template, (tuple, list)):
        seq = [data[str(i)] for i in range(len(template))]             if isinstance(data, dict) else list(data)
        return type(template)(
            _restructure(t, v) for t, v in zip(template, seq))
    if isinstance(template, dict):
        return {k: _restructure(v, data[k]) for k, v in template.items()}
    return jnp.asarray(data)


@dataclasses.dataclass
class TrainLog:
    """Minimal metrics sink: stdout + JSONL file (reference used
    TensorBoard scalars, trainer.py:50-51,66)."""

    log_dir: str

    def __post_init__(self):
        os.makedirs(self.log_dir, exist_ok=True)
        self._f = open(os.path.join(self.log_dir, "train_log.jsonl"), "a")

    def scalar(self, name, value, step):
        import json

        self._f.write(json.dumps({"name": name, "value": float(value),
                                  "step": int(step), "time": time.time()}) + "\n")
        self._f.flush()


def _export_tail_average(avg_buf, log_dir: str) -> str:
    """Write the uniform average of the buffered EMA snapshots (fp16
    msgpack, same format as `scripts/average_ckpts.py` / the shipped
    `checkpoints/*.msgpack.npz` files) to `{log_dir}/avg_ema_tail.msgpack.npz`."""
    k = float(len(avg_buf))
    avg = jax.tree_util.tree_map(
        lambda *xs: (np.sum([x.astype(np.float64) for x in xs], axis=0)
                     / k).astype(np.float16), *avg_buf)
    return _export_msgpack(avg, os.path.join(log_dir, "avg_ema_tail.msgpack.npz"))


def _export_msgpack(tree, path: str) -> str:
    import flax

    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, tree)))
    return path


def _tail_average_fp32(avg_buf):
    k = float(len(avg_buf))
    return jax.tree_util.tree_map(
        lambda *xs: (np.sum([x.astype(np.float64) for x in xs], axis=0)
                     / k).astype(np.float32), *avg_buf)


# whole-tree bf16 cast as ONE compiled program (eager per-leaf casts cost
# ~0.5 s each through the TPU relay — minutes for a 200-leaf UNet)
_cast_bf16_jit = jax.jit(
    lambda t: jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), t))


def train_score_model(
    model_apply: Callable,
    init_params,
    sde: SDE,
    train_iter: Iterable[np.ndarray],
    *,
    epochs: int,
    steps_per_epoch: int,
    lr: float = 1e-4,
    lr_warmup_steps: int = 0,
    grad_clip: float = None,
    ema_decay: float = 0.999,
    ema_warm_start_steps: int = 400,
    log_freq: int = 25,
    save_model_every_n_epoch: int = 25,
    log_dir: str = "./runs",
    seed: int = 1,
    mesh=None,
    checkpointer=None,
    sample_hook: Optional[Callable] = None,
    sample_freq: int = 0,
    loss_kwargs: Optional[dict] = None,
    avg_tail: int = 0,
    probe_hook: Optional[Callable] = None,
) -> TrainState:
    """Run the training loop; returns final state.

    `train_iter` yields NHWC numpy/jax batches.  `checkpointer` is a
    `utils.checkpoint.Checkpointer` (orbax); `sample_hook(state, epoch)` may
    produce validation samples (reference trainer.py:67-104).

    `avg_tail=K` (K>=2) maintains a rolling uniform average of the EMA
    shadows of the last K checkpoint saves and exports it to
    `{log_dir}/avg_ema_tail.msgpack.npz` (fp16) after every save.  Snapshot
    averaging is measured to eliminate the top-sigma oscillation that
    collapses near-deterministic DDIM protocols with VESDE priors
    (BENCH.md round 3: single snapshots flip between 31 dB and collapse at
    eta=0.15; the 3-snapshot average reconstructs 10/10) — and it survives
    orbax's max_to_keep garbage collection, which deleted a known-good
    snapshot mid-round before this existed.

    `probe_hook(shadow_fp32_pytree) -> float` (lower = better), if given,
    scores every checkpoint save's EMA shadow AND the rolling tail average;
    the best-scoring weights so far are exported to
    `{log_dir}/best_ema.msgpack.npz` (+ provenance in best_ema.json) so a
    winning snapshot can never be garbage-collected (the round-3 lesson:
    orbax max_to_keep deleted a 10/10-good snapshot mid-eval).
    """
    # Warm-start shock guard: a fresh Adam has no second-moment calibration,
    # so its first steps move every weight by ~lr regardless of gradient
    # scale — measured in round 5 to destroy a 30.4 dB warm-start checkpoint
    # down to 6 dB within 500 steps at lr=1e-4.  A linear lr warmup lets the
    # moments calibrate while the params stay near the init.
    lr_sched = (optax.linear_schedule(0.0, lr, lr_warmup_steps)
                if lr_warmup_steps > 0 else lr)
    optimizer = (optax.chain(optax.clip_by_global_norm(grad_clip),
                             optax.adam(lr_sched))
                 if grad_clip else optax.adam(lr_sched))
    # copy the caller's params: the jitted step donates the state buffers,
    # which would otherwise invalidate the caller's arrays
    init_params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                         init_params)
    state = TrainState(params=init_params, opt_state=optimizer.init(init_params),
                       ema=ema_init(init_params), step=jnp.zeros((), jnp.int32))
    start_epoch = 0
    if checkpointer is not None and checkpointer.latest_step() is not None:
        # exact resume from the latest checkpoint: params, EMA, Adam moments
        # and step all restored (the reference cannot resume: it saves
        # weights only, trainer.py:57-63)
        restored = checkpointer.restore()
        state = _restructure(state, restored)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)
        print(f"resumed from step {int(state.step)} (epoch {start_epoch})")
    step_fn = make_train_step(model_apply, sde, optimizer, ema_decay,
                              ema_warm_start_steps, loss_kwargs=loss_kwargs)
    log = TrainLog(log_dir)
    key = jax.random.PRNGKey(seed)
    if avg_tail >= 2:
        from collections import deque

        avg_buf = deque(maxlen=int(avg_tail))
    else:
        avg_buf = None
    best_probe = None
    if probe_hook is not None:
        # carry the best-so-far score across restarts (the watchdog relaunch
        # path) so a resume can't overwrite a better earlier export
        try:
            import json

            with open(os.path.join(log_dir, "best_ema.json")) as f:
                best_probe = float(json.load(f)["score"])
            print(f"probe: resuming with best-so-far {best_probe:.5f}")
        except (OSError, ValueError, KeyError):
            pass

    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        state = replicate(mesh, state)

    data_it = iter(train_iter)
    for epoch in range(start_epoch, epochs):
        # Device-side loss accumulation: fetching `float(loss)` every step
        # would force a host sync per step and serialize dispatch against
        # execution (costly through the TPU relay).  Losses stay on device
        # and are fetched only at log points and once per epoch.
        losses = []
        for i in range(steps_per_epoch):
            batch = next(data_it)
            batch = jnp.asarray(batch)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(mesh, batch)
            key, sub = jax.random.split(key)
            state, loss = step_fn(state, batch, sub)
            losses.append(loss)
            if i % log_freq == 0:
                log.scalar("train/loss", float(loss),
                           epoch * steps_per_epoch + i + 1)
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        log.scalar("train/mean_loss_per_epoch", mean_loss, epoch + 1)
        print(f"epoch {epoch}: mean loss {mean_loss:.5f}")

        if checkpointer is not None and (
                epoch % save_model_every_n_epoch == 0 or epoch == epochs - 1):
            t_save = time.time()
            checkpointer.save(state, step=int(state.step))
            log.scalar("save/orbax_seconds", time.time() - t_save,
                       int(state.step))
            shadow_dev = (state.ema["shadow"] if isinstance(state.ema, dict)
                          else state.ema.shadow)
            shadow = None
            if avg_buf is not None:
                # host copy needed only for the rolling average; the probe
                # uses the ON-DEVICE shadow directly (a device_get +
                # re-upload of 374 MB through the TPU relay cost minutes
                # per save in round 4)
                shadow = jax.tree_util.tree_map(
                    lambda a: np.asarray(a, np.float32),
                    jax.device_get(shadow_dev))
                # keep snapshots at full precision: between consecutive saves
                # the EMA moves by ~1e-3..1e-4 relative — at/below fp16
                # resolution, so quantizing BEFORE the mean would make the
                # average quantization-dominated; only the export is fp16
                avg_buf.append(shadow)
                if len(avg_buf) >= 2:
                    _export_tail_average(avg_buf, log_dir)
            if probe_hook is not None:
                import json

                # every candidate is probed at bf16: the EMA stays ON
                # DEVICE (no 374 MB device_get + re-upload through the
                # relay; the cast is ONE jitted program — per-leaf eager
                # casts cost ~0.5 s each over the relay), the host-averaged
                # candidate uploads at half width (numpy-side ml_dtypes
                # cast), and the uniform dtype keeps ONE compiled probe
                # program (an fp32/bf16 mix would retrace the 200-step
                # DDS scan per candidate).  The score model computes in
                # bf16 anyway, so probe RANKING is unaffected.
                def _host_shadow():
                    # full-precision source for the export (the bf16 copy is
                    # only the probe transport); fetched lazily — usually the
                    # avg_buf host copy already exists
                    if shadow is not None:
                        return shadow
                    return jax.tree_util.tree_map(
                        lambda a: np.asarray(a, np.float32),
                        jax.device_get(shadow_dev))

                candidates = [("ema", _cast_bf16_jit(shadow_dev),
                               _host_shadow)]
                if avg_buf is not None and len(avg_buf) >= 2:
                    avg32 = _tail_average_fp32(avg_buf)
                    avg_bf16 = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16), avg32)
                    candidates.append((f"avg_tail{len(avg_buf)}", avg_bf16,
                                       lambda: avg32))
                for tag, weights, export_src in candidates:
                    t_probe = time.time()
                    score = float(probe_hook(weights))
                    log.scalar(f"probe/{tag}_seconds", time.time() - t_probe,
                               int(state.step))
                    log.scalar(f"probe/{tag}", score, int(state.step))
                    if best_probe is None or score < best_probe:
                        best_probe = score
                        _export_msgpack(
                            jax.tree_util.tree_map(
                                lambda a: a.astype(np.float16), export_src()),
                            os.path.join(log_dir, "best_ema.msgpack.npz"))
                        with open(os.path.join(log_dir, "best_ema.json"), "w") as f:
                            json.dump({"score": score, "step": int(state.step),
                                       "source": tag}, f)
                        print(f"probe: new best {score:.5f} ({tag} @ step "
                              f"{int(state.step)}) -> best_ema.msgpack.npz")
        if sample_freq > 0 and epoch % sample_freq == 0 and sample_hook is not None:
            sample_hook(state, epoch)

    return state
