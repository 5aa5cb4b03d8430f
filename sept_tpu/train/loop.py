"""Epoch / fold training drivers.

Re-expresses the reference's training loops
(/root/reference/training/training_adversary_baselines.py:440-460,
training_cloak.py:391-442, training_cloak_with_grl.py:430-446) around jitted
steps:

- per-epoch: train pass, validation pass, sliding-vote test pass;
- best-model selection by validation accuracy, only after
  ``min_select_epoch`` (reference epoch > 10, :404 / :453-460);
- early stopping on validation loss with patience 10 (:374, :440-442);
- SGD StepLR decays inside the optax schedule; Adam's ReduceLROnPlateau is
  host-side (PlateauScheduler + set_lr_scale), matching the
  scheduler.step(val_loss) call placement (training_cloak.py:175-181);
- combine-mode per-speaker loss weights from get_class_weight over
  speaker+dataset counts (training_cloak.py:283-290), multiplied onto the
  batch padding mask.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.data.pipeline import SplitArrays, batch_iterator
from sept_tpu.eval import metrics as M
from sept_tpu.eval.sliding import make_sliding_vote_fn
from sept_tpu.train.config import ExperimentConfig

__all__ = [
    "EarlyStopping",
    "speaker_weights",
    "run_train_epoch",
    "run_eval_epoch",
    "run_test",
    "fit",
    "FitResult",
]


class EarlyStopping:
    """Patience counter on validation loss (training_tools.py:83-129)."""

    def __init__(self, patience: int = 10, delta: float = 0.0):
        self.patience = patience
        self.delta = delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, val_loss: float) -> bool:
        score = -val_loss
        if self.best is None:
            self.best = score
        elif score < self.best + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        else:
            self.best = score
            self.counter = 0
        return self.should_stop


def speaker_weights(split: SplitArrays) -> dict[str, float]:
    """Per-(speaker, dataset) loss weights for combine mode
    (training_cloak.py:283-290)."""
    counts: dict[str, int] = {}
    for spk, ds in zip(split.speaker_ids, split.datasets):
        key = f"{spk}_{ds}"
        counts[key] = counts.get(key, 0) + 1
    return M.get_class_weight(counts)


def _apply_speaker_weights(batch: dict, weights: Optional[dict[str, float]]):
    if weights is None:
        return batch
    w = np.array(
        [
            weights.get(f"{spk}_{ds}", 1.0)
            for spk, ds in zip(batch["speaker_ids"], batch["datasets"])
        ],
        dtype=np.float32,
    )
    out = dict(batch)
    out["weight"] = batch["weight"] * w
    return out


def _device_batch(batch: dict) -> dict:
    return {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k not in ("speaker_ids", "datasets")
    }


def run_train_epoch(
    step_fn: Callable,
    state,
    split: SplitArrays,
    cfg: ExperimentConfig,
    rng: np.random.Generator,
    spk_weights: Optional[dict] = None,
    mask=None,
    label_key: Optional[str] = None,
):
    """One training pass; returns (state, {'loss', 'acc', 'uar', ...})."""
    label_key = label_key or (
        "labels_gen" if cfg.pred == "gender" else "labels_emo"
    )
    losses, all_preds, all_truth, all_w = [], [], [], []
    for batch in batch_iterator(split, cfg.batch_size, rng, shuffle=True):
        batch = _apply_speaker_weights(batch, spk_weights)
        db = _device_batch(batch)
        if mask is not None:
            state, m = step_fn(state, db, mask)
        else:
            state, m = step_fn(state, db)
        losses.append(float(m["loss"]))
        all_preds.append(np.asarray(m["preds"]))
        all_truth.append(batch[label_key])
        all_w.append(batch["weight"] > 0)
    preds = np.concatenate(all_preds)[np.concatenate(all_w)]
    truth = np.concatenate(all_truth)[np.concatenate(all_w)]
    return state, {
        "loss": float(np.mean(losses)),
        "acc": M.accuracy(truth, preds),
        "uar": M.uar(truth, preds),
        "conf": M.confusion(truth, preds),
    }


def run_eval_epoch(
    logits_fn: Callable,
    state,
    split: SplitArrays,
    cfg: ExperimentConfig,
    label_key: Optional[str] = None,
    spk_weights: Optional[dict] = None,
):
    """Validation pass (eval-mode forward, windowed batches).

    ``spk_weights``: combine-mode speaker weights — the reference applies
    them to the VALIDATE loss too (training_adversary_baselines.py:178 runs
    in both modes), so the plateau scheduler and early stopping see the
    weighted statistic."""
    label_key = label_key or (
        "labels_gen" if cfg.pred == "gender" else "labels_emo"
    )
    rng = np.random.default_rng(0)
    losses, all_preds, all_truth, all_w = [], [], [], []
    for batch in batch_iterator(split, cfg.batch_size, rng, shuffle=False):
        batch = _apply_speaker_weights(batch, spk_weights)
        db = _device_batch(batch)
        logits = logits_fn(
            state.params, state.batch_stats, db["spec"], db.get("global")
        )
        if isinstance(logits, tuple):  # multitask: metrics track emotion head
            logits = logits[0]
        logp = jax.nn.log_softmax(logits)
        labels = db[label_key]
        w = db["weight"]
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        # reference denominator: sum(ce_i*w_i)/len(preds) — speaker weights
        # scale the numerator only (training_adversary_baselines.py:175-179,
        # run in validate mode too); dividing by sum(w) shrank combine-mode
        # val losses by the mean weight and diverged from the device
        # driver's make_val_pass (device_loop.py:167)
        n_real = jnp.maximum(jnp.sum((w > 0).astype(jnp.float32)), 1.0)
        losses.append(float(jnp.sum(nll * w) / n_real))
        all_preds.append(np.asarray(jnp.argmax(logits, -1)))
        all_truth.append(batch[label_key])
        all_w.append(batch["weight"] > 0)
    preds = np.concatenate(all_preds)[np.concatenate(all_w)]
    truth = np.concatenate(all_truth)[np.concatenate(all_w)]
    return {
        "loss": float(np.mean(losses)),
        "acc": M.accuracy(truth, preds),
        "uar": M.uar(truth, preds),
    }


# one compiled vote program per (logits_fn, window geometry): params are jit
# ARGUMENTS, so the same executable serves every epoch of a fold.  Each cache
# entry stores logits_fn itself alongside the vote program: while the entry
# lives, CPython cannot recycle id(logits_fn) for a new function, so a later
# fold can never be handed a vote program compiled around a previous fold's
# garbage-collected closure (id-reuse hazard).  Entries are evicted FIFO at
# 64, releasing the pinned fn.
_VOTE_CACHE: dict = {}


def _cached_vote(logits_fn, win_len: int, shift_len: int):
    key = (id(logits_fn), win_len, shift_len)
    entry = _VOTE_CACHE.get(key)
    if entry is None or entry[0] is not logits_fn:

        def param_logits(params, batch_stats, wins, g):
            out = logits_fn(params, batch_stats, wins, g)
            # multitask models return (emotion, gender); metrics track emotion
            return out[0] if isinstance(out, tuple) else out

        entry = (logits_fn, make_sliding_vote_fn(param_logits, win_len, shift_len))
        _VOTE_CACHE[key] = entry
        if len(_VOTE_CACHE) > 64:
            _VOTE_CACHE.pop(next(iter(_VOTE_CACHE)))
    return entry[1]


def run_test(
    logits_fn: Callable,
    state,
    test: SplitArrays,
    cfg: ExperimentConfig,
    label_key: Optional[str] = None,
    batch_size: int = 16,
):
    """Sliding-window vote over whole test utterances
    (training_cloak.py:66-81 protocol, batched + vmapped)."""
    label_key = label_key or (
        "labels_gen" if cfg.pred == "gender" else "labels_emo"
    )
    vote = _cached_vote(logits_fn, cfg.win_len, cfg.shift_len)
    preds = []
    n = len(test)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        pad = batch_size - (hi - lo)
        specs = test.windows[lo:hi]
        lengths = test.lengths[lo:hi]
        g = test.global_data[lo:hi] if cfg.global_feature else None
        if pad:
            specs = np.concatenate([specs, np.zeros((pad,) + specs.shape[1:], specs.dtype)])
            lengths = np.concatenate([lengths, np.full(pad, cfg.win_len, np.int32)])
            if g is not None:
                g = np.concatenate([g, np.zeros((pad, g.shape[1]), g.dtype)])
        probs, _ = vote(state.params, state.batch_stats, specs, lengths, g)
        preds.append(np.asarray(jnp.argmax(probs, -1))[: hi - lo])
    preds = np.concatenate(preds) if preds else np.zeros(0, np.int64)
    truth = getattr(test, label_key)
    out = {
        "acc": M.accuracy(truth, preds),
        "uar": M.uar(truth, preds),
        "conf": M.confusion(truth, preds),
        "preds": preds,
        "truth": truth,
    }
    # combine-mode per-corpus breakdown (training_tools.py:153-170)
    corpora = set(test.datasets.tolist())
    if len(corpora) > 1:
        out["per_dataset"] = {}
        for ds in sorted(corpora):
            sel = test.datasets == ds
            out["per_dataset"][ds] = {
                "acc": M.accuracy(truth[sel], preds[sel]),
                "uar": M.uar(truth[sel], preds[sel]),
            }
    return out


@dataclasses.dataclass
class FitResult:
    best_state: object
    best_epoch: int
    best_val_acc: float
    final_test_acc: float
    final_test_uar: float
    final_confusion: np.ndarray
    history: list


def fit(
    state,
    step_fn: Callable,
    logits_fn: Callable,
    train_split: SplitArrays,
    val_split: SplitArrays,
    test_split: SplitArrays,
    cfg: ExperimentConfig,
    spk_weights: Optional[dict] = None,
    mask=None,
    verbose: bool = True,
    profile_dir: Optional[str] = None,
    epoch_callback=None,
) -> FitResult:
    """The reference's per-fold epoch loop with best-model tracking.

    All selection/stopping bookkeeping (STRICT best-by-val-acc after
    ``min_select_epoch``, plateau scaling, patience gating,
    ``early_stop_with_sgd``) is delegated to the single shared loop in
    ``device_loop._run_epoch_loop`` — the host and device drivers MUST make
    those decisions identically, and separate copies drifted repeatedly.

    ``profile_dir`` wraps the first training epoch in a jax.profiler trace
    (TensorBoard-loadable; the reference has no profiling — SURVEY.md §5).
    """
    from sept_tpu.train.device_loop import _run_epoch_loop
    from sept_tpu.utils.profiling import trace as profiler_trace

    rng = np.random.default_rng(cfg.seed)

    def train_epoch(st, epoch, order):  # order unused: batch_iterator shuffles
        with profiler_trace(
            profile_dir, enabled=epoch == 0 and profile_dir is not None
        ):
            return run_train_epoch(
                step_fn, st, train_split, cfg, rng, spk_weights, mask
            )

    return _run_epoch_loop(
        state, cfg,
        train_epoch=train_epoch,
        val_epoch=lambda st: run_eval_epoch(logits_fn, st, val_split, cfg,
                                            spk_weights=spk_weights),
        test_epoch=lambda st: run_test(logits_fn, st, test_split, cfg),
        m_total=len(train_split),
        needs_order=False,
        resume_path=None,
        replicate=lambda st: st,
        verbose=verbose,
        epoch_callback=epoch_callback,
    )


