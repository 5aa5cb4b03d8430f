"""Utility-privacy evaluation sweep.

Re-implements /root/reference/training/adversary_cloak_evaluation.py: for each
suppression ratio in {0, 20, 40, 60, 80} and each fold, run the test split's
whole utterances through the trained cloak, take the *noised* features, feed
them to BOTH the frozen emotion baseline and the frozen gender adversary
(:78-83), sliding-window softmax-vote per utterance, then aggregate per-fold
means into the reference CSV schema
(columns baseline_acc / baseline_rec / adv_acc / adv_rec, rows
``suppression_ratio_<r>_<dataset>`` — :287-298).

Mask semantics at evaluation (reference quirk 8, honored as the evaluation
contract): threshold = percentile(scales, ratio); cells with scale ABOVE the
threshold are zeroed (:262-267).  The cloak noise layer runs with
max_scale=5 at evaluation (:205) vs 10 at training.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.data.pipeline import SplitArrays
from sept_tpu.eval import metrics as M
from sept_tpu.eval.sliding import make_sliding_vote_fn

__all__ = ["eval_mask", "train_mask", "evaluate_cloaked_test", "SweepRow", "sweep_to_rows"]


def eval_mask(scales: np.ndarray, suppression_ratio: int) -> Optional[np.ndarray]:
    """Evaluation-direction suppression mask
    (adversary_cloak_evaluation.py:262-267): zero cells whose scale exceeds
    percentile(ratio)."""
    if suppression_ratio == 0:
        return None
    thresh = np.nanpercentile(scales, int(suppression_ratio))
    return np.where(scales > thresh, 0.0, 1.0).astype(np.float32)


def train_mask(scales: np.ndarray, suppression_ratio: int) -> Optional[np.ndarray]:
    """Training-direction suppression mask (training_cloak.py:364-371):
    zero the top-ratio% noisiest cells (threshold = percentile(100 - ratio))."""
    if suppression_ratio == 0:
        return None
    thresh = np.nanpercentile(scales, 100 - int(suppression_ratio))
    return np.where(scales > thresh, 0.0, 1.0).astype(np.float32)


def evaluate_cloaked_test(
    noise_apply: Callable,
    emotion_logits_fn: Callable,
    adversary_logits_fn: Callable,
    test: SplitArrays,
    mask: Optional[np.ndarray],
    win_len: int = 200,
    shift_len: int = 50,
    batch_size: int = 16,
    noise_seed: int = 8,
    mesh=None,
    use_global: bool = False,
) -> tuple[dict, dict]:
    """Run the cloak -> frozen-models evaluation protocol on one test split.

    ``noise_apply(spec_windows (N, T, D, 1), mask, rng) -> noised windows``;
    the logits fns map (N, win_len, D, 1) windows to logits.  Returns
    (baseline_result, adversary_result) dicts with acc/uar/conf.

    ``use_global``: feed each utterance's 88-dim global vector to BOTH
    frozen models alongside its noised windows.  The reference's
    --global_feature eval path can't run at all — it builds global-width
    frozen models but then calls ``baseline_model(noisy)`` with no global
    argument (adversary_cloak_evaluation.py:83-84 vs :216-236), a latent
    crash like quirk 9.  Passing the globals is the only semantics
    consistent with how those models were trained.

    ``mesh``: optional 1-D data mesh — test utterances are sharded on the
    batch axis and the vote runs SPMD (the program is a pure map, so XLA
    partitions the forward and replicates the closed-over frozen weights;
    no collectives are needed).  Numerics are unchanged vs single-device
    for ANY mesh size: batch boundaries stay at ``batch_size`` and only
    zero PAD rows are appended to reach a device multiple, so every real
    row sees the same program as single-device.  (The cloak noise itself
    is a single shared (win_len, n_feats) draw per call from a fixed key —
    CloakNoise broadcasts one sample over all windows — so it is
    independent of batching either way.)
    """
    rng = jax.random.PRNGKey(noise_seed)
    pad_to = batch_size
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        pad_to = -(-batch_size // n_dev) * n_dev

    # ONE pass: noise each window once, feed BOTH frozen models, per-head
    # softmax inside the vote (reference computes noisy once and runs both,
    # adversary_cloak_evaluation.py:78-83)
    def joint_logits(params, stats, wins, g):
        noised = noise_apply(wins, mask, rng)
        return jnp.concatenate(
            [emotion_logits_fn(noised, g), adversary_logits_fn(noised, g)],
            axis=-1,
        )

    n_emo = 4
    vote = make_sliding_vote_fn(
        joint_logits, win_len, shift_len, head_sizes=(n_emo, 2)
    )

    emo_preds, adv_preds = [], []
    n = len(test)
    for lo in range(0, n, batch_size):
        hi = min(lo + batch_size, n)
        pad = pad_to - (hi - lo)
        specs = test.windows[lo:hi]
        lengths = test.lengths[lo:hi]
        g = test.global_data[lo:hi].astype(np.float32) if use_global else None
        if pad:
            specs = np.concatenate(
                [specs, np.zeros((pad,) + specs.shape[1:], specs.dtype)]
            )
            lengths = np.concatenate([lengths, np.full(pad, win_len, np.int32)])
            if g is not None:
                g = np.concatenate([g, np.zeros((pad, g.shape[1]), g.dtype)])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row = NamedSharding(mesh, P("data"))
            specs = jax.device_put(jnp.asarray(specs), row)
            lengths = jax.device_put(jnp.asarray(lengths), row)
            if g is not None:
                g = jax.device_put(jnp.asarray(g), row)
        p, _ = vote(None, None, specs, lengths, g)
        p = np.asarray(p)
        emo_preds.append(np.argmax(p[: hi - lo, :n_emo], -1))
        adv_preds.append(np.argmax(p[: hi - lo, n_emo:], -1))

    emo_preds = np.concatenate(emo_preds)
    adv_preds = np.concatenate(adv_preds)
    baseline = {
        "acc": M.accuracy(test.labels_emo, emo_preds),
        "rec": M.uar(test.labels_emo, emo_preds),
        "conf": M.confusion(test.labels_emo, emo_preds),
    }
    adversary = {
        "acc": M.accuracy(test.labels_gen, adv_preds),
        "rec": M.uar(test.labels_gen, adv_preds),
        "conf": M.confusion(test.labels_gen, adv_preds),
    }
    return baseline, adversary


@dataclasses.dataclass
class SweepRow:
    """One reference CSV row (adversary_cloak_evaluation.py:287-294)."""

    suppression_ratio: int
    dataset: str
    baseline_acc: float
    baseline_rec: float
    adv_acc: float
    adv_rec: float

    @property
    def index(self) -> str:
        return f"suppression_ratio_{self.suppression_ratio}_{self.dataset}"


def sweep_to_rows(
    per_fold: dict[int, list[tuple[dict, dict]]], dataset: str
) -> list[SweepRow]:
    """Aggregate {ratio: [(baseline, adversary) per fold]} into CSV rows."""
    rows = []
    for ratio, fold_results in per_fold.items():
        rows.append(
            SweepRow(
                suppression_ratio=ratio,
                dataset=dataset,
                baseline_acc=float(np.mean([b["acc"] for b, _ in fold_results])),
                baseline_rec=float(np.mean([b["rec"] for b, _ in fold_results])),
                adv_acc=float(np.mean([a["acc"] for _, a in fold_results])),
                adv_rec=float(np.mean([a["rec"] for _, a in fold_results])),
            )
        )
    return rows


def rows_to_csv(rows: Sequence[SweepRow], path: str) -> None:
    import csv

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "baseline_acc", "baseline_rec", "adv_acc", "adv_rec"])
        for r in rows:
            w.writerow([r.index, r.baseline_acc, r.baseline_rec, r.adv_acc, r.adv_rec])
