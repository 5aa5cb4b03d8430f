"""Head-to-head privacy-curve parity: the reference's OWN cloak training
(actual torch modules from /root/reference/model) vs this framework's
reference-faithful trainer — same corpus, same folds, same frozen
baselines, same evaluation sweep.  (VERDICT round-3 items 1 & 7.)

Until this run, the framework's "reference-faithful" privacy curve was a
claim about the trainer's CONSTRUCTION; this measures the reference's own
behavior on the same data so the two can be overlaid.

Protocol per arm (x 5 folds x suppression ratios {0,20,40,60,80}):

- shared: framework-trained SER baseline + gender adversary per fold
  (cli.train_baseline), exported to reference ``model.pt`` checkpoints
  (cli.export_torch, strict-loads into the reference constructors,
  oracle-tested in tests/test_torch_oracle.py) so every arm cloaks the
  IDENTICAL frozen backbone;
- ``torch_cloak``: reference ``cloak_noise`` + ``two_d_cnn_lstm_syn``
  (/root/reference/model/cloak_models.py:24-130) trained with the
  reference's loop semantics — SGD lr 1e-3 momentum 0.9 wd 1e-4 over
  requires_grad params (training_cloak.py:377-378), StepLR(10, 0.5)
  stepped after BOTH the train and validate passes (:181 at :394-395,
  quirk 14 -> effective halving every 5 epochs), combine-branch loss =
  speaker-weighted per-sample CE mean - scale_lamda*log(mean sigma) at
  suppression 0 only (:139-147), best-by-val-acc strict > after epoch 10
  (:418-421), early stop patience 10 accruing after epoch 10 (:373,:428),
  suppression>0 reloads the suppression-0 cloak, freezes rhos, and applies
  the TRAIN-direction percentile(100-r) mask (:364-371);
- ``torch_grl``: reference ``two_d_cnn_lstm_syn_with_grl``
  (cloak_models.py:133-226) with a FRESH gender model whose conv is
  wrapped in ``GradientReversal(grl_lambda)``; loss adds
  gender_lambda * weighted gender CE; the scheduler steps only on the
  validate pass (training_cloak_with_grl.py:185-191);
- ``fw_cloak`` / ``fw_grl``: cli.train_cloak with IDENTICAL
  hyperparameters (--optimizer sgd --learning_rate 1e-3 --antithetic 0
  --saliency_align 0 --mask_direction train), i.e. the framework's
  reference-faithful mode, no extensions.

Every arm's cloaks are evaluated by ONE shared sweep (cli.evaluate =
adversary_cloak_evaluation.py:113-299 semantics: eval-direction
percentile(ratio) masks — quirk 8 honored — max_scale 5, sliding
softmax-mean vote); torch-trained cloaks enter it through
cli.import_torch.  Per-fold sweep rows are kept so per-ratio deltas can
be judged against fold spread.

DOCUMENTED DEPARTURES from the reference code (it cannot run as written):
- quirk 2: ``training_cloak.py:125`` indexes ``sampled_batch[7]`` but
  ``speech_collate`` returns 6 fields -> IndexError on EVERY dataset.  The
  torch arms batch the arrays directly and carry speaker ids alongside
  (same values the 8-field collate would have produced).
- quirk 3-alike: the single-dataset loss branch has no sigma-regularizer
  and no weights; the paper's protocol is the combine branch, so the
  torch arms run the combine-branch loss with speaker weights from
  ``get_class_weight`` (uniform 1.0 on this balanced corpus).
- quirk 9: the reference GRL evaluation path crashes
  (``adversary_cloak_evaluation.py:243`` omits the required grl_lambda
  arg); both arms are therefore evaluated by the framework sweep, whose
  GRL semantics = the crash-fixed call (grl_lambda passed through).
- BN drift (bug 6) is EMULATED by default: the reference's "frozen"
  backbone still updates BatchNorm running stats in train mode
  (cloak_models.py:69-76 freezes parameters but its BN-module check never
  fires).  ``--bn_freeze 1`` runs the bug-fixed variant (backbone BN in
  eval mode, like the framework trainer) to localize any divergence.
- the per-epoch torch ``test()`` pass is skipped: the reference uses it
  only for reporting; model selection depends exclusively on the
  validate pass (training_cloak.py:418-421).

Artifacts: /tmp/privacy_parity/{work,results/{shared,torch,fw}} (resumable
— completed model.pt / imported artifacts / CSVs are skipped), committed
summary benchmarks/privacy_parity.json.
"""

import argparse
import copy
import csv
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATIOS = [0, 20, 40, 60, 80]
HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/model"

PRESETS = {
    # mirror privacy_demo presets so results relate across artifacts
    "half": dict(n_speakers=14, utts_per_speaker=8, win_len=100,
                 input_spec_size=64, hidden_size=16, batch_size=32,
                 baseline_epochs=15),
    "full": dict(n_speakers=20, utts_per_speaker=16, win_len=150,
                 input_spec_size=96, hidden_size=32, batch_size=32,
                 baseline_epochs=25),
}


def log(msg):
    print(f"[parity] {msg}", flush=True)


# --------------------------------------------------------------------------
# torch-side data plumbing
# --------------------------------------------------------------------------

def split_to_torch(split):
    """SplitArrays -> (features (N,1,T,D) f32, emo (N,), gen (N,), speaker
    keys list) as numpy; the torch arms batch these directly (quirk-2
    departure documented above)."""
    x = np.ascontiguousarray(split.windows[:, None, :, :], np.float32)
    emo = np.asarray(split.labels_emo, np.int64)
    gen = np.asarray(split.labels_gen, np.int64)
    spk = [f"{s}_{d}" for s, d in zip(split.speaker_ids, split.datasets)]
    return x, emo, gen, spk


def speaker_weights(split):
    """Reference combine-mode per-speaker weights (training_cloak.py:284-291):
    counts of training windows per speaker_id_dataset -> get_class_weight."""
    from sept_tpu.eval.metrics import get_class_weight

    counts = {}
    for s, d in zip(split.speaker_ids, split.datasets):
        counts[f"{s}_{d}"] = counts.get(f"{s}_{d}", 0) + 1
    return get_class_weight(counts)


def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import baseline_models
    import cloak_models
    return baseline_models, cloak_models


def build_backbone(pt_path, P, pred, torch):
    """Reference two_d_cnn_lstm strict-loaded from an exported checkpoint."""
    baseline_models, _ = ref_modules()
    m = baseline_models.two_d_cnn_lstm(
        input_channel=1, input_spec_size=P["input_spec_size"],
        cnn_filter_size=64, pred=pred,
        lstm_hidden_size=P["hidden_size"], num_layers_lstm=2,
        attention_size=128, att=None, global_feature=0,
    )
    if pt_path is not None:
        m.load_state_dict(torch.load(pt_path, map_location="cpu"))
    return m


# --------------------------------------------------------------------------
# the reference training loop (both torch arms)
# --------------------------------------------------------------------------

def torch_train_cloak(fold_dir, emo_pt, gender_pt, out_dir, P, *, grl,
                      num_epochs, scale_lamda, grl_lambda=0.1,
                      gender_lambda=0.1, bn_freeze=False, seed=8):
    """Train the reference cloak for every suppression ratio on one fold.

    Writes ``model.pt`` per ratio under out_dir/supp_<r>/ and returns
    (per-ratio timings, per-ratio sigma trajectories).  Resumable: ratios
    with an existing model.pt are skipped — but their recorded timing and
    log(mean sigma)-per-epoch trajectory are loaded back from the
    ``stats.json`` persisted at train time, so the committed artifact
    carries real measurements even when assembled across invocations.
    """
    import random

    import torch
    import torch.nn.functional as F

    from sept_tpu.data.store import load_fold

    _, cloak_models = ref_modules()

    fold = load_fold(fold_dir)
    x_tr, emo_tr, gen_tr, spk_tr = split_to_torch(fold.training)
    x_va, emo_va, gen_va, _ = split_to_torch(fold.validation)
    weights = speaker_weights(fold.training)
    w_tr = np.asarray([weights[s] for s in spk_tr], np.float32)

    batch = P["batch_size"]
    timings = {}
    sig_trajs = {}

    def make_model():
        # setup_seed(8) equivalent (training_tools.py:69-74) before model
        # construction so the fresh GRL gender branch is reproducible
        torch.manual_seed(seed)
        np.random.seed(seed)
        random.seed(seed)
        noise = cloak_models.cloak_noise(
            torch.zeros((1, P["win_len"], P["input_spec_size"])),
            torch.ones((1, P["win_len"], P["input_spec_size"])),
            torch.tensor(0.01), torch.tensor(10), "cpu",
        )
        emo_m = build_backbone(emo_pt, P, "emotion", torch)
        if grl:
            gender_m = build_backbone(None, P, "gender", torch)
            model = cloak_models.two_d_cnn_lstm_syn_with_grl(
                emo_m, gender_m, noise, float(grl_lambda))
        else:
            model = cloak_models.two_d_cnn_lstm_syn(emo_m, noise)
        return model

    def run_epoch(model, optimizer, x, emo, gen, w, mask, ratio, training):
        """One pass, reference combine-branch loss semantics."""
        if training:
            model.train()
            if bn_freeze:  # bug-6-fixed variant: frozen backbone BN stays
                for mod in model.original_model.modules():
                    if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                        mod.eval()
        else:
            model.eval()
        n = len(x)
        order = np.random.permutation(n) if training else np.arange(n)
        losses, preds_all, truth_all = [], [], []
        for lo in range(0, n, batch):
            idx = order[lo:lo + batch]
            xb = torch.from_numpy(x[idx])
            eb = torch.from_numpy(emo[idx])
            gb = torch.from_numpy(gen[idx])
            wb = torch.from_numpy(w[idx]) if training else torch.ones(len(idx))
            if grl:
                preds, preds_g, _ = model(xb, mask=mask, grl=False,
                                          pooling="mean")
            else:
                preds, _ = model(xb, mask=mask, pooling="mean")
            ce = F.cross_entropy(preds, eb, reduction="none")
            total = (ce * wb).mean()
            if grl:
                ce_g = F.cross_entropy(preds_g, gb, reduction="none")
                total = total + float(gender_lambda) * (ce_g * wb).mean()
            if training and ratio == 0:
                total = total - float(scale_lamda) * torch.log(
                    torch.mean(model.intermed.scales()))
            if training:
                optimizer.zero_grad()
                total.backward()
                optimizer.step()
            losses.append(float(total.detach()))
            preds_all.append(preds.detach().numpy().argmax(1))
            truth_all.append(emo[idx])
        acc = float(np.mean(np.concatenate(preds_all)
                            == np.concatenate(truth_all)))
        return float(np.mean(losses)), acc

    for ratio in RATIOS:
        rdir = os.path.join(out_dir, f"supp_{ratio}")
        pt = os.path.join(rdir, "model.pt")
        stats_path = os.path.join(rdir, "stats.json")
        if os.path.exists(pt):
            log(f"  supp {ratio}: exists, skip")
            if os.path.exists(stats_path):
                st = json.load(open(stats_path))
                timings[ratio] = st["timing_s"]
                sig_trajs[ratio] = st["sigma_log_mean_trajectory"]
            continue
        os.makedirs(rdir, exist_ok=True)
        model = make_model()
        mask = None
        if ratio != 0:
            r0 = os.path.join(out_dir, "supp_0", "model.pt")
            model.load_state_dict(torch.load(r0, map_location="cpu"))
            model.intermed.rhos.requires_grad = False
            scales = model.intermed.scales().detach().numpy()
            thr = np.nanpercentile(scales, 100 - ratio)
            mask = torch.where(
                model.intermed.scales() > thr,
                torch.zeros_like(model.intermed.rhos),
                torch.ones_like(model.intermed.rhos))
        optimizer = torch.optim.SGD(
            filter(lambda p: p.requires_grad, model.parameters()),
            lr=0.001, momentum=0.9, weight_decay=1e-4)
        scheduler = torch.optim.lr_scheduler.StepLR(
            optimizer, step_size=10, gamma=0.5)

        best_acc, best_state, best_epoch = 0.0, None, 0
        bad, prev_val = 0, None
        traj = []
        t0 = time.perf_counter()
        for epoch in range(num_epochs):
            np.random.seed(seed + epoch)  # per-epoch shuffle stream
            run_epoch(model, optimizer, x_tr, emo_tr, gen_tr, w_tr, mask,
                      ratio, True)
            traj.append(float(np.log(
                model.intermed.scales().detach().numpy().mean())))
            if not grl:
                scheduler.step()  # quirk 14: stepped after the train pass
            val_loss, val_acc = run_epoch(model, optimizer, x_va, emo_va,
                                          gen_va, np.ones(len(x_va),
                                                          np.float32),
                                          mask, ratio, False)
            scheduler.step()  # and after the validate pass (both trainers)
            if val_acc > best_acc and epoch > 10:
                best_acc, best_epoch = val_acc, epoch
                best_state = copy.deepcopy(model.state_dict())
            if epoch > 10:  # EarlyStopping(patience=10), accrues late
                if prev_val is not None and val_loss >= prev_val:
                    bad += 1
                else:
                    bad = 0
                prev_val = val_loss if prev_val is None else min(
                    prev_val, val_loss)
                if bad >= 10:
                    log(f"  supp {ratio}: early stop at {epoch}")
                    break
        dt = time.perf_counter() - t0
        if best_state is None:  # never eligible (tiny num_epochs smoke)
            best_state, best_epoch = copy.deepcopy(model.state_dict()), epoch
        torch.save(best_state, pt)
        timings[ratio] = dt
        sig_trajs[ratio] = traj
        with open(stats_path, "w") as f:
            json.dump({"timing_s": dt, "best_epoch": best_epoch,
                       "best_val_acc": best_acc,
                       "sigma_log_mean_trajectory": traj}, f)
        log(f"  supp {ratio}: {dt:.0f}s, best epoch {best_epoch} "
            f"val acc {best_acc:.3f}")
    return timings, sig_trajs


# --------------------------------------------------------------------------
# sweep plumbing
# --------------------------------------------------------------------------

def import_torch_arm(torch_dir, results_dir, P, fold_ids, *, grl,
                     scale_lamda):
    from sept_tpu.cli import import_torch

    tag = "cloak_grl" if grl else "cloak"
    for k in fold_ids:
        for ratio in RATIOS:
            art = f"{tag}_lamda{scale_lamda}_supp{ratio}"
            dst = os.path.join(results_dir, art, f"fold{k}")
            if os.path.exists(dst):
                continue
            pt = os.path.join(torch_dir, f"fold{k}",
                              "grl" if grl else "cloak", f"supp_{ratio}",
                              "model.pt")
            import_torch.main([
                "--checkpoint", pt, "--output_dir", results_dir,
                "--artifact", art, "--fold", str(k),
                "--win_len", str(P["win_len"]),
            ])


def run_sweep(base, results_dir, fold_ids, *, grl, scale_lamda):
    """cli.evaluate per fold (per-fold rows -> fold spread) + pooled mean."""
    from sept_tpu.cli import evaluate

    knobs = ["--grl", str(int(grl)), "--scale_lamda", str(scale_lamda),
             "--optimizer", "sgd", "--learning_rate", "1e-3",
             "--antithetic", "0", "--saliency_align", "0",
             "--mask_direction", "train",
             "--grl_lambda", "0.1", "--gender_lambda", "0.1"]
    csv_name = (f"grl-{scale_lamda}.csv" if grl
                else f"non-grl-{scale_lamda}.csv")
    per_fold = {}
    for k in fold_ids:
        out_csv = os.path.join(results_dir, f"sweep_fold{k}.csv")
        if not os.path.exists(out_csv):
            evaluate.main(base + ["--output_dir", results_dir] + knobs
                          + ["--folds", str(k), "--ratios"]
                          + [str(r) for r in RATIOS])
            shutil.copy(os.path.join(results_dir, csv_name), out_csv)
        with open(out_csv) as f:
            for row in csv.DictReader(f):
                ratio = int(row[""].split("_")[2])
                per_fold.setdefault(ratio, {})[k] = {
                    "emotion_acc": float(row["baseline_acc"]),
                    "emotion_uar": float(row["baseline_rec"]),
                    "adversary_acc": float(row["adv_acc"]),
                    "adversary_uar": float(row["adv_rec"]),
                }
    sweep = {}
    for ratio, folds in sorted(per_fold.items()):
        keys = ["emotion_acc", "emotion_uar", "adversary_acc",
                "adversary_uar"]
        sweep[f"ratio_{ratio}"] = {
            **{k: float(np.mean([v[k] for v in folds.values()]))
               for k in keys},
            **{f"{k}_std": float(np.std([v[k] for v in folds.values()]))
               for k in keys},
            "per_fold": {str(k): folds[k] for k in sorted(folds)},
        }
    return sweep


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=tuple(PRESETS), default="half")
    ap.add_argument("--folds", type=int, nargs="*", default=None)
    ap.add_argument("--arms", nargs="*", default=["torch_cloak", "fw_cloak",
                                                  "torch_grl", "fw_grl"])
    ap.add_argument("--num_epochs", type=int, default=30,
                    help="cloak epochs, reference default "
                    "(training_cloak.py:215)")
    ap.add_argument("--scale_lamda", type=float, default=1.0)
    ap.add_argument("--bn_freeze", type=int, default=0,
                    help="1: run the torch arms with backbone BN frozen "
                    "(bug-6-fixed variant) instead of the faithful "
                    "drifting-BN behavior")
    ap.add_argument("--root", default="/tmp/privacy_parity")
    ap.add_argument("--out_json", default=os.path.join(
        HERE, "privacy_parity.json"))
    args = ap.parse_args()

    P = PRESETS[args.preset]
    fold_ids = args.folds or [1, 2, 3, 4, 5]
    root = args.root + ("_bnfreeze" if args.bn_freeze else "")
    work = os.path.join(root, "work")
    shared = os.path.join(root, "results", "shared")
    os.makedirs(work, exist_ok=True)
    os.makedirs(shared, exist_ok=True)

    from sept_tpu.cli import export_torch, featurize, preprocess, \
        train_baseline

    base = ["--dataset", "synthetic_hard", "--work_dir", work,
            "--win_len", str(P["win_len"]),
            "--input_spec_size", str(P["input_spec_size"]),
            "--hidden_size", str(P["hidden_size"]),
            "--batch_size", str(P["batch_size"]), "--seed", "8"]
    if args.folds:
        base += ["--folds"] + [str(k) for k in fold_ids]

    log("featurize + preprocess")
    featurize.main(base + ["--n_speakers", str(P["n_speakers"]),
                           "--utts_per_speaker", str(P["utts_per_speaker"]),
                           "--functionals", "0"])
    preprocess.main(base)

    log("shared frozen baselines (framework-trained)")
    for pred, extra in (("emotion", []), ("gender", ["--adv", "1"])):
        train_baseline.main(base + ["--output_dir", shared, "--pred", pred,
                                    "--num_epochs", str(P["baseline_epochs"]),
                                    "--learning_rate", "2e-3", "--resume"]
                            + extra)

    torch_root = os.path.join(root, "torch")
    for k in fold_ids:
        for pred, art in (("emotion", "baseline_emotion"),
                          ("gender", "adv_baseline_gender")):
            pt = os.path.join(torch_root, f"fold{k}", f"{pred}.pt")
            if not os.path.exists(pt):
                os.makedirs(os.path.dirname(pt), exist_ok=True)
                export_torch.main(["--output_dir", shared, "--artifact", art,
                                   "--fold", str(k), "--out", pt,
                                   "--attention_size", "128"])

    fold_dir = os.path.join(work, "folds", "synthetic_hard")
    clean = {}
    for key, art in (("emotion", "baseline_emotion"),
                     ("adversary", "adv_baseline_gender")):
        for m in ("uar", "acc"):
            clean[f"{key}_{m}"] = float(np.mean([
                json.load(open(os.path.join(
                    shared, art, f"manifest_fold{k}.json")))[f"test_{m}"]
                for k in fold_ids]))
    log(f"clean: {clean}")

    arms_out = {}
    timings = {}
    sigma_trajectories = {}

    def arm_results_dir(name):
        d = os.path.join(root, "results", name)
        os.makedirs(d, exist_ok=True)
        for art in ("baseline_emotion", "adv_baseline_gender"):
            lnk = os.path.join(d, art)
            if not os.path.exists(lnk):
                os.symlink(os.path.join("..", "shared", art), lnk)
        return d

    for grl in (False, True):
        tag = "grl" if grl else "cloak"
        # --- torch arm ---
        arm = f"torch_{tag}"
        if arm in args.arms:
            log(f"=== {arm} ===")
            for k in fold_ids:
                log(f" fold {k}")
                t, trajs = torch_train_cloak(
                    os.path.join(fold_dir, f"fold{k}.npz"),
                    os.path.join(torch_root, f"fold{k}", "emotion.pt"),
                    os.path.join(torch_root, f"fold{k}", "gender.pt"),
                    os.path.join(torch_root, f"fold{k}", tag),
                    P, grl=grl, num_epochs=args.num_epochs,
                    scale_lamda=args.scale_lamda,
                    bn_freeze=bool(args.bn_freeze))
                timings.setdefault(arm, {})[f"fold{k}"] = t
                sigma_trajectories.setdefault(arm, {})[f"fold{k}"] = {
                    str(r): v for r, v in trajs.items()}
            rdir = arm_results_dir(arm)
            import_torch_arm(torch_root, rdir, P, fold_ids, grl=grl,
                             scale_lamda=args.scale_lamda)
            arms_out[arm] = run_sweep(base, rdir, fold_ids, grl=grl,
                                      scale_lamda=args.scale_lamda)
        # --- framework arm ---
        arm = f"fw_{tag}"
        if arm in args.arms:
            log(f"=== {arm} ===")
            from sept_tpu.cli import train_cloak

            rdir = arm_results_dir(arm)
            fw_args = base + [
                "--output_dir", rdir, "--optimizer", "sgd",
                "--learning_rate", "1e-3",
                "--scale_lamda", str(args.scale_lamda),
                "--num_epochs", str(args.num_epochs),
                "--antithetic", "0", "--saliency_align", "0",
                "--mask_direction", "train", "--resume",
                "--grl", str(int(grl)),
                "--grl_lambda", "0.1", "--gender_lambda", "0.1",
            ]
            for ratio in RATIOS:
                train_cloak.main(fw_args + ["--suppression_ratio",
                                            str(ratio)])
            arms_out[arm] = run_sweep(base, rdir, fold_ids, grl=grl,
                                      scale_lamda=args.scale_lamda)
            # per-epoch log(mean sigma) saved by cli.train_cloak in each
            # artifact manifest — the fw half of the dynamics overlay
            fw_tag = "cloak_grl" if grl else "cloak"
            for k in fold_ids:
                per_ratio = {}
                for ratio in RATIOS:
                    mpath = os.path.join(
                        rdir, f"{fw_tag}_lamda{args.scale_lamda}_supp{ratio}",
                        f"manifest_fold{k}.json")
                    if os.path.exists(mpath):
                        m = json.load(open(mpath))
                        tr = m.get("sigma_log_mean_trajectory")
                        if tr and any(v is not None for v in tr):
                            per_ratio[str(ratio)] = tr
                if per_ratio:
                    sigma_trajectories.setdefault(arm, {})[
                        f"fold{k}"] = per_ratio

    # per-ratio deltas (torch - framework), judged against fold spread
    comparison = {}
    for tag in ("cloak", "grl"):
        a, b = arms_out.get(f"torch_{tag}"), arms_out.get(f"fw_{tag}")
        if not (a and b):
            continue
        rows = {}
        for rk in a:
            if rk not in b:
                continue
            spread = max(a[rk]["emotion_uar_std"], b[rk]["emotion_uar_std"])
            spread_adv = max(a[rk]["adversary_uar_std"],
                             b[rk]["adversary_uar_std"])
            # PAIRED per-fold deltas (same fold, torch - fw): the sharper
            # statistic — fold-to-fold corpus variation cancels, so the
            # paired mean isolates the trainer difference where the
            # mean-vs-spread criterion alone would pass almost anything
            paired = {}
            for fk in a[rk].get("per_fold", {}):
                if fk not in b[rk].get("per_fold", {}):
                    continue
                pa, pb = a[rk]["per_fold"][fk], b[rk]["per_fold"][fk]
                paired[fk] = {
                    "emotion_uar": pa["emotion_uar"] - pb["emotion_uar"],
                    "adversary_uar": pa["adversary_uar"]
                    - pb["adversary_uar"],
                }
            pe = [v["emotion_uar"] for v in paired.values()]
            pv = [v["adversary_uar"] for v in paired.values()]
            rows[rk] = {
                "emotion_uar_delta": a[rk]["emotion_uar"]
                - b[rk]["emotion_uar"],
                "adversary_uar_delta": a[rk]["adversary_uar"]
                - b[rk]["adversary_uar"],
                "fold_spread_emotion": spread,
                "fold_spread_adversary": spread_adv,
                "paired_per_fold": paired,
                "paired_emotion_mean_abs": float(np.mean(np.abs(pe)))
                if pe else None,
                "paired_adversary_mean_abs": float(np.mean(np.abs(pv)))
                if pv else None,
                "within_spread": (
                    abs(a[rk]["emotion_uar"] - b[rk]["emotion_uar"])
                    <= max(spread, 1e-9) * 2
                    and abs(a[rk]["adversary_uar"] - b[rk]["adversary_uar"])
                    <= max(spread_adv, 1e-9) * 2),
            }
        comparison[tag] = rows

    result = {
        "protocol": {
            "preset": args.preset, "folds": fold_ids,
            "num_epochs": args.num_epochs, "scale_lamda": args.scale_lamda,
            "optimizer": "sgd lr 1e-3 momentum 0.9 wd 1e-4, StepLR(10,0.5) "
                         "x2/epoch (plain) / x1 (grl) — training_cloak.py"
                         ":377-379,394-395, training_cloak_with_grl.py"
                         ":416-418,185-191",
            "bn_drift_emulated": not bool(args.bn_freeze),
            "quirk_departures": "see module docstring: collate quirk 2, "
                                "combine-branch loss, GRL eval quirk 9, "
                                "per-epoch test() skipped",
            "shared_frozen_models": "framework-trained baselines exported "
                                    "via cli.export_torch per fold",
            "evaluation": "cli.evaluate (reference sweep semantics) for "
                          "ALL arms; torch cloaks imported via "
                          "cli.import_torch",
        },
        "corpus": f"synthetic_hard {P['n_speakers']}x{P['utts_per_speaker']}",
        "clean": clean,
        "arms": arms_out,
        "comparison": comparison,
        "torch_timings_s": timings,
        "sigma_log_mean_trajectories": sigma_trajectories,
    }
    with open(args.out_json, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {args.out_json}")
    print(json.dumps({k: v for k, v in result.items()
                      if k in ("clean", "comparison")}, indent=2))


if __name__ == "__main__":
    main()
