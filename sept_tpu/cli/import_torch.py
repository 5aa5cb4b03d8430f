"""Import a trained reference checkpoint (``model.pt``) as a framework artifact.

The reference's training outputs are torch state_dicts
(training_adversary_baselines.py:504, training_cloak.py:461).  This entry
point converts one into our Orbax artifact layout so the rest of the
framework (evaluation sweep, serving, cloak training ``--resume``)
consumes it directly — a migrating user keeps their trained models.

Typical migration (artifact names must match what the consumers resolve,
cli/train_baseline.py::artifact_name and cli/train_cloak.py::cloak_artifact):

    # the SER baseline and the gender adversary for fold 1
    python -m sept_tpu.cli.import_torch --checkpoint .../emotion/model.pt \
        --output_dir out --artifact baseline_emotion --fold 1 --pred emotion
    python -m sept_tpu.cli.import_torch --checkpoint .../gender/model.pt \
        --output_dir out --artifact adv_baseline_gender --fold 1 --pred gender
    # a trained cloak (wrapper state_dict; noise + frozen backbone [+ GRL
    # gender branch] are detected and mapped automatically)
    python -m sept_tpu.cli.import_torch --checkpoint .../cloak/model.pt \
        --output_dir out --artifact cloak_grl_lamda1.0_supp0 --fold 1

    # then e.g. the utility/privacy sweep over the imported artifacts:
    python -m sept_tpu.cli.evaluate --dataset iemocap --grl 1 ...

Forward parity of the mapping is oracle-tested against the reference
modules themselves (tests/test_torch_oracle.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--checkpoint", required=True,
                   help="path to a reference model.pt state_dict")
    p.add_argument("--output_dir", required=True,
                   help="framework artifact root (the consumers' --output_dir)")
    p.add_argument("--artifact", required=True,
                   help="artifact name to write (e.g. baseline_emotion, "
                   "adv_baseline_gender, cloak_grl_lamda1.0_supp0)")
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--pred", choices=("emotion", "gender", "multitask"),
                   default="emotion",
                   help="head(s) the model was trained with (bare backbones; "
                   "cloak wrappers always map emotion [+ gender branch])")
    p.add_argument("--att", choices=("none", "self_att"), default="none")
    p.add_argument("--rnn_cell", choices=("gru", "lstm"), default="gru",
                   help="lstm for the deep_two_d_cnn_lstm_tmp variant")
    p.add_argument("--win_len", type=int, default=200,
                   help="window length the model was trained on (recorded "
                   "in the manifest for predict/serve; cloak imports infer "
                   "it from the noise tensors instead)")
    args = p.parse_args(argv)

    import json

    import numpy as np

    from sept_tpu.cli.common import pin_cpu_platform

    pin_cpu_platform()  # this import needs no accelerator

    from sept_tpu.compat import (
        import_backbone,
        import_cloak_noise,
        load_torch_checkpoint,
        split_reference_state_dict,
    )
    from sept_tpu.train.checkpoint import CheckpointManager

    att = None if args.att == "none" else args.att
    sd = load_torch_checkpoint(args.checkpoint)
    backbone_sd, cloak_sd, gender_sd = split_reference_state_dict(sd)

    bb = import_backbone(backbone_sd, pred=args.pred, att=att,
                         rnn_cell=args.rnn_cell)
    if cloak_sd is None:
        kind = "backbone"
        params, stats = bb["params"], bb["batch_stats"]
    elif gender_sd is None:
        kind = "cloak"
        params = {"noise": import_cloak_noise(cloak_sd),
                  "backbone": bb["params"]}
        stats = {"backbone": bb["batch_stats"]}
    else:
        kind = "cloak_grl"
        gb = import_backbone(gender_sd, pred="gender", att=att,
                             rnn_cell=args.rnn_cell)
        params = {"noise": import_cloak_noise(cloak_sd),
                  "emotion_backbone": bb["params"],
                  "gender_backbone": gb["params"]}
        stats = {"emotion_backbone": bb["batch_stats"],
                 "gender_backbone": gb["batch_stats"]}

    # architecture knobs, inferred from the tensors themselves, stored under
    # "config" — the key predict/serve read (serve.py::load_predictor), so
    # imported artifacts build the RIGHT model without flag re-entry
    hidden = int(backbone_sd["rnn.weight_hh_l0"].shape[1])
    feature_len = int(backbone_sd["rnn.weight_ih_l0"].shape[1]) * 8 // 128
    deep = "conv.15.weight" in backbone_sd
    model_type = "deep-2d-cnn-lstm" if deep else "2d-cnn-lstm"
    dense1_in = int(backbone_sd["dense1.weight"].shape[1])
    win_len = args.win_len
    if cloak_sd is not None:
        win_len = int(np.asarray(cloak_sd["locs"]).shape[-2])
    # reference dense1 in-features: pooled width (2H mean-pooled, or
    # 2H * win_len//8 flattened for the deep model — 25 at the standard
    # win_len 200, but a function of the TRAINED window length, not a
    # constant) + 88 iff built with global_feature=1
    pooled = 2 * hidden * (win_len // 8 if deep else 1)
    config = {
        "model_type": model_type,
        "pred": args.pred if cloak_sd is None else "emotion",
        "hidden_size": hidden,
        "feature_len": feature_len,
        "win_len": win_len,
        "att": att,
        "attention_size": (int(backbone_sd["att_linear1.weight"].shape[0])
                           if att else 128),
        "rnn_cell": args.rnn_cell,
        "global_feature": dense1_in == pooled + 88,
    }

    ckpt = CheckpointManager(args.output_dir)
    path = ckpt.save(args.artifact, args.fold, params, stats, manifest={
        "imported_from": args.checkpoint,
        "source_format": f"reference torch state_dict ({kind})",
        "config": config,
    })
    print(f"imported {kind} -> {path} "
          f"(config: {json.dumps(config)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
