"""Export a framework artifact as a reference checkpoint (``model.pt``).

Inverse of ``cli.import_torch``: a trained artifact (baseline backbone or
cloak / cloak+GRL composite) becomes a torch state_dict that strict-loads
into the matching reference constructor (``two_d_cnn_lstm``-family /
``two_d_cnn_lstm_syn[_with_grl]``) and reproduces this framework's forward
— so results remain comparable in reference-side tooling after migrating.

    python -m sept_tpu.cli.export_torch --output_dir out \
        --artifact baseline_emotion --fold 1 --out model.pt

The wrapper kind is detected from the stored tree (bare backbone /
``noise``+``backbone`` / GRL with a gender branch); dead reference tensors
(dense2, att_mat*, the unused head, att_linear* for no-attention models)
are synthesized at reference init shapes so strict loading succeeds.
Round-trip parity is oracle-tested in tests/test_torch_oracle.py.
"""

from __future__ import annotations

import argparse
import sys


def _as_torch(sd):
    import torch

    out = {}
    for k, v in sd.items():
        t = torch.from_numpy(v.copy()) if getattr(v, "ndim", 0) else \
            torch.tensor(v.item() if hasattr(v, "item") else v)
        out[k] = t
    return out


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    p.add_argument("--output_dir", required=True,
                   help="framework artifact root")
    p.add_argument("--artifact", required=True)
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--out", required=True, help="model.pt path to write")
    p.add_argument("--rnn_cell", choices=("gru", "lstm"), default="gru")
    p.add_argument("--attention_size", type=int, default=256,
                   help="size of the synthesized dead att tensors when the "
                   "model was trained without attention (reference default)")
    args = p.parse_args(argv)

    from sept_tpu.cli.common import pin_cpu_platform

    pin_cpu_platform()  # no accelerator needed

    import numpy as np
    import torch

    from sept_tpu.compat import export_backbone, export_cloak_noise
    from sept_tpu.train.checkpoint import CheckpointManager

    got = CheckpointManager(args.output_dir).restore(args.artifact, args.fold)
    params = got["params"]
    stats = got.get("batch_stats", {})
    to_np = lambda tree: __import__("jax").tree.map(np.asarray, tree)  # noqa: E731

    kw = dict(rnn_cell=args.rnn_cell, attention_size=args.attention_size)
    if "noise" in params and "backbone" in params:
        kind = "cloak (two_d_cnn_lstm_syn)"
        sd = {f"intermed.{k}": v
              for k, v in export_cloak_noise(to_np(params["noise"])).items()}
        bb = export_backbone({"params": to_np(params["backbone"]),
                              "batch_stats": to_np(stats["backbone"])}, **kw)
        sd.update({f"original_model.{k}": v for k, v in bb.items()})
    elif "noise" in params and "emotion_backbone" in params:
        kind = "cloak+GRL (two_d_cnn_lstm_syn_with_grl)"
        sd = {f"intermed.{k}": v
              for k, v in export_cloak_noise(to_np(params["noise"])).items()}
        bb = export_backbone(
            {"params": to_np(params["emotion_backbone"]),
             "batch_stats": to_np(stats["emotion_backbone"])}, **kw)
        sd.update({f"original_model.{k}": v for k, v in bb.items()})
        gb = export_backbone(
            {"params": to_np(params["gender_backbone"]),
             "batch_stats": to_np(stats["gender_backbone"])}, **kw)
        for k, v in gb.items():
            # redo the Sequential(GradientReversal, conv) nesting
            gk = k.replace("conv.", "conv.1.") if k.startswith("conv.") else k
            sd[f"gender_model.{gk}"] = v
    else:
        kind = "backbone (two_d_cnn_lstm family)"
        sd = export_backbone({"params": to_np(params),
                              "batch_stats": to_np(stats)}, **kw)

    torch.save(_as_torch(sd), args.out)
    print(f"exported {kind} -> {args.out} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
