"""Import trained reference (PyTorch) checkpoints into Flax param trees.

The reference saves ``model.state_dict()`` as ``model.pt`` for every
artifact (baselines: training_adversary_baselines.py:460,504; cloaks —
the full ``two_d_cnn_lstm_syn[_with_grl]`` wrapper: training_cloak.py:412,
461).  This module maps those tensors onto the parameter trees of our
equivalent modules (models/backbone.py, models/cloak.py), so a migrating
user's trained models drop into our evaluation sweep, serving, and cloak
training without retraining.

Layout mapping (reference -> ours):

- ``conv.{0,5,10,15}.weight``  Conv2d (out,in,5,5), NCHW  ->
  ``conv{0..3}/kernel`` (5,5,in,out), NHWC (transpose 2,3,1,0).
- ``conv.{1,6,11,16}.*`` BatchNorm2d weight/bias/running_mean/running_var
  -> ``bn{0..3}`` scale/bias (params) + mean/var (batch_stats).
  ``num_batches_tracked`` has no equivalent and is dropped.
- ``rnn.weight_ih_l{L}[_reverse]`` (3H, in) etc.  torch nn.GRU stacks
  gates **r, z, n** row-wise; Flax ``GRUCell`` keeps them as separate
  Dense modules ``ir/iz/in`` (input, with bias) and ``hr/hz/hn`` (hidden,
  bias only on ``hn``).  Both implement the same recurrence
  (n = tanh(W_in x + b_in + r*(W_hn h + b_hn))), so the mapping is exact:
  torch's redundant r/z bias pair collapses into ``ir.bias = b_ih[r] +
  b_hh[r]`` (and likewise z), while ``in.bias = b_ih[n]`` and
  ``hn.bias = b_hh[n]`` stay separate.
- ``rnn.weight_*`` for ``nn.LSTM`` (deep_two_d_cnn_lstm_tmp): torch gate
  order **i, f, g, o**; Flax ``OptimizedLSTMCell`` Dense modules
  ``ii/if/ig/io`` (no bias) and ``hi/hf/hg/ho`` (bias) — torch's bias
  pairs sum into the ``h*`` biases.
- ``dense1/pred_emotion_layer/pred_gender_layer.weight`` Linear (out,in)
  -> ``heads/dense1|pred_emotion|pred_gender/kernel`` (in,out).
  ``dense2`` exists in every reference state_dict but is **dead code**
  (never called in forward, baseline_models.py:251-258) and is dropped;
  ``att_mat1/att_mat2`` likewise (random buffers, unused :201-204).
- ``att_linear{1,2}.weight`` (self_att models) ->
  ``att_pool/att_linear{1,2}/kernel`` (transposed, no bias :197-199).
- cloak wrappers: ``intermed.locs/rhos`` -> CloakNoise ``locs/rhos``;
  the frozen backbone under ``original_model.`` and the GRL gender branch
  under ``gender_model.`` (its conv doubly nested by the
  ``Sequential(GradientReversal, conv)`` wrap, cloak_models.py:152:
  ``gender_model.conv.1.<i>`` -> ``conv.<i>``) are split out by
  :func:`split_reference_state_dict` and imported as backbones.

Numerical notes: BatchNorm eps is 1e-5 on both sides; running stats are
copied verbatim (torch's unbiased-vs-biased update rule only affects how
stats were *accumulated*, not how eval normalization consumes them).
Forward parity of imported models is oracle-tested against the actual
reference modules in tests/test_torch_oracle.py.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "split_reference_state_dict",
    "import_backbone",
    "import_cloak_noise",
    "export_backbone",
    "export_cloak_noise",
]

# reference nn.Sequential indices of Conv2d / BatchNorm2d per block
# (baseline_models.py:172-189 three-block; :292-315 four-block deep)
_CONV_IDX = {0: 0, 1: 5, 2: 10, 3: 15}
_BN_IDX = {0: 1, 1: 6, 2: 11, 3: 16}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """``torch.load`` a ``model.pt`` state_dict to a numpy dict (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def split_reference_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], Optional[Dict[str, np.ndarray]],
           Optional[Dict[str, np.ndarray]]]:
    """Split a reference state_dict into (backbone, cloak, gender) parts.

    Accepts a bare ``two_d_cnn_lstm``-family dict, a ``two_d_cnn_lstm_syn``
    wrapper (``intermed.* + original_model.*``), or the GRL wrapper (adds
    ``gender_model.*``).  A ``module.`` DataParallel prefix is stripped
    first.  Returns numpy dicts keyed in bare-model terms; cloak/gender are
    None when absent.
    """
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}
    cloak = {k.split(".", 1)[1]: v for k, v in sd.items()
             if k.startswith("intermed.")} or None
    gender = None
    g = {k.split(".", 1)[1]: v for k, v in sd.items()
         if k.startswith("gender_model.")}
    if g:
        # undo the Sequential(GradientReversal, conv) nesting: GRL (index 0)
        # has no params; the original conv stack sits at index 1
        gender = {re.sub(r"^conv\.1\.", "conv.", k): v for k, v in g.items()}
    backbone = {k.split(".", 1)[1]: v for k, v in sd.items()
                if k.startswith("original_model.")}
    if not backbone:
        backbone = {k: v for k, v in sd.items()
                    if not k.startswith(("intermed.", "gender_model."))}
    return backbone, cloak, gender


def _gru_layer(sd, layer: int, suffix: str) -> Dict[str, Any]:
    """One direction of one torch nn.GRU layer -> Flax GRUCell params."""
    w_ih = sd[f"rnn.weight_ih_l{layer}{suffix}"]  # (3H, in) rows r,z,n
    w_hh = sd[f"rnn.weight_hh_l{layer}{suffix}"]  # (3H, H)
    b_ih = sd[f"rnn.bias_ih_l{layer}{suffix}"]
    b_hh = sd[f"rnn.bias_hh_l{layer}{suffix}"]
    h = w_hh.shape[1]
    r, z, n = slice(0, h), slice(h, 2 * h), slice(2 * h, 3 * h)
    return {
        "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
        "iz": {"kernel": w_ih[z].T, "bias": b_ih[z] + b_hh[z]},
        "in": {"kernel": w_ih[n].T, "bias": b_ih[n]},
        "hr": {"kernel": w_hh[r].T},
        "hz": {"kernel": w_hh[z].T},
        "hn": {"kernel": w_hh[n].T, "bias": b_hh[n]},
    }


def _lstm_layer(sd, layer: int, suffix: str) -> Dict[str, Any]:
    """One direction of one torch nn.LSTM layer -> Flax OptimizedLSTMCell."""
    w_ih = sd[f"rnn.weight_ih_l{layer}{suffix}"]  # (4H, in) rows i,f,g,o
    w_hh = sd[f"rnn.weight_hh_l{layer}{suffix}"]
    b_ih = sd[f"rnn.bias_ih_l{layer}{suffix}"]
    b_hh = sd[f"rnn.bias_hh_l{layer}{suffix}"]
    h = w_hh.shape[1]
    gates = {"i": slice(0, h), "f": slice(h, 2 * h),
             "g": slice(2 * h, 3 * h), "o": slice(3 * h, 4 * h)}
    out: Dict[str, Any] = {}
    for g, sl in gates.items():
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b_ih[sl] + b_hh[sl]}
    return out


def import_backbone(
    sd: Dict[str, np.ndarray],
    *,
    pred: str = "emotion",
    att: Optional[str] = None,
    rnn_cell: str = "gru",
) -> Dict[str, Any]:
    """Reference backbone state_dict -> ``{"params", "batch_stats"}``.

    The architecture is inferred from the tensors themselves: a 4th conv
    block (``conv.15.weight``) selects the deep variant's tree, the RNN
    depth from the highest ``_l{L}`` index, hidden size from
    ``rnn.weight_hh_l0``.  ``pred`` selects which head(s) to emit
    (our modules declare only the heads they use; reference dicts always
    carry both).
    """
    deep = "conv.15.weight" in sd
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for b in range(4 if deep else 3):
        cw = sd[f"conv.{_CONV_IDX[b]}.weight"]
        params[f"conv{b}"] = {
            "kernel": np.transpose(cw, (2, 3, 1, 0)),
            "bias": sd[f"conv.{_CONV_IDX[b]}.bias"],
        }
        i = _BN_IDX[b]
        params[f"bn{b}"] = {"scale": sd[f"conv.{i}.weight"],
                            "bias": sd[f"conv.{i}.bias"]}
        stats[f"bn{b}"] = {"mean": sd[f"conv.{i}.running_mean"],
                           "var": sd[f"conv.{i}.running_var"]}

    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"rnn\.weight_ih_l(\d+)", k))
    )
    # StackedBiRNN (models/backbone.py) auto-names its cells flat under the
    # "rnn" scope in construction order — forward then backward per layer:
    # <Cell>_{2L} / <Cell>_{2L+1}
    per_dir = _gru_layer if rnn_cell == "gru" else _lstm_layer
    cell_name = "GRUCell" if rnn_cell == "gru" else "OptimizedLSTMCell"
    rnn: Dict[str, Any] = {}
    for layer in range(n_layers):
        rnn[f"{cell_name}_{2 * layer}"] = per_dir(sd, layer, "")
        rnn[f"{cell_name}_{2 * layer + 1}"] = per_dir(sd, layer, "_reverse")
    params["rnn"] = rnn

    if att == "self_att":
        params["att_pool"] = {
            "att_linear1": {"kernel": sd["att_linear1.weight"].T},
            "att_linear2": {"kernel": sd["att_linear2.weight"].T},
        }

    def dense(name):
        return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}

    heads = {"dense1": dense("dense1")}
    if pred in ("emotion", "multitask"):
        heads["pred_emotion"] = dense("pred_emotion_layer")
    if pred in ("gender", "multitask"):
        heads["pred_gender"] = dense("pred_gender_layer")
    params["heads"] = heads

    as_f32 = lambda t: np.asarray(t, dtype=np.float32)  # noqa: E731
    return {
        "params": _map_leaves(as_f32, params),
        "batch_stats": _map_leaves(as_f32, stats),
    }


def import_cloak_noise(cloak_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """``intermed.{locs,rhos}`` (or bare cloak_noise) -> CloakNoise params.

    The reference declares (1, win_len, n_feats) for broadcasting over the
    batch (cloak_models.py:29-33); our CloakNoise declares (win_len,
    n_feats) and broadcasts implicitly, so the leading 1 is squeezed.
    """

    def squeeze(t):
        t = np.asarray(t, np.float32)
        return t[0] if t.ndim == 3 and t.shape[0] == 1 else t

    return {"locs": squeeze(cloak_sd["locs"]),
            "rhos": squeeze(cloak_sd["rhos"])}


def _map_leaves(fn, tree):
    if isinstance(tree, dict):
        return {k: _map_leaves(fn, v) for k, v in tree.items()}
    return fn(tree)


# ---------------------------------------------------------------------------
# Export: framework artifact -> reference state_dict
# ---------------------------------------------------------------------------

def _gru_layer_out(cell: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax GRUCell params -> one direction of a torch nn.GRU layer.

    Inverse of :func:`_gru_layer`.  The combined r/z bias goes wholly into
    ``bias_ih`` (with zero ``bias_hh``) — torch only ever uses their sum
    for r and z, so the split is free; the n-gate biases are separable and
    round-trip exactly."""
    k = lambda n: np.asarray(cell[n]["kernel"]).T  # noqa: E731
    h = k("hr").shape[0]
    return {
        "weight_ih": np.concatenate([k("ir"), k("iz"), k("in")], axis=0),
        "weight_hh": np.concatenate([k("hr"), k("hz"), k("hn")], axis=0),
        "bias_ih": np.concatenate([
            np.asarray(cell["ir"]["bias"]), np.asarray(cell["iz"]["bias"]),
            np.asarray(cell["in"]["bias"])]),
        "bias_hh": np.concatenate([
            np.zeros(h, np.float32), np.zeros(h, np.float32),
            np.asarray(cell["hn"]["bias"])]),
    }


def _lstm_layer_out(cell: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax OptimizedLSTMCell params -> torch nn.LSTM direction (i,f,g,o)."""
    k = lambda n: np.asarray(cell[n]["kernel"]).T  # noqa: E731
    h = k("hi").shape[0]
    return {
        "weight_ih": np.concatenate([k("ii"), k("if"), k("ig"), k("io")], 0),
        "weight_hh": np.concatenate([k("hi"), k("hf"), k("hg"), k("ho")], 0),
        "bias_ih": np.zeros(4 * h, np.float32),
        "bias_hh": np.concatenate([
            np.asarray(cell[f"h{g}"]["bias"]) for g in "ifgo"]),
    }


def export_backbone(
    variables: Dict[str, Any],
    *,
    rnn_cell: str = "gru",
    attention_size: int = 256,
) -> Dict[str, np.ndarray]:
    """Framework ``{"params", "batch_stats"}`` -> reference state_dict.

    Inverse of :func:`import_backbone`: the result strict-loads into the
    matching reference constructor (``two_d_cnn_lstm`` /
    ``deep_two_d_cnn_lstm[_tmp]``) and reproduces our forward.  Reference
    models declare several DEAD tensors our modules never had (``dense2``,
    ``att_mat1/att_mat2``, the unused prediction head, and ``att_linear*``
    when trained without attention); those are synthesized at their
    reference init shapes (``attention_size`` sizes them, reference default
    256) so strict ``load_state_dict`` accepts the export.
    """
    p, s = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}
    n_blocks = sum(1 for k in p if re.fullmatch(r"conv\d", k))
    for b in range(n_blocks):
        sd[f"conv.{_CONV_IDX[b]}.weight"] = np.transpose(
            np.asarray(p[f"conv{b}"]["kernel"]), (3, 2, 0, 1))
        sd[f"conv.{_CONV_IDX[b]}.bias"] = np.asarray(p[f"conv{b}"]["bias"])
        i = _BN_IDX[b]
        sd[f"conv.{i}.weight"] = np.asarray(p[f"bn{b}"]["scale"])
        sd[f"conv.{i}.bias"] = np.asarray(p[f"bn{b}"]["bias"])
        sd[f"conv.{i}.running_mean"] = np.asarray(s[f"bn{b}"]["mean"])
        sd[f"conv.{i}.running_var"] = np.asarray(s[f"bn{b}"]["var"])
        sd[f"conv.{i}.num_batches_tracked"] = np.asarray(0, np.int64)

    per_dir = _gru_layer_out if rnn_cell == "gru" else _lstm_layer_out
    cells = p["rnn"]
    order = sorted(cells, key=lambda k: int(k.rsplit("_", 1)[1]))
    for layer in range(len(order) // 2):
        for j, suf in ((0, ""), (1, "_reverse")):
            d = per_dir(cells[order[2 * layer + j]])
            for name, v in d.items():
                sd[f"rnn.{name}_l{layer}{suf}"] = v

    heads = p["heads"]
    hidden2 = np.asarray(cells[order[0]]["hr" if rnn_cell == "gru"
                                         else "hi"]["kernel"]).shape[0] * 2

    def put_dense(ref_name, ours):
        if ours is not None:
            sd[f"{ref_name}.weight"] = np.asarray(ours["kernel"]).T
            sd[f"{ref_name}.bias"] = np.asarray(ours["bias"])

    put_dense("dense1", heads["dense1"])
    put_dense("pred_emotion_layer", heads.get("pred_emotion"))
    put_dense("pred_gender_layer", heads.get("pred_gender"))
    # dead reference tensors (never touched by forward) at init shapes
    if "pred_emotion_layer.weight" not in sd:
        sd["pred_emotion_layer.weight"] = np.zeros((4, 128), np.float32)
        sd["pred_emotion_layer.bias"] = np.zeros(4, np.float32)
    if "pred_gender_layer.weight" not in sd:
        sd["pred_gender_layer.weight"] = np.zeros((2, 128), np.float32)
        sd["pred_gender_layer.bias"] = np.zeros(2, np.float32)
    sd["dense2.weight"] = np.zeros((64, 128), np.float32)
    sd["dense2.bias"] = np.zeros(64, np.float32)
    if "att_pool" in p:
        a1 = np.asarray(p["att_pool"]["att_linear1"]["kernel"]).T
        a2 = np.asarray(p["att_pool"]["att_linear2"]["kernel"]).T
        attention_size = a1.shape[0]
    else:
        a1 = np.zeros((attention_size, hidden2), np.float32)
        a2 = np.zeros((16, attention_size), np.float32)
    sd["att_linear1.weight"] = a1
    sd["att_linear2.weight"] = a2
    sd["att_mat1"] = np.zeros((attention_size, hidden2), np.float32)
    sd["att_mat2"] = np.zeros((16, attention_size), np.float32)
    return _map_leaves(lambda t: np.asarray(t), sd)


def export_cloak_noise(noise_params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """CloakNoise params -> reference ``cloak_noise`` tensors (adds the
    reference's broadcast batch dim back, cloak_models.py:29-33)."""
    return {"locs": np.asarray(noise_params["locs"], np.float32)[None],
            "rhos": np.asarray(noise_params["rhos"], np.float32)[None]}
