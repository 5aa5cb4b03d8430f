"""Interoperability with reference-framework artifacts.

``torch_import`` maps trained reference checkpoints (``model.pt``
state_dicts of ``two_d_cnn_lstm``-family models,
/root/reference/training/training_adversary_baselines.py:504 and the
cloak wrappers, training_cloak.py:461) onto this framework's Flax
parameter trees, so a reference user's existing trained models evaluate
and serve here without retraining — the model-side counterpart of the
openSMILE feature import (data/opensmile_import.py).
"""

from sept_tpu.compat.torch_import import (
    export_backbone,
    export_cloak_noise,
    import_backbone,
    import_cloak_noise,
    load_torch_checkpoint,
    split_reference_state_dict,
)

__all__ = [
    "export_backbone",
    "export_cloak_noise",
    "import_backbone",
    "import_cloak_noise",
    "load_torch_checkpoint",
    "split_reference_state_dict",
]
