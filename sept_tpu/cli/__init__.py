"""Command-line entry points mirroring the reference scripts.

| reference script                          | CLI module                     |
|-------------------------------------------|--------------------------------|
| feature_extraction/audio_feature_extraction.py | sept_tpu.cli.featurize    |
| preprocess_data/adversary_data_preprocess.py + preprocess_adversary_data.py | sept_tpu.cli.preprocess |
| training/training_adversary_baselines.py  | sept_tpu.cli.train_baseline    |
| training/training_cloak.py                | sept_tpu.cli.train_cloak       |
| training/training_cloak_with_grl.py       | sept_tpu.cli.train_cloak --grl 1 |
| training/adversary_cloak_evaluation.py    | sept_tpu.cli.evaluate          |
| feature_extraction.sh + training_data_preprocess.sh | sept_tpu.cli.run_all |
| (no reference counterpart: HTTP serving) | sept_tpu.cli.serve         |
| (no reference counterpart: batch WAV inference) | sept_tpu.cli.predict |
| model.pt checkpoints (both directions)   | sept_tpu.cli.import_torch / export_torch |
"""
