"""Deterministic data layer: manifests, splits, windowing, norm, batching."""

from sept_tpu.data.augment import balance_classes
from sept_tpu.data.combine import combine_folds, combine_splits
from sept_tpu.data.corpora import (
    EMO_LABELS,
    GENDER_LABELS,
    Utterance,
    parse_crema_d_filename,
    parse_iemocap_evaluation,
    parse_msp_improv_filename,
)
from sept_tpu.data.featurize import featurize_corpus
from sept_tpu.data.normalize import SpeakerStats, accumulate_stats, apply_norm
from sept_tpu.data.pipeline import (
    FoldData,
    SplitArrays,
    assemble_fold,
    batch_iterator,
)
from sept_tpu.data.splits import SPEAKER_UNIVERSE, FoldPlan, plan_folds, speaker_ids_for
from sept_tpu.data.synthetic import SyntheticCorpus, make_corpus, make_hard_corpus
from sept_tpu.data.windowing import num_windows, pad_to, window_utterance

__all__ = [
    "EMO_LABELS",
    "GENDER_LABELS",
    "SPEAKER_UNIVERSE",
    "FoldData",
    "FoldPlan",
    "SpeakerStats",
    "SplitArrays",
    "SyntheticCorpus",
    "Utterance",
    "accumulate_stats",
    "apply_norm",
    "assemble_fold",
    "balance_classes",
    "combine_folds",
    "combine_splits",
    "batch_iterator",
    "featurize_corpus",
    "make_corpus",
    "make_hard_corpus",
    "num_windows",
    "pad_to",
    "parse_crema_d_filename",
    "parse_iemocap_evaluation",
    "parse_msp_improv_filename",
    "plan_folds",
    "speaker_ids_for",
    "window_utterance",
]
