"""Data layer tests: splits, windowing, normalization, augmentation, parsers,
fold assembly on a synthetic corpus.

Reference semantics: /root/reference/preprocess_data/.
"""

import numpy as np
import pytest

from sept_tpu.data import (
    FoldPlan,
    assemble_fold,
    balance_classes,
    make_corpus,
    num_windows,
    parse_crema_d_filename,
    parse_iemocap_evaluation,
    parse_msp_improv_filename,
    plan_folds,
    speaker_ids_for,
    window_utterance,
)
from sept_tpu.data.normalize import SpeakerStats, apply_norm


# ---------------------------------------------------------------------------
# splits (adversary_data_preprocess.py:37-69)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dataset,n_speakers", [("iemocap", 10), ("msp-improv", 12), ("crema-d", 91)])
def test_folds_are_speaker_disjoint_and_cover(dataset, n_speakers):
    plans = plan_folds(dataset)
    assert len(plans) == 5
    all_test = []
    for p in plans:
        groups = [p.train, p.validation, p.adv_train, p.adv_validation, p.test]
        flat = [s for g in groups for s in g]
        assert len(flat) == len(set(flat)) == n_speakers  # disjoint, complete
        all_test += list(p.test)
    # 5-fold test sets partition the speaker universe
    assert len(set(all_test)) == n_speakers


def test_iemocap_fold1_matches_reference_kfold():
    """Unshuffled KFold(5) on 10 speakers: fold1 test = [0, 1]; the adversary
    window for fold1 starts at offset 0 with round(8*0.5)=4 speakers."""
    p = plan_folds("iemocap")[0]
    assert p.test == (0, 1)
    assert set(p.adv_train) | set(p.adv_validation) == {2, 3, 4, 5}
    assert set(p.train) | set(p.validation) == {6, 7, 8, 9}
    # 20% of 4 baseline speakers -> 1 validation speaker, from the pool front
    assert len(p.validation) == 1 and len(p.adv_validation) == 1
    assert p.validation == (6,) and p.adv_validation == (2,)


def test_crema_d_uses_seeded_shuffle():
    p1 = plan_folds("crema-d")
    p2 = plan_folds("crema-d")
    assert p1[0].test == p2[0].test  # deterministic under seed 8
    # shuffled: test speakers are not simply the first 19 ids
    assert p1[0].test != tuple(range(1001, 1001 + len(p1[0].test)))


def test_speaker_ids_for_maps_indices():
    assert speaker_ids_for("iemocap", [0, 9]) == ["Ses01F", "Ses05M"]
    assert speaker_ids_for("msp-improv", [0, 11]) == ["M01", "F06"]
    assert speaker_ids_for("crema-d", [1001]) == [1001]


# ---------------------------------------------------------------------------
# windowing (preprocess_adversary_data.py:20-83)
# ---------------------------------------------------------------------------


def test_window_counts_match_reference_formula():
    assert num_windows(200, 200, 50) == 1
    assert num_windows(350, 200, 50) == 4
    assert num_windows(199, 200, 50) == 1  # short -> one padded window


def test_window_slicing_and_padding(rng):
    data = rng.standard_normal((350, 128)).astype(np.float32)
    w = window_utterance(data, 200, 50)
    assert w.shape == (4, 200, 128)
    np.testing.assert_array_equal(w[0], data[:200])
    np.testing.assert_array_equal(w[3], data[150:350])

    short = rng.standard_normal((120, 128)).astype(np.float32)
    w = window_utterance(short, 200, 50)
    assert w.shape == (1, 200, 128)
    np.testing.assert_array_equal(w[0, :120], short)
    np.testing.assert_array_equal(w[0, 120:], 0.0)


# ---------------------------------------------------------------------------
# normalization (preprocess_adversary_data.py:356-390)
# ---------------------------------------------------------------------------


def test_norm_modes(rng):
    frames = rng.standard_normal((500, 8)).astype(np.float64) * 3 + 1
    stats = SpeakerStats.from_frames(frames)
    z = apply_norm(frames, stats, "znorm")
    np.testing.assert_allclose(z.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(z.std(0), stats.std / (stats.std + 1e-5), rtol=1e-5)
    mm = apply_norm(frames, stats, "min_max")
    assert mm.min() >= -1.0 - 1e-9 and mm.max() <= 1.0 + 1e-9
    np.testing.assert_allclose(mm.min(0), -1.0, atol=1e-9)
    np.testing.assert_allclose(mm.max(0), 1.0, atol=1e-9)


# ---------------------------------------------------------------------------
# augmentation (preprocess_adversary_data.py:392-423)
# ---------------------------------------------------------------------------


def test_balance_classes_equalizes_and_keeps_originals(rng):
    windows = rng.standard_normal((10, 4, 4)).astype(np.float32)
    labels = np.array([0] * 7 + [1] * 3)
    orig = windows.copy()
    out_w, out_l, _ = balance_classes(windows, labels, rng)
    assert (out_l == 0).sum() == (out_l == 1).sum() == 7
    # quirk-13 fix: originals are NOT overwritten by their noisy copies
    np.testing.assert_array_equal(out_w[:10], orig)
    # the added samples are noisy (not identical to any original)
    assert not any(np.array_equal(out_w[10 + i], orig[j])
                   for i in range(4) for j in range(10))


# ---------------------------------------------------------------------------
# label parsers (preprocess_adversary_data.py:230-350)
# ---------------------------------------------------------------------------


def test_iemocap_parser():
    content = (
        "[6.2901 - 8.2357]\tSes01F_impro01_F000\tneu\t[2.5000, 2.5000, 2.5000]\n"
        "[10.010 - 11.3925]\tSes01F_impro01_M001\texc\t[2.5000, 2.5000, 2.5000]\n"
        "[14.8872 - 18.0175]\tSes01F_script01_F002\tang\t[1.0, 1.0, 1.0]\n"
        "[19.0 - 20.0]\tSes01F_impro01_F003\txxx\t[1.0, 1.0, 1.0]\n"
    )
    utts = parse_iemocap_evaluation(content)
    assert len(utts) == 2  # script + xxx dropped
    assert utts[0].label == "neu" and utts[0].speaker_id == "Ses01F"
    assert utts[1].label == "hap"  # exc -> hap
    assert utts[1].gender == "M" and utts[1].speaker_id == "Ses01M"


def test_crema_d_parser():
    demo = {1001: "Male", 1002: "Female"}
    u = parse_crema_d_filename("1001_DFA_ANG_XX", demo)
    assert u.label == "ang" and u.gender == "M" and u.speaker_id == 1001
    assert parse_crema_d_filename("1002_IEO_DIS_MD", demo) is None  # disgust dropped
    u = parse_crema_d_filename("1002_IEO_HAP_HI", demo)
    assert u.gender == "F"


def test_msp_improv_parser():
    # emotion = last char of the sentence field (S01A -> 'A' -> ang);
    # recording type = last char of the next-to-last field ('S' kept)
    u = parse_msp_improv_filename("MSP-IMPROV-S01A-F01-S-FM01")
    assert u.label == "ang" and u.speaker_id == "F01" and u.gender == "F"
    u = parse_msp_improv_filename("MSP-IMPROV-S05H-M03-T-MX02")
    assert u.label == "hap" and u.speaker_id == "M03" and u.gender == "M"
    assert parse_msp_improv_filename("MSP-IMPROV-S01A-F01-P-FM01") is None
    assert parse_msp_improv_filename("MSP-IMPROV-S01N-M02-R-FM01") is None


# ---------------------------------------------------------------------------
# fold assembly on the synthetic corpus
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth_fold():
    corpus = make_corpus(n_speakers=10, utts_per_speaker=8, seed=8, max_dur_s=3.0)
    # cheap fake features: deterministic per-utterance (T,128) matrices
    rng = np.random.default_rng(0)
    store = {}
    for u in corpus.manifest:
        t = 150 + (hash(u.utt_id) % 200)
        store[u.utt_id] = {
            "mel1": rng.standard_normal((128, t)).astype(np.float32),
            "gemaps": rng.standard_normal(88).astype(np.float32),
        }
    speakers = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(
        fold=1,
        train=tuple(speakers[0:3]),
        validation=(speakers[3],),
        adv_train=tuple(speakers[4:7]),
        adv_validation=(speakers[7],),
        test=tuple(speakers[8:]),
    )
    return corpus, store, assemble_fold(
        corpus.manifest, store, plan, dataset="synthetic", aug="emotion"
    )


def test_fold_split_shapes_and_disjointness(synth_fold):
    corpus, store, fold = synth_fold
    assert fold.training.windows.shape[1:] == (200, 128)
    assert fold.test.windows.shape[1] >= 200  # whole utterances, padded to max
    # one test entry per test-speaker utterance (stored whole)
    n_test_utts = sum(1 for u in corpus.manifest if u.speaker_id in ("spk08", "spk09"))
    assert len(fold.test) == n_test_utts
    # speaker disjointness across splits
    for a, b in [("training", "adv_training"), ("training", "test"), ("adv_training", "test")]:
        sa = set(fold.split(a).speaker_ids.tolist())
        sb = set(fold.split(b).speaker_ids.tolist())
        assert not (sa & sb)


def test_fold_training_is_emotion_balanced(synth_fold):
    _, _, fold = synth_fold
    counts = np.bincount(fold.training.labels_emo, minlength=4)
    assert counts.min() == counts.max()


def test_fold_adv_training_is_not_augmented(synth_fold):
    """The reference augments ONLY the baseline training split: aug_key_list
    is built from training_dict and only training_dict is mutated
    (preprocess_adversary_data.py:392-423) — the adversary trains on the
    natural class balance.  Every adv_training window must therefore be an
    original (no duplicated utt_ids beyond genuine windowing, no synthetic
    noisy rows), i.e. its window count equals what windowing alone yields."""
    corpus, store, fold = synth_fold
    from sept_tpu.data.windowing import num_windows

    adv_speakers = set(fold.adv_training.speaker_ids.tolist())
    expected = sum(
        num_windows(store[u.utt_id]["mel1"].shape[1], 200, 50)
        for u in corpus.manifest
        if u.speaker_id in adv_speakers
    )
    assert len(fold.adv_training) == expected
    # while the baseline training split IS augmented past its natural count
    train_speakers = set(fold.training.speaker_ids.tolist())
    natural = sum(
        num_windows(store[u.utt_id]["mel1"].shape[1], 200, 50)
        for u in corpus.manifest
        if u.speaker_id in train_speakers
    )
    assert len(fold.training) > natural


def test_fold_test_lengths_and_padding(synth_fold):
    corpus, store, fold = synth_fold
    from sept_tpu.data.normalize import SpeakerStats, apply_norm

    for i in range(len(fold.test)):
        t = fold.test.lengths[i]
        assert t == store[fold.test.utt_ids[i]]["mel1"].shape[1]
        # pad rows are NORMALIZED zeros — the reference zero-pads BEFORE
        # per-speaker normalization (preprocess_adversary_data.py:29-34,373-385)
        spk = fold.test.speaker_ids[i]
        rows = np.concatenate(
            [store[u]["mel1"].T for u in store
             if u.startswith(str(spk))]
        )
        stats = SpeakerStats.from_frames(rows)
        expect = apply_norm(np.zeros((1, rows.shape[1])), stats, "znorm")[0]
        pad = fold.test.windows[i, t:]
        if len(pad):
            np.testing.assert_allclose(pad, np.broadcast_to(expect, pad.shape),
                                       atol=1e-4)


def test_batch_iterator_pads_final_batch(synth_fold):
    from sept_tpu.data import batch_iterator

    _, _, fold = synth_fold
    rng = np.random.default_rng(0)
    batches = list(batch_iterator(fold.validation, 32, rng))
    n = len(fold.validation)
    assert sum(int(b["weight"].sum()) for b in batches) == n
    for b in batches:
        assert b["spec"].shape == (32, 200, 128, 1)
        assert b["weight"].shape == (32,)
