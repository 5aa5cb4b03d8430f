"""Store roundtrips, combine mode, and eGeMAPS functionals."""

import numpy as np
import pytest

from sept_tpu.data import FoldPlan, assemble_fold, make_corpus
from sept_tpu.data.combine import combine_folds, combine_splits
from sept_tpu.data.store import (
    load_feature_store,
    load_fold,
    load_manifest,
    save_feature_store,
    save_fold,
    save_manifest,
)


def _tiny_fold(dataset="synthetic", seed=8, t_off=0):
    corpus = make_corpus(n_speakers=6, utts_per_speaker=4, seed=seed,
                         dataset=dataset)
    rng = np.random.default_rng(seed)
    store = {
        u.utt_id: {
            "mel1": rng.standard_normal((32, 120 + t_off + (hash(u.utt_id) % 50))).astype(np.float32),
            "gemaps": rng.standard_normal(88).astype(np.float32),
        }
        for u in corpus.manifest
    }
    spk = sorted({u.speaker_id for u in corpus.manifest})
    plan = FoldPlan(1, tuple(spk[:2]), (spk[2],), (spk[3],), (spk[4],), (spk[5],))
    fold = assemble_fold(corpus.manifest, store, plan, dataset=dataset,
                         feature_len=32, win_len=60, aug=None)
    return corpus, store, fold


def test_feature_store_roundtrip(tmp_path):
    corpus, store, _ = _tiny_fold()
    path = str(tmp_path / "data.npz")
    save_feature_store(path, store)
    back = load_feature_store(path)
    assert set(back) == set(store)
    u = corpus.manifest[0].utt_id
    np.testing.assert_array_equal(back[u]["mel1"], store[u]["mel1"])
    np.testing.assert_array_equal(back[u]["gemaps"], store[u]["gemaps"])


def test_manifest_roundtrip(tmp_path):
    corpus, _, _ = _tiny_fold()
    path = str(tmp_path / "manifest.json")
    save_manifest(path, corpus.manifest)
    back = load_manifest(path)
    assert back == corpus.manifest


def test_fold_roundtrip(tmp_path):
    _, _, fold = _tiny_fold()
    path = str(tmp_path / "fold1.npz")
    save_fold(path, fold)
    back = load_fold(path)
    assert back.fold == 1
    for split in ("training", "validation", "adv_training", "test"):
        a, b = fold.split(split), back.split(split)
        np.testing.assert_array_equal(a.windows, b.windows)
        np.testing.assert_array_equal(a.labels_emo, b.labels_emo)
        assert list(a.speaker_ids) == list(b.speaker_ids)


def test_combine_folds_merges_and_tags():
    _, _, f1 = _tiny_fold("corpus-a", seed=8)
    _, _, f2 = _tiny_fold("corpus-b", seed=9, t_off=40)  # different test max T
    combined = combine_folds([f1, f2])
    assert len(combined.training) == len(f1.training) + len(f2.training)
    tags = set(combined.training.datasets.tolist())
    assert tags == {"corpus-a", "corpus-b"}
    # test windows padded to the common max
    assert combined.test.windows.shape[1] == max(
        f1.test.windows.shape[1], f2.test.windows.shape[1]
    )
    # padded region of the shorter corpus's test rows is zero
    shorter = f1 if f1.test.windows.shape[1] < f2.test.windows.shape[1] else f2
    n1 = len(f1.test)
    row = 0 if shorter is f1 else n1
    np.testing.assert_array_equal(
        combined.test.windows[row, shorter.test.windows.shape[1]:], 0.0
    )
    with pytest.raises(ValueError):
        combine_folds([f1, FoldData_with_fold2(f2)])


def FoldData_with_fold2(f):
    import dataclasses

    return dataclasses.replace(f, fold=2)


def test_egemaps_dimension_and_gender_sensitivity():
    from sept_tpu.ops.egemaps import N_GEMAPS, egemaps_functionals

    corpus = make_corpus(n_speakers=4, utts_per_speaker=2, seed=8,
                         min_dur_s=1.0, max_dur_s=1.2)
    vecs = {}
    for u in corpus.manifest:
        v = egemaps_functionals(corpus.wave(u.utt_id))
        assert v.shape == (N_GEMAPS,)
        assert np.isfinite(v).all()
        vecs[u.utt_id] = (v, u.gender)
    # determinism
    u0 = corpus.manifest[0]
    np.testing.assert_array_equal(
        egemaps_functionals(corpus.wave(u0.utt_id)), vecs[u0.utt_id][0]
    )
    # F0 mean (dim 0, log2 semitones) separates F from M on synthetic speech
    f0_f = np.mean([v[0] for v, g in vecs.values() if g == "F"])
    f0_m = np.mean([v[0] for v, g in vecs.values() if g == "M"])
    assert f0_f > f0_m


def test_combine_two_mode(tmp_path):
    """--dataset combine_two merges iemocap + crema-d only
    (training_adversary_baselines.py:53,148), and result_dict carries the
    two-corpus breakdown keys."""
    from sept_tpu.cli import preprocess
    from sept_tpu.eval.metrics import result_dict

    import dataclasses

    def retag(split, tag):
        return dataclasses.replace(
            split, datasets=np.full(len(split), tag, dtype=object)
        )

    for ds in ("iemocap", "crema-d", "msp-improv"):
        # synthetic folds retagged with real-corpus names (real corpora
        # require licensed audio; combine only consumes the dataset tags)
        _, _, fold = _tiny_fold(seed=8)
        fold = dataclasses.replace(
            fold,
            **{s: retag(fold.split(s), ds)
               for s in ("training", "validation", "adv_training",
                         "adv_validation", "test")},
        )
        d = tmp_path / "folds" / ds
        d.mkdir(parents=True)
        save_fold(str(d / "fold1.npz"), fold)

    preprocess.main(["--dataset", "combine_two", "--work_dir", str(tmp_path),
                     "--folds", "1"])
    merged = load_fold(str(tmp_path / "folds" / "combine_two" / "fold1.npz"))
    assert set(merged.training.datasets.tolist()) == {"iemocap", "crema-d"}

    truth = {"combine_two": [0, 1], "iemocap": [0], "crema-d": [1]}
    pred = {"combine_two": [0, 0], "iemocap": [0], "crema-d": [0]}
    out = result_dict(truth, pred, "combine_two", "emotion")
    assert set(out) == {"combine_two", "iemocap", "crema-d"}
    assert out["iemocap"]["acc"]["emotion"] == 1.0
