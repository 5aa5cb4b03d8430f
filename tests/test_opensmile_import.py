"""openSMILE import adapter: real eGeMAPS/emobase values enter the store
verbatim (data/opensmile_import.py; reference
feature_extraction/audio_feature_extraction.py:74-78,188-189)."""

import pickle

import numpy as np
import pytest

from sept_tpu.data.opensmile_import import apply_opensmile, load_opensmile_file


def _csv_of(rows, n_feats, with_start_end=True):
    cols = ["file"] + (["start", "end"] if with_start_end else [])
    cols += [f"F{i}" for i in range(n_feats)]
    lines = [",".join(cols)]
    for path, vec in rows:
        meta = [path] + (["0.0", "2.5"] if with_start_end else [])
        lines.append(",".join(meta + [repr(float(v)) for v in vec]))
    return "\n".join(lines) + "\n"


def test_csv_roundtrip_gemaps(tmp_path):
    rng = np.random.default_rng(0)
    vecs = {f"utt{i}": rng.standard_normal(88).astype(np.float32)
            for i in range(3)}
    csv = _csv_of([(f"/data/wav/{u}.wav", v) for u, v in vecs.items()], 88)
    path = tmp_path / "gemaps.csv"
    path.write_text(csv)

    imported = load_opensmile_file(str(path))
    assert set(imported) == set(vecs)
    for u, v in vecs.items():
        np.testing.assert_array_equal(imported[u]["gemaps"], v)

    # replaces the stand-in values in a store
    store = {u: {"mfcc": np.zeros((120, 10)), "gemaps": np.zeros(88)}
             for u in vecs}
    replaced, unmatched, uncovered = apply_opensmile(store, imported)
    assert replaced == 3 and unmatched == [] and uncovered == {}
    for u, v in vecs.items():
        np.testing.assert_array_equal(store[u]["gemaps"], v)
        assert store[u]["mfcc"].shape == (120, 10)  # untouched


def test_csv_emobase_width_inference(tmp_path):
    vec = np.arange(988, dtype=np.float32)
    path = tmp_path / "emobase.csv"
    path.write_text(_csv_of([("a.wav", vec)], 988, with_start_end=False))
    imported = load_opensmile_file(str(path))
    np.testing.assert_array_equal(imported["a"]["emobase"], vec)


def test_csv_wrong_width_rejected(tmp_path):
    path = tmp_path / "bad.csv"
    path.write_text(_csv_of([("a.wav", np.zeros(17))], 17))
    with pytest.raises(ValueError, match="88.*988|expected 88"):
        load_opensmile_file(str(path))


def test_reference_pickle_roundtrip(tmp_path):
    """The reference's own feature pkl ({utt: {'gemaps': ..., 'emobase':
    ..., 'mfcc': ...}}, audio_feature_extraction.py:191-194) imports
    directly; non-functional entries are ignored."""
    rng = np.random.default_rng(1)
    g = rng.standard_normal((1, 88)).astype(np.float64)  # DataFrame-shaped
    e = rng.standard_normal((1, 988)).astype(np.float64)
    blob = {"Ses01F_impro01_F000": {"gemaps": g, "emobase": e,
                                    "mfcc": np.zeros((120, 50))}}
    path = tmp_path / "data_128.pkl"
    with open(path, "wb") as f:
        pickle.dump(blob, f)

    imported = load_opensmile_file(str(path))
    got = imported["Ses01F_impro01_F000"]
    np.testing.assert_allclose(got["gemaps"], g.ravel().astype(np.float32))
    np.testing.assert_allclose(got["emobase"], e.ravel().astype(np.float32))
    assert set(got) == {"gemaps", "emobase"}


def test_pickle_wrong_width_rejected(tmp_path):
    path = tmp_path / "bad.pkl"
    with open(path, "wb") as f:
        pickle.dump({"u": {"gemaps": np.zeros(87)}}, f)
    with pytest.raises(ValueError, match="expected 88"):
        load_opensmile_file(str(path))


def test_unmatched_ids_reported():
    store = {"a": {"gemaps": np.zeros(88)}}
    imported = {"a": {"gemaps": np.ones(88, np.float32)},
                "zzz": {"gemaps": np.ones(88, np.float32)}}
    replaced, unmatched, uncovered = apply_opensmile(store, imported)
    assert replaced == 1
    assert unmatched == ["zzz"]
    assert uncovered == {}


def test_partial_coverage_reported():
    """A CSV covering only part of the corpus must surface the gap: the
    uncovered utterances keep stand-in values (or zeros downstream,
    pipeline.py:142), which silently breaks interoperability."""
    store = {u: {"gemaps": np.zeros(88)} for u in ("a", "b", "c")}
    imported = {"a": {"gemaps": np.ones(88, np.float32)}}
    replaced, unmatched, uncovered = apply_opensmile(store, imported)
    assert replaced == 1 and unmatched == []
    assert uncovered == {"gemaps": ["b", "c"]}
