"""Corpus walkers against synthesized directory trees (reference layouts)."""

import os

import numpy as np
import pytest

from sept_tpu.data.walkers import (
    walk_crema_d,
    walk_iemocap,
    walk_msp_improv,
    walk_msp_podcast,
)
from sept_tpu.runtime import write_wav


def _wav(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_wav(path, np.zeros(1600, np.float32), 16000)


def test_walk_iemocap(tmp_path):
    root = str(tmp_path)
    _wav(f"{root}/Session1/sentences/wav/Ses01F_impro01/Ses01F_impro01_F000.wav")
    _wav(f"{root}/Session1/sentences/wav/Ses01F_impro01/Ses01F_impro01_M001.wav")
    eval_dir = f"{root}/Session1/dialog/EmoEvaluation"
    os.makedirs(eval_dir, exist_ok=True)
    with open(f"{eval_dir}/Ses01F_impro01.txt", "w") as f:
        f.write(
            "[6.2901 - 8.2357]\tSes01F_impro01_F000\tneu\t[2.5, 2.5, 2.5]\n"
            "[10.01 - 11.39]\tSes01F_impro01_M001\texc\t[2.5, 2.5, 2.5]\n"
            "[12.0 - 13.0]\tSes01F_impro01_F999\tang\t[1, 1, 1]\n"  # no wav
        )
    utts = walk_iemocap(root)
    assert len(utts) == 2
    assert {u.label for u in utts} == {"neu", "hap"}
    assert all(os.path.exists(u.path) for u in utts)


def test_walk_crema_d(tmp_path):
    root = str(tmp_path)
    _wav(f"{root}/1001_DFA_ANG_XX.wav")
    _wav(f"{root}/1002_IEO_HAP_HI.wav")
    _wav(f"{root}/1002_IEO_DIS_MD.wav")  # disgust -> dropped
    _wav(f"{root}/1076_MTI_SAD_XX.wav")  # corrupt-file skip rule
    with open(f"{root}/VideoDemographics.csv", "w") as f:
        f.write("ActorID,Age,Sex,Race,Ethnicity\n1001,30,Male,A,B\n"
                "1002,25,Female,A,B\n1076,40,Male,A,B\n")
    utts = walk_crema_d(root)
    assert {(u.speaker_id, u.label, u.gender) for u in utts} == {
        (1001, "ang", "M"), (1002, "hap", "F")
    }


def test_walk_msp_improv(tmp_path):
    root = str(tmp_path)
    _wav(f"{root}/Audio/session1/S01A/MSP-IMPROV-S01A-F01-S-FM01.wav")
    _wav(f"{root}/Audio/session1/S01A/MSP-IMPROV-S01A-F01-P-FM01.wav")  # dropped
    _wav(f"{root}/Audio/session2/S05H/MSP-IMPROV-S05H-M03-T-MX02.wav")
    utts = walk_msp_improv(root)
    assert {(u.speaker_id, u.label) for u in utts} == {("F01", "ang"), ("M03", "hap")}


def test_walk_msp_podcast(tmp_path):
    root = str(tmp_path)
    os.makedirs(f"{root}/Labels", exist_ok=True)
    names = [f"MSP-PODCAST_{i:04d}.wav" for i in range(12)]
    with open(f"{root}/Labels/labels_concensus.csv", "w") as f:
        f.write("FileName,EmoClass,SpkrID,Gender,Split_Set\n")
        for i, n in enumerate(names):
            f.write(f"{n},N,spk1,Female,Train\n")  # 12 utts for spk1
        f.write("rare.wav,N,spk2,Male,Train\n")  # <10 utts -> dropped
        f.write("t2.wav,N,spk1,Female,Test2\n")  # Test2 -> dropped
    for n in names:
        _wav(f"{root}/Audios/{n}")
    utts = walk_msp_podcast(root)
    assert len(utts) == 12
    assert all(u.speaker_id == "spk1" and u.gender == "F" for u in utts)
