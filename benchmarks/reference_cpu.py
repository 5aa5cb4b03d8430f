"""Reference-equivalent CPU pipeline benchmark (calibration for bench.py).

The reference repo ships no numbers (BASELINE.md), so this script measures a
faithful torch-CPU re-creation of its workload to establish the comparison
baseline empirically:

- featurization: per-utterance torch.stft mel spectrogram (n_fft=800,
  hop=160, n_mels=128, power->dB), exactly the semantics of
  /root/reference/feature_extraction/audio_feature_extraction.py:29-46
  (one utterance at a time, like the reference's loop :176-189);
- windowing to (N, 200, 128) with stride 50;
- one training epoch of the reference's ``two_d_cnn_lstm`` architecture
  (3 conv blocks 32/64/128 + 2-layer biGRU hidden 64 + heads,
  baseline_models.py:143-260) with SGD(1e-4, momentum .9, wd 1e-4),
  batch 32, eager torch CPU — the reference's only execution mode
  (SURVEY.md §2.7).

Writes benchmarks/reference_cpu.json with utterances/sec.
"""

import json
import math
import os
import time

import numpy as np
import torch
import torch.nn as nn

SR = 16000
# default 1024 = the same scale bench.py times, so vs_baseline divides two
# same-size runs (a 64-utt run extrapolated ~linearly but left an asterisk
# on the headline; VERDICT r2).  Override with SEPT_REF_N_UTTS.
N_UTTS = int(os.environ.get("SEPT_REF_N_UTTS", "1024"))
DUR_S = 2.5
WIN, SHIFT, D = 200, 50, 128


def make_waves(n, dur_s, seed=8):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur_s * SR)) / SR
    return [
        (0.3 * np.sin(2 * np.pi * (120 + 10 * i) * t)
         + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
        for i in range(n)
    ]


def mel_spectrogram_torch(wave: np.ndarray) -> np.ndarray:
    """torchaudio MelSpectrogram semantics from torch primitives."""
    x = torch.from_numpy(wave)
    spec = torch.stft(
        x, n_fft=800, hop_length=160, win_length=800,
        window=torch.hann_window(800), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    p = spec.abs() ** 2
    # HTK mel fbank (torchaudio.functional.melscale_fbanks transcription)
    n_freqs = 401
    all_freqs = torch.linspace(0, SR // 2, n_freqs)
    m_min, m_max = 0.0, 2595.0 * math.log10(1.0 + (SR / 2) / 700.0)
    m_pts = torch.linspace(m_min, m_max, D + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    mel = fb.t() @ p
    db = 10.0 * torch.log10(torch.clamp(mel, min=1e-10))
    return db.numpy()


class TwoDCnnLstm(nn.Module):
    """The reference workhorse architecture (baseline_models.py:143-260)."""

    def __init__(self, hidden=64):
        super().__init__()
        def block(cin, cout):
            return [
                nn.Conv2d(cin, cout, 5, padding=2), nn.BatchNorm2d(cout),
                nn.ReLU(), nn.MaxPool2d(2, 2), nn.Dropout2d(0.2),
            ]
        self.conv = nn.Sequential(*block(1, 32), *block(32, 64), *block(64, 128))
        self.rnn = nn.GRU(128 * (D // 8), hidden, num_layers=2,
                          batch_first=True, dropout=0.2, bidirectional=True)
        self.dense1 = nn.Linear(hidden * 2, 128)
        self.head = nn.Linear(128, 4)

    def forward(self, x):
        x = self.conv(x)
        x = x.transpose(1, 2).contiguous()
        b, t, c, d = x.shape
        x = x.reshape(b, t, c * d)
        x, _ = self.rnn(x)
        z = x.mean(dim=1)
        z = torch.relu(self.dense1(z))
        return self.head(z)


def main():
    torch.set_num_threads(os.cpu_count() or 8)
    waves = make_waves(N_UTTS, DUR_S)

    t0 = time.perf_counter()
    feats = [mel_spectrogram_torch(w) for w in waves]  # (128, T) each
    t_feat = time.perf_counter() - t0

    # windowing
    windows = []
    for f in feats:
        data = f.T  # (T, 128)
        n = (len(data) - WIN) // SHIFT + 1
        for k in range(n):
            windows.append(data[k * SHIFT : k * SHIFT + WIN])
    x = torch.from_numpy(np.stack(windows)).unsqueeze(1)  # (N, 1, 200, 128)
    y = torch.randint(0, 4, (len(x),))

    model = TwoDCnnLstm()
    opt = torch.optim.SGD(model.parameters(), lr=1e-4, momentum=0.9,
                          weight_decay=1e-4)
    loss_fn = nn.CrossEntropyLoss()
    model.train()
    t0 = time.perf_counter()
    for lo in range(0, len(x), 32):
        xb, yb = x[lo : lo + 32], y[lo : lo + 32]
        opt.zero_grad()
        loss = loss_fn(model(xb), yb)
        loss.backward()
        opt.step()
    t_train = time.perf_counter() - t0

    total = t_feat + t_train
    out = {
        "n_utts": N_UTTS,
        "dur_s": DUR_S,
        "n_windows": len(x),
        "featurize_s": round(t_feat, 3),
        "train_epoch_s": round(t_train, 3),
        "total_s": round(total, 3),
        "utts_per_sec": round(N_UTTS / total, 3),
        "torch_threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "reference_cpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
