"""Inference / serving API: raw waveform -> emotion (and gender) predictions.

The reference has no inference path outside its evaluation scripts; serving a
trained model means re-running chunks of training_*.py.  This module packages
the deployment story: load checkpoints once, then a single jitted program per
utterance-batch runs

    waveform -> mel frontend (MXU GEMM chain) -> per-utterance znorm*
             -> sliding windows -> [optional cloak noise] -> backbone
             -> softmax-mean vote

(*) deployment note: training normalizes per SPEAKER over the training
corpus (preprocess_adversary_data.py:356-390); at serving time the speaker is
unknown, so the predictor normalizes per utterance — the standard deployment
approximation.  Pass ``norm_stats=(mean, std)`` to use fixed corpus
statistics instead.

Use :class:`CloakedPredictor` to serve the privacy-preserving path: the
stored noise parameters are applied to features before classification, so
the served representation is the noised one (what the paper's threat model
exposes to downstream consumers — adversary_cloak_evaluation.py:78-83).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sept_tpu.data.device_pipeline import prepare_waves
from sept_tpu.models import CloakNoise, build_backbone, pooling_for
from sept_tpu.ops import frontend as F

__all__ = [
    "Predictor",
    "CloakedPredictor",
    "PredictionServer",
    "load_predictor",
]


class Predictor:
    """Batch waveform -> class probabilities, fully jitted per bucket shape."""

    def __init__(
        self,
        params,
        batch_stats,
        model_type: str = "2d-cnn-lstm",
        pred: str = "emotion",
        hidden_size: int = 64,
        feature_len: int = 128,
        win_len: int = 200,
        shift_len: int = 50,
        n_fft: int = 800,
        norm_stats: Optional[tuple] = None,
        att: Optional[str] = None,
        attention_size: int = 128,
    ):
        self.model = build_backbone(model_type, hidden_size=hidden_size,
                                    pred=pred, att=att,
                                    attention_size=attention_size)
        self.pooling = pooling_for(model_type)
        self.params = params
        self.batch_stats = batch_stats
        self.feature_len = feature_len
        self.win_len = win_len
        self.shift_len = shift_len
        self.n_fft = n_fft
        self.norm_stats = norm_stats
        # shape-independent constant: built once here, not on every trace of
        # the bucketed _predict (each novel bucket re-traces, and compiles
        # cost minutes over a tunneled chip).  Kept as numpy so constructing
        # a Predictor never forces jax backend init.
        self._fbanks = np.asarray(
            F.melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0, feature_len,
                              16000))

    def _features(self, padded, n_frames_max):
        fb = jnp.asarray(self._fbanks)

        def one(w):
            spec = F.stft_power(w, self.n_fft, 160, center=False)
            mel = jnp.dot(spec.T, fb, precision=F.PARITY_PRECISION,
                          preferred_element_type=jnp.float32)
            return F.amplitude_to_db(mel.T, "power", None).T  # (T, D)

        return jax.vmap(one)(padded)[:, :n_frames_max]

    def _normalize(self, feats, frame_valid):
        m = frame_valid[..., None]
        if self.norm_stats is not None:
            mean, std = self.norm_stats
            # mask pad frames like the per-utterance branch: bucketing pads
            # the frame axis, and unmasked normalized dB-of-silence would
            # leak into window 0 of short utterances
            return ((feats - mean) / (std + 1e-5)) * m
        count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feats * m, axis=1, keepdims=True) / count
        var = jnp.sum(((feats - mean) ** 2) * m, axis=1, keepdims=True) / count
        return ((feats - mean) / (jnp.sqrt(var) + 1e-5)) * m

    def _noise(self, windows, rng):  # hook for CloakedPredictor
        return windows

    @functools.partial(jax.jit, static_argnames=("self", "max_t"))
    def _predict(self, padded, n_frames, *, max_t, rng):
        b = padded.shape[0]
        padded = F.pcm_to_float(padded)  # int16 PCM staging: exact
        feats = self._features(padded, max_t)  # (B, T, D)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (b, max_t), 1) < n_frames[:, None]
        ).astype(jnp.float32)
        feats = self._normalize(feats, valid)
        # predict() always buckets max_t up to a win_len multiple
        assert max_t >= self.win_len and max_t % self.win_len == 0, max_t
        n_win = max(0, (feats.shape[1] - self.win_len) // self.shift_len) + 1
        starts = jnp.arange(n_win) * self.shift_len
        idx = starts[:, None] + jnp.arange(self.win_len)[None, :]
        wins = feats[:, idx, :]  # (B, W, win, D)
        wins = self._noise(wins, rng)
        flat = wins.reshape(b * n_win, self.win_len, self.feature_len, 1)
        logits = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats}, flat,
            pooling=self.pooling,
        )
        n_valid = jnp.maximum((n_frames - self.win_len) // self.shift_len, 0) + 1
        wvalid = jnp.arange(n_win)[None, :] < n_valid[:, None]

        def vote(head_logits):
            probs = jax.nn.softmax(head_logits, -1).reshape(b, n_win, -1)
            return jnp.sum(probs * wvalid[..., None], axis=1) / jnp.maximum(
                jnp.sum(wvalid, axis=1)[:, None], 1
            )

        # multitask models return (emotion, gender) logits; vote each head
        if isinstance(logits, tuple):
            return tuple(vote(h) for h in logits)
        return vote(logits)

    def predict(self, waveforms: list[np.ndarray], seed: int = 0):
        """list of 16 kHz waveforms -> (B, n_classes) probabilities.

        A ``pred="multitask"`` model returns a dict instead:
        ``{"emotion": (B, 4), "gender": (B, 2)}`` — both heads voted over
        the same windows.

        Waveforms are float32 in [-1, 1) or raw int16 PCM (a uniform-int16
        batch crosses host->device at half the bytes and is normalized on
        device, bit-equal — ops/frontend.py::pcm_to_float).

        Shapes are BUCKETED before jit: the padded frame count rounds up to
        a ``win_len`` multiple and the batch rows to a power of two, so
        arbitrary client input compiles O(log) distinct programs instead of
        one per (batch, length) pair — compiles cost minutes on a tunneled
        chip, and the HTTP server would otherwise stall on every novel
        shape.  Pad rows/frames are masked out of the vote, so results are
        identical to the exact-shape program.
        """
        padded, n_frames = prepare_waves(waveforms, self.n_fft)
        max_t = int(n_frames.max())
        max_t_b = max(1, -(-max_t // self.win_len)) * self.win_len
        # sample width is ALWAYS the bucketed frame count's requirement —
        # cropping is lossless (trailing < hop samples yield no new frame)
        # and never letting the raw wave length through keeps the jit shape
        # a pure function of (rows bucket, frame bucket)
        need = (max_t_b - 1) * 160 + self.n_fft
        from sept_tpu.ops.functionals import pow2_rows

        rows = pow2_rows(len(waveforms), 1 << 30)  # next pow2, unbounded
        # int16 PCM waveforms stay int16 across host->device (half the
        # bytes) and normalize on device (ops.frontend.pcm_to_float)
        buf = np.zeros((rows, need), padded.dtype)
        w = min(padded.shape[1], need)
        buf[: len(waveforms), :w] = padded[:, :w]
        nf = np.ones(rows, np.int32)
        nf[: len(waveforms)] = n_frames
        out = self._predict(
            jnp.asarray(buf),
            jnp.asarray(nf),
            max_t=max_t_b,
            rng=jax.random.PRNGKey(seed),
        )
        n = len(waveforms)
        if isinstance(out, tuple):  # multitask: one entry per head
            return {"emotion": np.asarray(out[0])[:n],
                    "gender": np.asarray(out[1])[:n]}
        return np.asarray(out)[:n]


class CloakedPredictor(Predictor):
    """Predictor that applies trained cloak noise to features before the
    backbone — serving the privacy-preserving representation."""

    def __init__(self, *args, noise_params=None, mask=None,
                 max_scale: float = 5.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.noise = CloakNoise(
            win_len=self.win_len, n_feats=self.feature_len, max_scale=max_scale
        )
        self.noise_params = {"params": noise_params}
        self.mask = None if mask is None else jnp.asarray(mask)

    def _noise(self, windows, rng):
        b, w = windows.shape[:2]
        flat = windows.reshape(b * w, self.win_len, self.feature_len)
        out = self.noise.apply(
            self.noise_params, flat, self.mask, rngs={"noise": rng}
        )
        return out.reshape(windows.shape)


# ---------------------------------------------------------------------------
# checkpoint -> predictor, and the HTTP deployment surface
# ---------------------------------------------------------------------------

_CLASS_NAMES = {
    # label order fixed by the reference's maps (training_tools.py:9-10)
    "emotion": ("neu", "hap", "sad", "ang"),
    "gender": ("F", "M"),
}


def load_predictor(
    output_dir: str,
    artifact: str = "baseline_emotion",
    fold: int = 1,
    cloak_artifact: Optional[str] = None,
    suppression_ratio: int = 0,
    n_fft: int = 800,
    **overrides,
) -> Predictor:
    """Build a serving predictor from training artifacts on disk.

    ``artifact``/``fold`` name the frozen classifier checkpoint written by
    ``cli.train_baseline``.  The model architecture (model_type, pred,
    hidden_size, feature_len, win_len, att, attention_size) is read from the
    ``manifest_fold<k>.json`` the trainer wrote next to the checkpoint, so a
    served model is BUILT exactly as it was trained — a hidden-size or
    attention mismatch would otherwise fail opaquely (or, for attention,
    silently serve without the trained pooling path).  Keyword ``overrides``
    take precedence over the manifest; without a manifest the framework
    defaults apply.

    Pass ``cloak_artifact`` (a ``cli.train_cloak`` artifact name) to serve
    the privacy-preserving path — the cloak's noise parameters are restored,
    the evaluation-direction suppression mask for ``suppression_ratio`` is
    derived from its scales (adversary_cloak_evaluation.py:262-267), and a
    :class:`CloakedPredictor` is returned (max_scale=5, the evaluation
    convention :205).
    """
    import json
    import os

    from sept_tpu.train.checkpoint import CheckpointManager

    mcfg = {}
    mpath = os.path.join(output_dir, artifact, f"manifest_fold{fold}.json")
    if os.path.isfile(mpath):
        with open(mpath) as f:
            mcfg = json.load(f).get("config", {})

    def knob(name, default):
        if name in overrides:
            return overrides.pop(name)
        return mcfg.get(name, default)

    win_len = int(knob("win_len", 200))
    common = dict(
        model_type=knob("model_type", "2d-cnn-lstm"),
        pred=knob("pred", "emotion"),
        hidden_size=int(knob("hidden_size", 64)),
        feature_len=int(knob("feature_len", 128)),
        win_len=win_len,
        shift_len=int(overrides.pop("shift_len", win_len // 4)),
        att=knob("att", None),
        attention_size=int(knob("attention_size", 128)),
        n_fft=n_fft,
    )
    if overrides:
        raise TypeError(f"unknown load_predictor overrides: {sorted(overrides)}")
    if mcfg.get("global_feature"):
        raise ValueError(
            f"{artifact} was trained with global_feature=1 (gemaps concat); "
            "the serving path computes windowed spectral features only — "
            "evaluate such artifacts with cli.evaluate, or retrain with "
            "--global_feature 0 to serve"
        )

    ckpt = CheckpointManager(output_dir)
    state = ckpt.restore(artifact, fold)
    if cloak_artifact is None:
        return Predictor(state["params"], state.get("batch_stats", {}),
                         **common)

    from sept_tpu.eval.sweep import eval_mask

    cloak = ckpt.restore(cloak_artifact, fold)
    noise_params = {
        "locs": jnp.asarray(cloak["params"]["noise"]["locs"]),
        "rhos": jnp.asarray(cloak["params"]["noise"]["rhos"]),
    }
    probe = CloakNoise(win_len=win_len, n_feats=common["feature_len"],
                       max_scale=5.0)
    scales = np.asarray(
        probe.apply({"params": noise_params}, method=CloakNoise.scales)
    )
    mask = eval_mask(scales, suppression_ratio)
    return CloakedPredictor(
        state["params"], state.get("batch_stats", {}),
        noise_params=noise_params, mask=mask, max_scale=5.0, **common,
    )


class PredictionServer:
    """Stdlib-only JSON-over-HTTP front for a :class:`Predictor`.

    Routes:
        GET  /healthz   -> {"status": "ok", "pred": ..., "cloaked": ...}
        GET  /metrics   -> request/error/waveform counters, device-call
                           latency quantiles (ms), micro-batch size stats
        POST /predict   -> body {"waveforms": [[float16k samples], ...],
                                 "seed": 0}
                           or   {"waveforms_pcm16": ["<base64 of raw
                                 little-endian int16 PCM>", ...], "seed": 0}
                           reply {"classes": [...], "probs": [[...], ...],
                                  "labels": [argmax class per waveform]}
                           (a multitask model replies {"tasks": {"emotion":
                           {...}, "gender": {...}}} with one block per head)
        POST /stream            -> {"session": id}   (optional {"seed": n})
        POST /stream/<id>       -> append {"pcm16": "<base64 int16>"} or
                                   {"samples": [...]}; reply adds the
                                   rolling {"probs": [...], "label": ...,
                                   "samples": total} over the session tail
        DELETE /stream/<id>     -> drop the session

    Streaming serves the real-time use case (a call-center dashboard, a
    live demo): push ~0.5-1 s chunks, read the rolling prediction after
    each push.  The session keeps only the trailing ``max_stream_s``
    seconds (default 30), so per-push cost is bounded and the jit shapes
    stay on the same O(log) bucket budget as /predict; idle sessions
    expire after ``stream_ttl_s``.

    ``waveforms_pcm16`` is the production wire format: base64 int16 PCM is
    ~8x smaller than JSON float text, parses without float conversion, and
    stays int16 all the way to the device (half the H2D bytes; normalized
    on device bit-exactly — ops/frontend.py::pcm_to_float).

    Single jitted program per padded bucket shape.  Connections are handled
    on threads but /predict calls are serialized through one device lock
    (TPU programs are not reentrant per process) — so /healthz stays
    responsive while a request computes or pays a novel-shape compile,
    instead of a balancer marking the instance dead.  Horizontal scale is
    one process per chip behind any off-the-shelf HTTP balancer.

    ``batch_window_ms > 0`` enables dynamic micro-batching: concurrent
    /predict requests arriving within the window coalesce into ONE device
    program over the concatenated waveforms (measured on-chip: batch-8
    costs ~1.8x one single-utterance request, not 8x), and each caller gets
    its slice of the probabilities.  Requests merge only when they share a
    ``seed`` — cloaked predictors draw noise from it, and merging different
    seeds would change results; other seeds wait for the next batch.  Row
    bucketing (powers of two) keeps merged shapes on the same O(log)
    compiled-program budget.  0 (default) dispatches each request
    individually.
    """

    def __init__(self, predictor: Predictor, host: str = "127.0.0.1",
                 port: int = 0, batch_window_ms: float = 0.0,
                 max_stream_s: float = 30.0, stream_ttl_s: float = 300.0,
                 max_sessions: int = 256, sample_rate: int = 16000,
                 max_body_mb: float = 256.0):
        import http.server
        import json
        import queue
        import threading
        import time
        import uuid

        device_lock = threading.Lock()

        # ---- observability: counters + a sliding latency window ----
        stats_lock = threading.Lock()
        stats = {"requests_total": 0, "errors_total": 0,
                 "waveforms_total": 0, "device_calls_total": 0,
                 "batched_requests_total": 0}
        recent_ms: list = []  # device-call latencies, last _WINDOW kept
        recent_batch: list = []  # waveforms per device call
        _WINDOW = 1024

        def _timed_predict(waves, seed, n_requests):
            with device_lock:
                # timed INSIDE the lock: device_call_ms measures the device
                # call, not queue wait behind other requests
                t0 = time.perf_counter()
                probs = predictor.predict(waves, seed=seed)
                ms = (time.perf_counter() - t0) * 1e3
            with stats_lock:
                stats["device_calls_total"] += 1
                stats["waveforms_total"] += len(waves)
                if n_requests > 1:
                    stats["batched_requests_total"] += n_requests
                recent_ms.append(ms)
                recent_batch.append(len(waves))
                del recent_ms[:-_WINDOW], recent_batch[:-_WINDOW]
            return probs

        def _metrics():
            with stats_lock:
                out = dict(stats)
                ms, bt = list(recent_ms), list(recent_batch)
            if ms:
                q = np.percentile(ms, [50, 90, 99])
                out["device_call_ms"] = {
                    "p50": round(float(q[0]), 2),
                    "p90": round(float(q[1]), 2),
                    "p99": round(float(q[2]), 2),
                    "window": len(ms),
                }
                out["waveforms_per_device_call"] = {
                    "mean": round(float(np.mean(bt)), 2),
                    "max": int(max(bt)),
                }
            out["micro_batching"] = (
                {"batch_window_ms": batch_window_ms}
                if batch_window_ms > 0 else None
            )
            return out

        class _Pending:
            __slots__ = ("waves", "seed", "done", "result", "error")

            def __init__(self, waves, seed):
                self.waves = waves
                self.seed = seed
                self.done = threading.Event()
                self.result = None
                self.error = None

        batch_queue: queue.Queue = queue.Queue()

        def _run_batch(group):
            # NOTHING here may escape: an uncaught exception would kill the
            # batcher thread and strand every queued request forever
            try:
                flat = [w for p in group for w in p.waves]
                probs = _timed_predict(flat, group[0].seed, len(group))
                lo = 0
                for p in group:
                    hi = lo + len(p.waves)
                    p.result = (
                        {k: v[lo:hi] for k, v in probs.items()}
                        if isinstance(probs, dict) else probs[lo:hi]
                    )
                    lo = hi
            except Exception as e:
                for p in group:
                    if p.result is None:
                        p.error = e
            finally:
                for p in group:
                    p.done.set()

        def _batcher():
            while True:
                first = batch_queue.get()
                if first is None:
                    return
                # collect same-seed requests arriving inside the window;
                # other seeds go back on the queue for the next batch
                deadline = time.monotonic() + batch_window_ms / 1000.0
                group, requeue = [first], []
                stop = False
                while True:
                    remain = deadline - time.monotonic()
                    if remain <= 0:
                        break
                    try:
                        p = batch_queue.get(timeout=remain)
                    except queue.Empty:
                        break
                    if p is None:
                        stop = True
                        break
                    (group if p.seed == first.seed else requeue).append(p)
                for r in requeue:
                    batch_queue.put(r)
                _run_batch(group)
                if stop:
                    # drain everything still queued (grouped by seed) so no
                    # caller blocks forever across shutdown
                    by_seed: dict = {}
                    while True:
                        try:
                            p = batch_queue.get_nowait()
                        except queue.Empty:
                            break
                        if p is not None:
                            by_seed.setdefault(p.seed, []).append(p)
                    for g in by_seed.values():
                        _run_batch(g)
                    return

        self._batcher_thread = None
        if batch_window_ms > 0:
            self._batcher_thread = threading.Thread(target=_batcher,
                                                    daemon=True)
            self._batcher_thread.start()
        self._batch_queue = batch_queue

        def predict_waves(waves, seed):
            """One request's prediction, through the micro-batcher if on."""
            batcher = self._batcher_thread
            if batcher is None or not batcher.is_alive():
                return _timed_predict(waves, seed, 1)
            p = _Pending(waves, seed)
            batch_queue.put(p)
            while not p.done.wait(1.0):
                if not batcher.is_alive():
                    # the batcher exited (shutdown race) without serving this
                    # request: dispatch directly rather than hang the caller
                    return _timed_predict(waves, seed, 1)
            if p.error is not None:
                raise p.error
            return p.result

        # ---- streaming sessions: id -> accumulated trailing samples ----
        sessions_lock = threading.Lock()
        sessions: dict = {}  # id -> {"wave": np.ndarray, "seed": int, "t": float}
        max_samples = int(max_stream_s * sample_rate)
        # shortest wave the frontend accepts: the center-STFT reflect pad
        # (prepare_waves) needs len > n_fft//2
        min_samples = predictor.n_fft // 2 + 1

        def _stream_create(seed):
            sid = uuid.uuid4().hex[:16]
            with sessions_lock:
                # evict expired, then oldest-over-capacity
                now = time.monotonic()
                for k in [k for k, s in sessions.items()
                          if now - s["t"] > stream_ttl_s]:
                    del sessions[k]
                while len(sessions) >= max_sessions:
                    del sessions[min(sessions, key=lambda k: sessions[k]["t"])]
                sessions[sid] = {"wave": np.zeros(0, np.int16), "seed": seed,
                                 "t": now}
            return sid

        def _stream_append(sid, chunk):
            """Append a chunk; return (tail_wave, seed) or None if unknown/
            expired."""
            with sessions_lock:
                s = sessions.get(sid)
                now = time.monotonic()
                if s is None or now - s["t"] > stream_ttl_s:
                    sessions.pop(sid, None)
                    return None
                if s["wave"].dtype != chunk.dtype:
                    # sessions may mix pcm16 and float chunks: widen to f32
                    def f32(w):
                        return (w.astype(np.float32) / 32768.0
                                if w.dtype == np.int16 else w)

                    s["wave"], chunk = f32(s["wave"]), f32(chunk)
                s["wave"] = np.concatenate([s["wave"], chunk])[-max_samples:]
                s["t"] = now
                return s["wave"], s["seed"]

        multitask = predictor.model.pred == "multitask"
        classes = None if multitask else _CLASS_NAMES[predictor.model.pred]
        cloaked = isinstance(predictor, CloakedPredictor)

        def _payload(probs):
            """JSON body for one request's probabilities (B rows)."""
            if isinstance(probs, dict):  # multitask: one block per head
                return {"tasks": {
                    task: {
                        "classes": list(_CLASS_NAMES[task]),
                        "probs": p.tolist(),
                        "labels": [_CLASS_NAMES[task][i]
                                   for i in p.argmax(-1)],
                    }
                    for task, p in probs.items()
                }}
            return {"classes": list(classes), "probs": probs.tolist(),
                    "labels": [classes[i] for i in probs.argmax(-1)]}

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok",
                                     "pred": predictor.model.pred,
                                     "cloaked": cloaked})
                elif self.path == "/metrics":
                    self._send(200, _metrics())
                else:
                    self._send(404, {"error": "unknown route"})

            def _read_json(self):
                n = int(self.headers.get("Content-Length", 0))
                if not 0 <= n <= max_body_mb * 1024 * 1024:
                    # refuse before buffering (a negative length would make
                    # rfile.read(-1) buffer until EOF).  Drain a bounded
                    # amount in small chunks so a well-behaved oversized
                    # sender can finish and read the 400 instead of hitting
                    # a connection reset; memory stays at one chunk.
                    try:
                        remaining = min(max(n, 0), 64 << 20)
                        while remaining > 0:
                            chunk = self.rfile.read(min(65536, remaining))
                            if not chunk:
                                break
                            remaining -= len(chunk)
                    except Exception:
                        pass
                    self.close_connection = True
                    raise ValueError(
                        f"request body {n} bytes exceeds the "
                        f"{max_body_mb:g} MiB limit"
                    )
                raw = self.rfile.read(n)
                return json.loads(raw) if raw else {}

            def _fail(self, code, obj):
                """4xx/5xx response, counted in errors_total."""
                with stats_lock:
                    stats["errors_total"] += 1
                self._send(code, obj)

            @staticmethod
            def _decode_pcm16(b64):
                import base64

                return np.frombuffer(base64.b64decode(b64), "<i2")

            def do_DELETE(self):
                if not self.path.startswith("/stream/"):
                    return self._send(404, {"error": "unknown route"})
                sid = self.path[len("/stream/"):]
                with sessions_lock:
                    known = sessions.pop(sid, None) is not None
                if known:
                    self._send(200, {"closed": sid})
                else:
                    self._send(404, {"error": f"unknown session {sid!r}"})

            def _do_stream(self):
                if self.path == "/stream":  # create
                    try:
                        req = self._read_json()
                        if not isinstance(req, dict):
                            # .get on a list/int body would AttributeError
                            # past the except and drop the connection
                            raise ValueError("body must be a JSON object")
                        seed = int(req.get("seed", 0) or 0)
                    except (ValueError, TypeError, json.JSONDecodeError) as e:
                        return self._fail(400, {"error": str(e)})
                    return self._send(200, {"session": _stream_create(seed)})
                sid = self.path[len("/stream/"):]
                try:
                    req = self._read_json()
                    if "pcm16" in req:
                        chunk = self._decode_pcm16(req["pcm16"])
                    else:
                        chunk = np.asarray(req["samples"], np.float32)
                    if chunk.ndim != 1 or not len(chunk):
                        raise ValueError(
                            "chunk must be non-empty 1-D audio samples")
                except (ValueError, KeyError, TypeError,
                        json.JSONDecodeError) as e:
                    return self._fail(400, {"error": str(e)})
                got = _stream_append(sid, chunk)
                if got is None:
                    return self._fail(
                        404, {"error": f"unknown or expired session {sid!r}"})
                wave, seed = got
                if len(wave) < min_samples:
                    # not enough audio for one reflect-padded STFT frame yet
                    # (the pad would exceed the signal); keep buffering
                    return self._send(200, {
                        "samples": int(len(wave)), "buffered": True,
                        "need_samples": int(min_samples)})
                try:
                    # direct dispatch, NOT the micro-batcher: a long session
                    # tail merged with short /predict requests would pad the
                    # whole device batch up to the stream's length bucket
                    probs = _timed_predict([wave], seed, 1)
                except Exception as e:
                    return self._fail(
                        500, {"error": f"{type(e).__name__}: {e}"})
                if isinstance(probs, dict):
                    body = {"tasks": {
                        task: {"classes": list(_CLASS_NAMES[task]),
                               "probs": p[0].tolist(),
                               "label": _CLASS_NAMES[task][int(p[0].argmax())]}
                        for task, p in probs.items()
                    }}
                else:
                    body = {"classes": list(classes),
                            "probs": probs[0].tolist(),
                            "label": classes[int(probs[0].argmax())]}
                body["samples"] = int(len(wave))
                self._send(200, body)

            def do_POST(self):
                if self.path == "/stream" or self.path.startswith("/stream/"):
                    with stats_lock:
                        stats["requests_total"] += 1
                    return self._do_stream()
                if self.path != "/predict":
                    return self._send(404, {"error": "unknown route"})
                with stats_lock:
                    stats["requests_total"] += 1
                try:
                    req = self._read_json()
                    if "waveforms_pcm16" in req:
                        waves = [self._decode_pcm16(b)
                                 for b in req["waveforms_pcm16"]]
                        if not waves or any(not len(w) for w in waves):
                            raise ValueError(
                                "waveforms_pcm16 entries must be base64 of "
                                "non-empty little-endian int16 PCM"
                            )
                    else:
                        waves = [np.asarray(w, np.float32)
                                 for w in req["waveforms"]]
                        if not waves or any(w.ndim != 1 or not len(w)
                                            for w in waves):
                            raise ValueError(
                                "waveforms must be non-empty 1-D sample lists"
                            )
                    if any(len(w) < min_samples for w in waves):
                        # the reflect pad of the center-STFT needs
                        # len > n_fft//2; fail as a 400 here, not a 500
                        # ValueError from np.pad deep in the model path
                        raise ValueError(
                            f"each waveform needs >= {min_samples} samples "
                            f"(n_fft//2 + 1) at 16 kHz"
                        )
                    seed = int(req.get("seed", 0) or 0)
                except (ValueError, KeyError, TypeError,
                        json.JSONDecodeError) as e:
                    return self._fail(400, {"error": str(e)})
                try:
                    probs = predict_waves(waves, seed)
                except Exception as e:  # any model/backend failure -> 500,
                    # never a dropped connection with no HTTP response
                    return self._fail(
                        500, {"error": f"{type(e).__name__}: {e}"}
                    )
                self._send(200, _payload(probs))

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]

    def serve_forever(self):
        self._httpd.serve_forever()

    def shutdown(self):
        # HTTP first: once no new requests can arrive, the batcher sentinel
        # drains whatever is queued and exits (requests that slip through
        # the race fall back to direct dispatch — predict_waves)
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._batcher_thread is not None:
            self._batch_queue.put(None)  # sentinel: drain and exit
            self._batcher_thread.join(timeout=30)
            self._batcher_thread = None
