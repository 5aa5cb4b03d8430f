"""Serving API: waveform in, calibrated probabilities out."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sept_tpu.models import Conv2dBiRNN
from sept_tpu.serve import CloakedPredictor, Predictor

D, WIN = 32, 60


def _trained_dummy():
    model = Conv2dBiRNN(hidden_size=8, pred="emotion")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    return v["params"], v["batch_stats"]


def test_predictor_shapes_and_distribution(rng):
    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15, n_fft=800)
    waves = [rng.standard_normal(12000 + 2000 * i).astype(np.float32)
             for i in range(3)]
    probs = p.predict(waves)
    assert probs.shape == (3, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert (probs >= 0).all()


def test_cloaked_predictor_changes_output(rng):
    params, stats = _trained_dummy()
    noise_params = {
        "locs": jnp.full((WIN, D), 0.0),
        "rhos": jnp.full((WIN, D), 2.0),  # large scales -> strong noise
    }
    waves = [rng.standard_normal(12000).astype(np.float32)]
    clean = Predictor(params, stats, hidden_size=8, feature_len=D,
                      win_len=WIN, shift_len=15).predict(waves)
    cloaked = CloakedPredictor(
        params, stats, hidden_size=8, feature_len=D, win_len=WIN,
        shift_len=15, noise_params=noise_params, max_scale=5.0,
    ).predict(waves)
    assert cloaked.shape == clean.shape
    assert float(np.abs(cloaked - clean).max()) > 1e-4
    # deterministic under the same seed
    again = CloakedPredictor(
        params, stats, hidden_size=8, feature_len=D, win_len=WIN,
        shift_len=15, noise_params=noise_params, max_scale=5.0,
    ).predict(waves, seed=0)
    np.testing.assert_allclose(cloaked, again, atol=1e-6)


@pytest.mark.slow
def test_deep_model_predictor_uses_flatten_pooling(rng):
    """Regression: a deep-model checkpoint is trained with pooling=None
    (flatten); the Predictor must apply the same pooling or dense1's width
    mismatches at inference."""
    from sept_tpu.models import DeepConv2dBiRNN

    model = DeepConv2dBiRNN(hidden_size=8, pred="emotion")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(lambda a: model.init(
        {"params": jax.random.PRNGKey(0)}, a, pooling=None))(x)
    p = Predictor(v["params"], v["batch_stats"],
                  model_type="deep-2d-cnn-lstm", hidden_size=8,
                  feature_len=D, win_len=WIN, shift_len=15)
    waves = [rng.standard_normal(12000).astype(np.float32)]
    probs = p.predict(waves)
    assert probs.shape == (1, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_http_server_routes(rng):
    """The HTTP deployment surface: healthz, predict, and error handling."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{server.host}:{server.port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health == {"status": "ok", "pred": "emotion",
                          "cloaked": False}

        waves = [rng.standard_normal(12000).tolist(),
                 rng.standard_normal(14000).tolist()]
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms": waves}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.load(urllib.request.urlopen(req))
        assert out["classes"] == ["neu", "hap", "sad", "ang"]
        probs = np.asarray(out["probs"])
        assert probs.shape == (2, 4)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
        assert all(lbl in out["classes"] for lbl in out["labels"])
        # matches the in-process API
        direct = p.predict([np.asarray(w, np.float32) for w in waves])
        np.testing.assert_allclose(probs, direct, atol=1e-6)

        # malformed request -> 400, unknown route -> 404
        bad = urllib.request.Request(
            f"{base}/predict", data=json.dumps({"waveforms": []}).encode()
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/nope")
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


@pytest.mark.slow
def test_load_predictor_from_artifacts(rng, tmp_path):
    """load_predictor rebuilds clean and cloaked predictors from the
    on-disk artifact layout the training CLIs write."""
    from sept_tpu.serve import load_predictor
    from sept_tpu.train.checkpoint import CheckpointManager

    params, stats = _trained_dummy()
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("baseline_emotion", 1, params, stats)
    noise = {
        "locs": np.zeros((WIN, D), np.float32),
        # varied scales so the percentile mask has something to suppress
        "rhos": np.linspace(-2.0, 2.0, WIN * D,
                            dtype=np.float32).reshape(WIN, D),
    }
    ckpt.save("cloak_lamda0.1_supp40", 1, {"noise": noise})

    clean = load_predictor(str(tmp_path), hidden_size=8, feature_len=D,
                           win_len=WIN)
    cloaked = load_predictor(str(tmp_path), cloak_artifact="cloak_lamda0.1_supp40",
                             suppression_ratio=40, hidden_size=8,
                             feature_len=D, win_len=WIN)
    assert isinstance(cloaked, CloakedPredictor)
    # the eval-direction mask suppresses high-scale cells
    assert cloaked.mask is not None and float(cloaked.mask.mean()) < 1.0
    waves = [rng.standard_normal(12000).astype(np.float32)]
    a, b = clean.predict(waves), cloaked.predict(waves)
    assert a.shape == b.shape == (1, 4)
    assert float(np.abs(a - b).max()) > 1e-5


def test_http_bad_seed_and_internal_error_are_http_errors(rng):
    """Parseable-but-invalid requests must get a 400 and model failures a
    500 — never a dropped connection with no HTTP response."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    wave = rng.standard_normal(12000).tolist()
    try:
        for bad_seed in ("abc", [1]):
            req = urllib.request.Request(
                f"{base}/predict",
                data=json.dumps({"waveforms": [wave],
                                 "seed": bad_seed}).encode(),
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400

        # an internal predictor failure surfaces as a JSON 500
        p.params = {"broken": jnp.zeros((1,))}
        req = urllib.request.Request(
            f"{base}/predict", data=json.dumps({"waveforms": [wave]}).encode()
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.load(e)
    finally:
        server.shutdown()


def test_predict_bucketing_is_transparent(rng):
    """Shape bucketing (frames to win_len multiples, rows to powers of two)
    must not change the predictions: a waveform scores identically alone and
    inside a mixed-length batch."""
    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    w1 = rng.standard_normal(12000).astype(np.float32)
    w2 = rng.standard_normal(17500).astype(np.float32)
    w3 = rng.standard_normal(9000).astype(np.float32)
    alone = p.predict([w1])
    batched = p.predict([w1, w2, w3])
    assert batched.shape == (3, 4)
    np.testing.assert_allclose(alone[0], batched[0], atol=1e-5)


@pytest.mark.slow
def test_load_predictor_reads_training_manifest(rng, tmp_path):
    """With no overrides, load_predictor builds the model from the
    manifest_fold<k>.json written at training time (a mismatch would fail
    opaquely or silently drop the trained attention pooling)."""
    import json

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.serve import load_predictor
    from sept_tpu.train.checkpoint import CheckpointManager

    model = Conv2dBiRNN(hidden_size=16, pred="gender")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("adv_baseline_gender", 2, v["params"], v["batch_stats"])
    with open(tmp_path / "adv_baseline_gender" / "manifest_fold2.json",
              "w") as f:
        json.dump({"config": {"model_type": "2d-cnn-lstm", "pred": "gender",
                              "hidden_size": 16, "feature_len": D,
                              "win_len": WIN, "att": None,
                              "attention_size": 128,
                              "global_feature": False}}, f)

    p = load_predictor(str(tmp_path), "adv_baseline_gender", 2)
    assert p.model.hidden_size == 16 and p.model.pred == "gender"
    assert p.win_len == WIN and p.feature_len == D
    probs = p.predict([rng.standard_normal(12000).astype(np.float32)])
    assert probs.shape == (1, 2)  # gender head

    # a global_feature=1 manifest is refused with a clear error
    with open(tmp_path / "adv_baseline_gender" / "manifest_fold2.json",
              "w") as f:
        json.dump({"config": {"global_feature": True}}, f)
    with pytest.raises(ValueError, match="global_feature"):
        load_predictor(str(tmp_path), "adv_baseline_gender", 2)
    # unknown override names are rejected, not silently ignored
    with pytest.raises(TypeError, match="unknown"):
        load_predictor(str(tmp_path), "adv_baseline_gender", 2,
                       hidden_sizes=32)


def test_healthz_responsive_while_predict_holds_the_device(rng):
    """/predict runs under a device lock on a threading server, so /healthz
    answers while a slow prediction (or a novel-shape compile) is in
    flight."""
    import json
    import threading
    import time
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    slow_started = threading.Event()

    real_predict = p.predict

    def slow_predict(waves, seed=0):
        slow_started.set()
        time.sleep(1.5)
        return real_predict(waves, seed)

    p.predict = slow_predict
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    wave = rng.standard_normal(12000).tolist()
    try:
        slow = threading.Thread(
            target=urllib.request.urlopen,
            args=(urllib.request.Request(
                f"{base}/predict",
                data=json.dumps({"waveforms": [wave]}).encode()),),
            daemon=True,
        )
        slow.start()
        assert slow_started.wait(10)
        t0 = time.perf_counter()
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        dt = time.perf_counter() - t0
        assert health["status"] == "ok"
        assert dt < 1.0, f"healthz blocked for {dt:.2f}s behind /predict"
        slow.join(30)
    finally:
        server.shutdown()


@pytest.mark.slow
def test_bucketing_shape_is_pure_function_of_buckets(rng):
    """The jit shape must depend only on (row bucket, frame bucket): raw
    sample lengths inside one bucket — including lengths whose frame count
    already sits on a win_len multiple — reuse one compiled program."""
    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    # the jit cache hangs off the CLASS (one decorated method object), so
    # measure deltas — other tests may already have populated it
    base = p._predict._cache_size()
    # WIN=60 frames -> bucket boundary at 60 frames = 9440..9599 samples
    # (hop 160): every length here lands in the same (1 row, 60 frame)
    # bucket even though the raw padded widths differ
    for n in (9441, 9500, 9598, 8000, 9300):
        p.predict([rng.standard_normal(n).astype(np.float32)])
    assert p._predict._cache_size() == base + 1
    # 65 waves -> row bucket 128 (power of two above the old 64 cap)
    p.predict([rng.standard_normal(9000).astype(np.float32)
               for _ in range(65)])
    assert p._predict._cache_size() == base + 2


def test_norm_stats_path_masks_pad_frames(rng):
    """With fixed corpus norm stats, bucketing pads the frame axis; the pad
    frames must be masked to zero exactly like the per-utterance branch, or
    normalized dB-of-silence leaks into window 0 of short utterances."""
    params, stats = _trained_dummy()
    kw = dict(hidden_size=8, feature_len=D, win_len=WIN, shift_len=15,
              norm_stats=(np.zeros((D,), np.float32),
                          np.ones((D,), np.float32)))
    p = Predictor(params, stats, **kw)
    w = rng.standard_normal(6000).astype(np.float32)  # ~38 frames < WIN
    alone = p.predict([w])
    # same wave inside a batch with a longer one (bigger frame bucket):
    # identical probabilities for the short wave
    longer = rng.standard_normal(18000).astype(np.float32)
    batched = Predictor(params, stats, **kw).predict([w, longer])
    np.testing.assert_allclose(alone[0], batched[0], atol=1e-5)


def test_predict_accepts_int16_pcm(rng):
    """Raw int16 PCM waveforms predict identically to their float32
    normalization (staged at half the bytes, normalized on device —
    ops/frontend.py::pcm_to_float)."""
    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    pcm = [rng.integers(-32768, 32768, 12000 + 2000 * i).astype(np.int16)
           for i in range(3)]
    f32 = [w.astype(np.float32) / 32768.0 for w in pcm]
    np.testing.assert_allclose(p.predict(pcm), p.predict(f32), atol=1e-6)
    # mixed int16 + float32 batches normalize on host, same result
    mixed = [pcm[0], f32[1], pcm[2]]
    np.testing.assert_allclose(p.predict(mixed), p.predict(f32), atol=1e-6)


def test_http_pcm16_route(rng):
    """The compact wire format: base64 int16 PCM bodies predict identically
    to the JSON float path."""
    import base64
    import json
    import threading
    import urllib.error
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    pcm = [rng.integers(-32768, 32768, n).astype(np.int16)
           for n in (12000, 14000)]
    try:
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms_pcm16": [
                base64.b64encode(w.astype("<i2").tobytes()).decode()
                for w in pcm
            ]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.load(urllib.request.urlopen(req))
        probs = np.asarray(out["probs"])
        assert probs.shape == (2, 4)
        direct = p.predict([w.astype(np.float32) / 32768.0 for w in pcm])
        np.testing.assert_allclose(probs, direct, atol=1e-6)

        # empty / undecodable pcm16 entries -> 400
        for bad in ([""], ["!!!not-base64!!!"]):
            req = urllib.request.Request(
                f"{base}/predict",
                data=json.dumps({"waveforms_pcm16": bad}).encode(),
            )
            try:
                urllib.request.urlopen(req)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()


def test_micro_batching_coalesces_concurrent_requests(rng):
    """With batch_window_ms on, concurrent same-seed requests run as ONE
    predictor call and every caller gets its own slice, identical to
    individual dispatch."""
    import json
    import threading
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    calls = []
    real_predict = p.predict

    def counting_predict(waves, seed=0):
        calls.append(len(waves))
        return real_predict(waves, seed)

    p.predict = counting_predict
    # warm EVERY row bucket a 4-way split can produce (4, 2+2, 3+1, ...) so
    # no compile lands inside the timed window (minutes on a real chip)
    waves = [rng.standard_normal(12000).astype(np.float32)
             for _ in range(4)]
    real_predict(waves)
    real_predict(waves[:2])
    real_predict(waves[:1])
    calls.clear()

    server = PredictionServer(p, port=0, batch_window_ms=300)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    results = [None] * 4

    def fire(i):
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms": [waves[i].tolist()]}).encode(),
        )
        results[i] = json.load(urllib.request.urlopen(req))

    try:
        threads = [threading.Thread(target=fire, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert all(r is not None for r in results)
        # fewer predictor calls than requests: at least some coalesced
        assert len(calls) < 4, calls
        assert sum(calls) == 4, calls
        direct = real_predict(waves)
        for i, r in enumerate(results):
            np.testing.assert_allclose(
                np.asarray(r["probs"])[0], direct[i], atol=1e-5)
    finally:
        server.shutdown()


def test_micro_batching_keeps_seeds_separate(rng):
    """Different seeds must NOT merge (cloak noise is seed-driven): each
    seed's batched result equals its individual dispatch."""
    import json
    import threading
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    noise_params = {
        "locs": jnp.zeros((WIN, D)),
        "rhos": jnp.full((WIN, D), 2.0),
    }
    p = CloakedPredictor(params, stats, hidden_size=8, feature_len=D,
                         win_len=WIN, shift_len=15,
                         noise_params=noise_params, max_scale=5.0)
    wave = rng.standard_normal(12000).astype(np.float32)
    direct = {s: p.predict([wave], seed=s) for s in (0, 7)}

    server = PredictionServer(p, port=0, batch_window_ms=200)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    results = {}

    def fire(seed):
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms": [wave.tolist()],
                             "seed": seed}).encode(),
        )
        results[seed] = np.asarray(
            json.load(urllib.request.urlopen(req))["probs"])

    try:
        threads = [threading.Thread(target=fire, args=(s,)) for s in (0, 7)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        for s in (0, 7):
            np.testing.assert_allclose(results[s][0], direct[s][0], atol=1e-5)
        assert np.abs(direct[0][0] - direct[7][0]).max() > 1e-6
    finally:
        server.shutdown()


def test_micro_batching_propagates_errors(rng):
    """A failing batched prediction returns HTTP 500 to every caller in the
    group instead of hanging them."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    p.params = {"broken": jnp.zeros((1,))}
    server = PredictionServer(p, port=0, batch_window_ms=100)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    wave = rng.standard_normal(12000).tolist()
    codes = []

    def fire():
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms": [wave]}).encode(),
        )
        try:
            urllib.request.urlopen(req)
            codes.append(200)
        except urllib.error.HTTPError as e:
            codes.append(e.code)

    try:
        threads = [threading.Thread(target=fire) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(120)
        assert codes == [500, 500, 500], codes
    finally:
        server.shutdown()


def test_metrics_endpoint(rng):
    """/metrics exposes request counters, device-call latency quantiles and
    micro-batch stats."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    try:
        m0 = json.load(urllib.request.urlopen(f"{base}/metrics"))
        assert m0["requests_total"] == 0 and "device_call_ms" not in m0

        waves = [rng.standard_normal(12000).tolist()]
        for _ in range(2):
            req = urllib.request.Request(
                f"{base}/predict",
                data=json.dumps({"waveforms": waves}).encode())
            urllib.request.urlopen(req)
        # one malformed request counts as an error
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/predict", data=b'{"waveforms": []}'))
        except urllib.error.HTTPError:
            pass

        m = json.load(urllib.request.urlopen(f"{base}/metrics"))
        assert m["requests_total"] == 3
        assert m["errors_total"] == 1
        assert m["device_calls_total"] == 2
        assert m["waveforms_total"] == 2
        assert m["device_call_ms"]["p50"] > 0
        assert m["device_call_ms"]["p99"] >= m["device_call_ms"]["p50"]
        assert m["waveforms_per_device_call"] == {"mean": 1.0, "max": 1}
        assert m["micro_batching"] is None
    finally:
        server.shutdown()


def _open(url, data=None, method=None):
    import json as _json
    import urllib.request

    req = urllib.request.Request(
        url, data=None if data is None else _json.dumps(data).encode(),
        method=method)
    return _json.load(urllib.request.urlopen(req))


def test_streaming_session_rolling_prediction(rng):
    """Push chunks, read a rolling prediction over the accumulated tail;
    the final push must equal a one-shot /predict of the same samples."""
    import base64
    import threading
    import urllib.error

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    pcm = rng.integers(-32768, 32768, 12000).astype(np.int16)
    try:
        sid = _open(f"{base}/stream", {})["session"]
        outs = []
        for lo in range(0, 12000, 4000):
            chunk = pcm[lo : lo + 4000]
            outs.append(_open(
                f"{base}/stream/{sid}",
                {"pcm16": base64.b64encode(chunk.tobytes()).decode()}))
        assert [o["samples"] for o in outs] == [4000, 8000, 12000]
        direct = p.predict([pcm])
        np.testing.assert_allclose(outs[-1]["probs"], direct[0], atol=1e-5)
        assert outs[-1]["label"] in outs[-1]["classes"]

        # mixed float chunk widens the session, still predicts
        out = _open(f"{base}/stream/{sid}",
                    {"samples": rng.standard_normal(2000).tolist()})
        assert out["samples"] == 14000

        # close; further pushes are 404
        assert _open(f"{base}/stream/{sid}", method="DELETE") == {
            "closed": sid}
        try:
            _open(f"{base}/stream/{sid}", {"samples": [0.1, 0.2]})
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


def test_streaming_tail_window_and_ttl(rng):
    """The session keeps only max_stream_s of audio, and expired sessions
    answer 404."""
    import threading
    import time
    import urllib.error

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    # 1 s tail at 16 kHz, 1.5 s ttl
    server = PredictionServer(p, port=0, max_stream_s=1.0, stream_ttl_s=1.5)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    try:
        w = rng.standard_normal(12000).astype(np.float32)
        # warm the shape bucket OUTSIDE the session: a first-push compile
        # longer than the ttl would expire the session mid-test
        p.predict([w], seed=3)
        sid = _open(f"{base}/stream", {"seed": 3})["session"]
        out = _open(f"{base}/stream/{sid}", {"samples": w.tolist()})
        assert out["samples"] == 12000
        out = _open(f"{base}/stream/{sid}", {"samples": w.tolist()})
        assert out["samples"] == 16000  # trailing 1 s only
        # prediction equals one-shot over exactly the trailing window
        tail = np.concatenate([w, w])[-16000:]
        np.testing.assert_allclose(out["probs"], p.predict([tail], seed=3)[0],
                                   atol=1e-5)
        time.sleep(1.6)  # expire
        try:
            _open(f"{base}/stream/{sid}", {"samples": [0.1, 0.2]})
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


@pytest.mark.slow
def test_multitask_predictor_and_server(rng):
    """A pred='multitask' artifact serves both heads: dict from predict(),
    a per-task block over HTTP, and a rolling stream prediction."""
    import json
    import threading
    import urllib.request

    from sept_tpu.serve import PredictionServer

    model = Conv2dBiRNN(hidden_size=8, pred="multitask")
    x = jnp.zeros((1, WIN, D, 1))
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)
    p = Predictor(v["params"], v["batch_stats"], pred="multitask",
                  hidden_size=8, feature_len=D, win_len=WIN, shift_len=15)
    waves = [rng.standard_normal(12000 + 2000 * i).astype(np.float32)
             for i in range(2)]
    out = p.predict(waves)
    assert set(out) == {"emotion", "gender"}
    assert out["emotion"].shape == (2, 4) and out["gender"].shape == (2, 2)
    np.testing.assert_allclose(out["emotion"].sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(out["gender"].sum(-1), 1.0, atol=1e-5)

    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    try:
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"waveforms": [w.tolist() for w in waves]
                             }).encode())
        body = json.load(urllib.request.urlopen(req))
        assert set(body["tasks"]) == {"emotion", "gender"}
        emo = body["tasks"]["emotion"]
        assert emo["classes"] == ["neu", "hap", "sad", "ang"]
        np.testing.assert_allclose(np.asarray(emo["probs"]), out["emotion"],
                                   atol=1e-5)
        gen = body["tasks"]["gender"]
        assert gen["classes"] == ["F", "M"] and len(gen["labels"]) == 2

        # streaming push reports both heads too
        sid = _open(f"{base}/stream", {})["session"]
        got = _open(f"{base}/stream/{sid}",
                    {"samples": waves[0].tolist()})
        assert set(got["tasks"]) == {"emotion", "gender"}
        assert got["tasks"]["gender"]["label"] in ("F", "M")
        assert got["samples"] == len(waves[0])
    finally:
        server.shutdown()


def test_oversized_request_body_is_refused(rng):
    """Bodies over max_body_mb are refused before being buffered."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0, max_body_mb=0.001)  # ~1 KiB
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    try:
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps(
                {"waveforms": [rng.standard_normal(4000).tolist()]}).encode())
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "exceeds" in json.load(e)["error"]
    finally:
        server.shutdown()


def test_malformed_and_short_input_edges(rng):
    """Input edges answer with HTTP status codes, never dropped connections.

    - POST /stream with a non-object JSON body -> 400 (a list used to
      AttributeError past the except tuple and reset the connection);
    - /predict with a wave shorter than n_fft//2+1 -> 400 (used to 500
      with an opaque np.pad ValueError from inside the model path);
    - a short first stream chunk buffers (200, no probs) until the
      accumulated session clears the frontend minimum.
    """
    import threading
    import urllib.error

    from sept_tpu.serve import PredictionServer

    params, stats = _trained_dummy()
    p = Predictor(params, stats, hidden_size=8, feature_len=D,
                  win_len=WIN, shift_len=15)
    server = PredictionServer(p, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    try:
        try:
            _open(f"{base}/stream", [1, 2])
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        short = rng.standard_normal(100).astype(np.float32)
        try:
            _open(f"{base}/predict", {"waveforms": [short.tolist()]})
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "samples" in e.read().decode()

        sid = _open(f"{base}/stream", {})["session"]
        out = _open(f"{base}/stream/{sid}", {"samples": short.tolist()})
        assert out["buffered"] is True and out["samples"] == 100
        assert "probs" not in out
        out = _open(f"{base}/stream/{sid}",
                    {"samples": rng.standard_normal(4000).tolist()})
        assert out["samples"] == 4100 and "probs" in out
    finally:
        server.shutdown()
