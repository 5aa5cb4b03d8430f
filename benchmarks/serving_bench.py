"""Serving latency/throughput benchmark over real HTTP on one chip.

Measures the deployment surface end to end (JSON parse + H2D + device
program + D2H + JSON reply) with a dummy-initialized workhorse model at the
production geometry (win 200, 128 mels, hidden 64):

1. single-utterance warm latency (p50/p90 over N requests, float and pcm16
   wire formats);
2. batch-8 latency (one request, 8 waveforms);
3. micro-batched throughput: 8 concurrent single-utterance clients against
   ``--batch_window_ms 5`` vs sequential dispatch.

Writes benchmarks/serving_bench.json and prints it.  Run on the real chip:

    python benchmarks/serving_bench.py [--n 30]

The numbers quoted in docs/ARCHITECTURE.md §6b come from this script.
"""

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SR = 16000


def _post(base, obj):
    req = urllib.request.Request(f"{base}/predict",
                                 data=json.dumps(obj).encode())
    return json.load(urllib.request.urlopen(req))


def _quantiles(ms):
    q = np.percentile(ms, [50, 90])
    return {"p50_ms": round(float(q[0]), 1), "p90_ms": round(float(q[1]), 1),
            "n": len(ms)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=30, help="requests per stage")
    ap.add_argument("--dur_s", type=float, default=2.5)
    args = ap.parse_args()

    from sept_tpu.cli.common import setup_seed

    setup_seed()
    import jax
    import jax.numpy as jnp

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.serve import Predictor, PredictionServer

    model = Conv2dBiRNN(hidden_size=64, pred="emotion")
    v = jax.jit(model.init)({"params": jax.random.PRNGKey(8)},
                            jnp.zeros((1, 200, 128, 1)))
    rng = np.random.default_rng(8)
    n_samp = int(args.dur_s * SR)
    pcm = [np.clip(np.rint(0.3 * rng.standard_normal(n_samp) * 32768),
                   -32768, 32767).astype(np.int16) for _ in range(8)]
    floats = [w.astype(np.float32) / 32768.0 for w in pcm]
    b64 = [base64.b64encode(w.tobytes()).decode() for w in pcm]

    def predictor():
        return Predictor(v["params"], v["batch_stats"], hidden_size=64,
                         feature_len=128, win_len=200, shift_len=50)

    result = {"device": str(jax.devices()[0]), "utt_s": args.dur_s}

    # ---- stage 1+2: sequential server (no micro-batching) ----
    server = PredictionServer(predictor(), port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    # warm every (bucket, dtype) program used below: _predict jit-
    # specializes on input dtype (int16 PCM stages stay int16 across
    # host->device), so float warmup does NOT warm the pcm16 programs —
    # the first timed pcm16 request would pay a full multi-minute tunnel
    # compile, inflating p90 by orders of magnitude
    _post(base, {"waveforms": [floats[0].tolist()]})
    _post(base, {"waveforms": [w.tolist() for w in floats]})
    _post(base, {"waveforms_pcm16": [b64[0]]})
    _post(base, {"waveforms_pcm16": b64})

    for key, body in (
        ("single_float", lambda i: {"waveforms": [floats[i % 8].tolist()]}),
        ("single_pcm16", lambda i: {"waveforms_pcm16": [b64[i % 8]]}),
    ):
        ms = []
        for i in range(args.n):
            t0 = time.perf_counter()
            _post(base, body(i))
            ms.append((time.perf_counter() - t0) * 1e3)
        result[key] = _quantiles(ms)

    ms = []
    for _ in range(max(args.n // 3, 5)):
        t0 = time.perf_counter()
        _post(base, {"waveforms_pcm16": b64})
        ms.append((time.perf_counter() - t0) * 1e3)
    result["batch8_pcm16"] = _quantiles(ms)

    # sequential 8-client throughput reference
    t0 = time.perf_counter()
    for i in range(8):
        _post(base, {"waveforms_pcm16": [b64[i]]})
    result["seq8_total_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    server.shutdown()

    # ---- stage 3: 8 concurrent clients against the micro-batcher ----
    server = PredictionServer(predictor(), port=0, batch_window_ms=5)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://{server.host}:{server.port}"
    _post(base, {"waveforms_pcm16": [b64[0]]})  # warm rows-1
    _post(base, {"waveforms_pcm16": b64})  # warm rows-8
    for rows in (2, 4):  # partial-coalesce buckets
        _post(base, {"waveforms_pcm16": b64[:rows]})

    def fire(i, out):
        t0 = time.perf_counter()
        try:
            _post(base, {"waveforms_pcm16": [b64[i]]})
        except Exception as e:  # a failed request must not masquerade as
            print(f"concurrent request {i} failed: {e}", flush=True)
            return  # ...a 0.0 ms latency in the stats
        out[i] = (time.perf_counter() - t0) * 1e3

    best_total, lat = None, None
    for _ in range(max(args.n // 6, 3)):
        out = [float("nan")] * 8
        t0 = time.perf_counter()
        threads = [threading.Thread(target=fire, args=(i, out))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(600)
        total = (time.perf_counter() - t0) * 1e3
        # a round with a failed request finished 7 requests' work — letting
        # it win best_total would overstate vs_sequential
        if all(np.isfinite(x) for x in out) and (
                best_total is None or total < best_total):
            best_total, lat = total, out
    degraded = lat is None
    if degraded:  # every round had a failure: report the last one, MARKED —
        # its wall time covers <8 completed requests, so the speedup ratio
        # would overstate micro-batching and is withheld
        best_total, lat = total, out
    ok_lat = [x for x in lat if np.isfinite(x)]
    result["concurrent8_microbatch"] = {
        "total_ms": round(best_total, 1),
        "requests_ok": len(ok_lat),
        "per_request_p50_ms": (
            round(float(np.percentile(ok_lat, 50)), 1) if ok_lat else None),
        "vs_sequential": (None if degraded
                          else round(result["seq8_total_ms"] / best_total, 2)),
        **({"note": "every concurrent round had a failed request; "
                    "total_ms covers an incomplete round"} if degraded else {}),
    }
    m = json.load(urllib.request.urlopen(f"{base}/metrics"))
    result["microbatch_occupancy"] = m.get("waveforms_per_device_call")
    server.shutdown()

    with open(os.path.join(HERE, "serving_bench.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
