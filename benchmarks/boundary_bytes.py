"""Per-op data-movement accounting for the compiled training step
(VERDICT round-3 item 4: attack the 2.04 GB/step fused1 residual, or show
the boundary ops' bytes are already at their minimum).

``roofline.py`` reads the AGGREGATE ``bytes accessed`` from XLA's cost
model; this tool walks the OPTIMIZED HLO of the same compiled program and
attributes bytes to individual instructions, so the residual between the
aggregate and the fusion-perfect floor can be localized to named ops
(copies, transposes, pads, select-and-scatter, conv custom-calls) with
shapes — evidence, not inference, for where the remaining traffic lives.

Byte model per instruction: output bytes + sum of operand bytes (the
conventional touch count; intra-fusion temporaries are invisible, which is
exactly right — fused elementwise traffic is free on the roofline).
Parameters/constants are charged to their consumers only.

Usage (on-chip): python benchmarks/boundary_bytes.py [--batch 32]
                 [--mode fused1|xla|f32] [--top 25] [--out JSONL]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIN, D = 200, 128

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")

# opcodes that are pure data movement when they survive optimization
_MOVEMENT = {
    "copy", "transpose", "reshape", "pad", "slice", "concatenate",
    "reverse", "gather", "scatter", "dynamic-slice", "dynamic-update-slice",
    "select-and-scatter", "reduce-window", "bitcast", "bitcast-convert",
    "copy-start", "copy-done", "all-gather", "all-reduce",
}


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summation)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\))|(?:[\w\[\],{}\s/]+?))\s*"
    r"([\w\-]+)\(")


def parse_hlo(text: str):
    """Yield (name, opcode, out_bytes, line) for every instruction."""
    for line in text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        yield name, opcode, shape_bytes(type_str), line.strip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mode", choices=["fused1", "xla", "f32"],
                    default="fused1")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default=None,
                    help="append a JSON line with the category totals")
    args = ap.parse_args()

    from sept_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from sept_tpu.models import Conv2dBiRNN
    from sept_tpu.train import (
        ExperimentConfig, init_state, make_baseline_step, make_optimizer,
    )

    kw = {
        "fused1": dict(dtype=jnp.bfloat16, conv_backend="fused1"),
        "xla": dict(dtype=jnp.bfloat16),
        "f32": dict(),
    }[args.mode]
    b = args.batch
    cfg = ExperimentConfig(optimizer="sgd", learning_rate=1e-4,
                           hidden_size=64, batch_size=b)
    tx = make_optimizer(cfg, steps_per_epoch=64)
    dummy = {
        "spec": jnp.zeros((b, WIN, D, 1), jnp.float32),
        "labels_emo": jnp.zeros((b,), jnp.int32),
        "labels_gen": jnp.zeros((b,), jnp.int32),
        "global": jnp.zeros((b, 88), jnp.float32),
        "weight": jnp.ones((b,), jnp.float32),
    }
    model = Conv2dBiRNN(hidden_size=64, pred="emotion", **kw)
    state = init_state(model, tx, jax.random.PRNGKey(8), dummy)
    step = make_baseline_step(model, tx)
    compiled = step.lower(state, dummy).compile()
    cost = compiled.cost_analysis() or {}
    hlo = compiled.as_text()

    cats: dict[str, float] = {}
    movers = []
    for name, opcode, out_b, line in parse_hlo(hlo):
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element"):
            continue
        cat = (
            "movement" if opcode in _MOVEMENT
            else "conv" if opcode.startswith("convolution")
            else "dot" if opcode == "dot"
            else "pallas" if opcode == "custom-call" and "tpu_custom_call"
            in line
            else "custom-call" if opcode == "custom-call"
            else "fusion" if opcode == "fusion"
            else "other"
        )
        cats[cat] = cats.get(cat, 0.0) + out_b
        if cat == "movement":
            movers.append((out_b, opcode, name, line[:160]))

    total_out = sum(cats.values())
    print(f"mode={args.mode} batch={b}")
    print(f"XLA cost model: bytes accessed = "
          f"{float(cost.get('bytes accessed', 0))/1e9:.3f} GB, "
          f"flops = {float(cost.get('flops', 0))/1e9:.1f} G")
    print(f"sum of instruction OUTPUT bytes (post-opt HLO) = "
          f"{total_out/1e9:.3f} GB")
    for cat, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {v/1e6:10.1f} MB")
    movers.sort(reverse=True)
    print(f"\ntop {args.top} surviving data-movement ops (output bytes):")
    for out_b, opcode, name, line in movers[:args.top]:
        print(f"  {out_b/1e6:8.2f} MB  {opcode:22s} {line}")
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({
                "mode": args.mode, "batch": b,
                "bytes_accessed": float(cost.get("bytes accessed", 0)),
                "flops": float(cost.get("flops", 0)),
                "category_output_bytes": cats,
                "top_movement": [
                    {"bytes": mb, "op": op, "name": nm}
                    for mb, op, nm, _ in movers[:args.top]
                ],
            }) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
