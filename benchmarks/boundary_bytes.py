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
Operand types are parsed from the instruction's argument list in the
post-optimization HLO text, so a reduce consuming a large tensor into a
scalar is charged its read traffic.  Parameters/constants are charged to
their consumers only.  Category tables report output and operand bytes
separately so either model can be read off.

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


_OPND_RE = re.compile(r"%([\w.\-]+)")


def _strip_braces(s: str) -> str:
    """Remove every ``{...}`` block (layout annotations like
    ``{2,1,0:T(8,128)S(1)}`` and backend_config JSON — both can contain
    parens that would confuse the opcode/operand scan; JSON nests braces,
    so strip innermost-first to a fixed point)."""
    while True:
        t = re.sub(r"\{[^{}]*\}", "", s)
        if t == s:
            return t
        s = t


def _split_instr(line: str):
    """Parse one post-opt HLO instruction line into
    (name, type_str, opcode, operand_names) or None.

    Real TPU HLO references operands by NAME only (``add(%a, %b)``), so
    operand byte attribution needs the caller to resolve names against a
    symbol table of output types (see parse_hlo).  Attributes after the
    operand list (``to_apply=%region``, ``calls=%fused_computation``,
    ``select=%...``) also contain %names — the scan stops at the operand
    list's matching close paren so computation references are not charged
    as data operands.
    """
    s = line.strip()
    if s.startswith("ROOT "):
        s = s[5:]
    if not s.startswith("%"):
        return None
    eq = s.find(" = ")
    if eq < 0:
        return None
    name = s[1:eq]
    rhs = _strip_braces(s[eq + 3:])
    if rhs.startswith("("):  # tuple-typed output
        depth = 0
        end = 0
        for i, ch in enumerate(rhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        type_str, rest = rhs[: end + 1], rhs[end + 1:]
    else:
        sp = rhs.find(" ")
        if sp < 0:
            return None
        type_str, rest = rhs[:sp], rhs[sp + 1:]
    m = re.match(r"\s*([\w\-]+)\(", rest)
    if not m:
        return None
    opcode = m.group(1)
    depth, cut = 1, len(rest)
    for i in range(m.end(), len(rest)):
        ch = rest[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                cut = i
                break
    operand_names = _OPND_RE.findall(rest[m.end():cut])
    return name, type_str, opcode, operand_names


def parse_hlo(text: str):
    """Yield (name, opcode, out_bytes, operand_bytes, line) for every
    instruction in the ENTRY computation.

    Only ENTRY instructions touch HBM buffers the scheduler materializes;
    instructions inside fused computations / reduce regions are free
    (intra-fusion traffic) and are skipped by construction.  Two passes:
    first build a name -> output-bytes symbol table (parameters included),
    then charge each instruction output bytes + sum of its operands' bytes
    looked up by name.
    """
    entry_lines = []
    in_entry = False
    for line in text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            entry_lines.append(line)

    parsed = []
    table: dict = {}
    for line in entry_lines:
        ins = _split_instr(line)
        if ins is None:
            continue
        name, type_str, opcode, opnds = ins
        out_b = shape_bytes(type_str)
        table[name] = out_b
        parsed.append((name, opcode, out_b, opnds, line.strip()))

    for name, opcode, out_b, opnds, line in parsed:
        op_b = sum(table.get(o, 0) for o in opnds)
        yield name, opcode, out_b, op_b, line


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

    cats_out: dict[str, float] = {}
    cats_opnd: dict[str, float] = {}
    top_all = []
    for name, opcode, out_b, op_b, line in parse_hlo(hlo):
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
        cats_out[cat] = cats_out.get(cat, 0.0) + out_b
        cats_opnd[cat] = cats_opnd.get(cat, 0.0) + op_b
        # op_name metadata localizes the instruction to a model layer
        mm = re.search(r'op_name="([^"]*)"', line)
        top_all.append((out_b + op_b, out_b, opcode, cat, name,
                        mm.group(1)[:120] if mm else line[:120]))

    total_out = sum(cats_out.values())
    total_touch = total_out + sum(cats_opnd.values())
    print(f"mode={args.mode} batch={b}")
    print(f"XLA cost model: bytes accessed = "
          f"{float(cost.get('bytes accessed', 0))/1e9:.3f} GB, "
          f"flops = {float(cost.get('flops', 0))/1e9:.1f} G")
    print(f"ENTRY instruction OUTPUT bytes = {total_out/1e9:.3f} GB; "
          f"output+operand = {total_touch/1e9:.3f} GB")
    print(f"  {'category':12s} {'out MB':>10s} {'operand MB':>12s}")
    for cat, v in sorted(cats_out.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:12s} {v/1e6:10.1f} {cats_opnd.get(cat, 0.0)/1e6:12.1f}")
    top_all.sort(reverse=True)
    print(f"\ntop {args.top} ENTRY instructions by out+operand bytes:")
    for tot_b, out_b, opcode, cat, name, where in top_all[:args.top]:
        print(f"  {tot_b/1e6:8.2f} MB ({out_b/1e6:7.2f} out)  "
              f"{opcode:16s} [{cat}] {where}")
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps({
                "mode": args.mode, "batch": b,
                "bytes_accessed": float(cost.get("bytes accessed", 0)),
                "flops": float(cost.get("flops", 0)),
                "entry_output_bytes": total_out,
                "entry_touch_bytes": total_touch,
                "category_output_bytes": cats_out,
                "category_operand_bytes": cats_opnd,
                "top_instructions": [
                    {"bytes": tb, "out_bytes": ob, "op": op, "cat": cat,
                     "name": nm, "op_name": wh}
                    for tb, ob, op, cat, nm, wh in top_all[:args.top]
                ],
            }) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
