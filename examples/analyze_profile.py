"""Join the device trace with the compiled HLO → per-op roofline table.

Inputs: a jax.profiler trace of the headline program (produced by
examples/profile_headline.py, /tmp/headline_trace) and a fresh AOT compile
of the SAME program (for the HLO text — fusion names are deterministic for
an unchanged program+compiler).

For every device fusion this computes:
- total/percent device time (from the trace's `vm.trace.json.gz`),
- FLOPs (convolution ops parsed out of the fused computation),
- achieved TFLOP/s, and
- an MXU roofline bound from the conv's output-channel lane occupancy
  (a C_out-channel conv fills min(C_out,128)/128 of the MXU's output
  lanes; contraction = 9·C_in is lane-filling for every HRNet conv except
  the stem) — the per-op evidence for WHERE the model's ceiling sits.

Writes PROFILE.md.  Run on the TPU (after profile_headline.py):
    PYTHONPATH=/root/repo:/root/.axon_site python examples/analyze_profile.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TFLOPS = 197.0  # v5e bf16 (mul-add = 2 flops)


def load_device_durations(trace_dir: str):
    """{op_name: (total_us, count)} for the TPU device pid."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    device_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return agg, cnt


_DEF_RE = re.compile(r"^\s*(?:ROOT )?%([\w\.\-]+) = (\w+)\[([\d,]*)\]")
_CONV_LINE_RE = re.compile(
    r"^\s*(?:ROOT )?%([\w\.\-]+) = (\w+)\[([\d,]*)\][^\s]* convolution"
    r"\(([^)]*)\),.*?dim_labels=([\w>\-]+)"
)


def parse_hlo_fusions(hlo_text: str):
    """Instruction name -> {"flops", "convs": [(out_shape, kernel_shape,
    cin, cout)]} for every fusion (aggregating convs in its fused
    computation) AND every standalone convolution instruction.

    HLO use sites carry no shapes, so operand shapes come from a global
    instruction-definition map; kernel semantics come from dim_labels
    (rhs labels: digits = spatial, 'i' = C_in, 'o' = C_out)."""
    # Global instruction -> shape map (covers params, fusions, convs, ...).
    shapes = {}
    for line in hlo_text.splitlines():
        m = _DEF_RE.match(line)
        if m:
            shapes[m.group(1)] = [int(x) for x in m.group(3).split(",") if x]
    # Parameter declarations inside computation headers: "param_1.69: bf16[1,1,64,256]"
    for m in re.finditer(r"([\w\.\-]+): \w+\[([\d,]*)\]", hlo_text):
        shapes.setdefault(m.group(1),
                          [int(x) for x in m.group(2).split(",") if x])

    # Split into computations.
    comps = {}
    cur_name, cur_lines = None, []
    for line in hlo_text.splitlines():
        m = re.match(r"^(%?[\w\.\-]+) .*{\s*$", line)
        if m and ("fused_computation" in m.group(1) or line.startswith("ENTRY")
                  or not line.startswith(" ")):
            if cur_name is not None:
                comps[cur_name] = "\n".join(cur_lines)
            cur_name = m.group(1).lstrip("%")
            cur_lines = [line]
        else:
            cur_lines.append(line)
    if cur_name is not None:
        comps[cur_name] = "\n".join(cur_lines)

    def convs_in(comp_text: str):
        found = []
        for line in comp_text.splitlines():
            cm = _CONV_LINE_RE.match(line)
            if not cm:
                continue
            out_shape = [int(x) for x in cm.group(3).split(",") if x]
            operands = [o.strip().lstrip("%").split(" ")[0]
                        for o in cm.group(4).split(",")]
            labels = cm.group(5)
            try:
                rhs = labels.split("_")[1].split("-")[0]
            except IndexError:
                continue
            if len(operands) < 2:
                continue
            kshape = shapes.get(operands[1])
            in_shape = shapes.get(operands[0]) or []
            if not kshape or len(kshape) != len(rhs):
                continue
            spatial = 1
            cin = cout = 1
            for dim, lab in zip(kshape, rhs):
                if lab == "i":
                    cin = dim
                elif lab == "o":
                    cout = dim
                else:
                    spatial *= dim
            n_out = 1
            for d in out_shape:
                n_out *= d
            n_in = 1
            for d in in_shape:
                n_in *= d
            flops = 2 * n_out * spatial * cin
            kelems = 1
            for d in kshape:
                kelems *= d
            # bf16 activations/kernels -> 2 bytes (the dtype prefix is in
            # group 2 but stage-IO is uniformly bf16 in this program).
            bytes_moved = 2 * (n_out + n_in + kelems)
            found.append({"flops": flops, "out": tuple(out_shape),
                          "kernel": tuple(kshape), "cin": cin, "cout": cout,
                          "bytes": bytes_moved,
                          "resample": spatial > 128})
        return found

    out = {}
    call_re = re.compile(
        r"%?([\w\.\-]+) = [^=]*fusion\([^)]*\), kind=(\w+), calls=%?([\w\.\-]+)"
    )
    for body in comps.values():
        for m in call_re.finditer(body):
            convs = convs_in(comps.get(m.group(3), ""))
            out[m.group(1)] = {
                "kind": m.group(2),
                "flops": sum(c["flops"] for c in convs),
                "convs": convs,
            }
    # Standalone convolution instructions (not wrapped in a fusion) appear
    # in non-fused computations under their own instruction names.
    for cname, body in comps.items():
        if "fused_computation" in cname:
            continue
        for line in body.splitlines():
            cm = _CONV_LINE_RE.match(line)
            if cm:
                convs = convs_in(line)
                if convs:
                    out[cm.group(1)] = {
                        "kind": "standalone",
                        "flops": convs[0]["flops"],
                        "convs": convs,
                    }
    return out


def classify(name: str, info) -> str:
    if info and info.get("convs"):
        return "conv"
    n = name.lower()
    if "while" in n:
        return "control"
    if any(k in n for k in ("transpose", "copy")):
        return "layout"
    if "reduce" in n:
        return "reduce"
    if any(k in n for k in ("dot", "conv")):
        return "matmul"
    return "elementwise/other"


def main():
    import time

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/headline_trace_cur"
    hlo_path = "/tmp/headline_hlo.txt"
    T, n_inner = 256, 5
    fps = ca = None

    reuse = (os.path.exists(hlo_path)
             and glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                           recursive=True)
             and "--fresh" not in sys.argv)
    if reuse:
        print(f"reusing {hlo_path} + {trace_dir} (pass --fresh to re-run)")
        hlo = open(hlo_path).read()
    else:
        import jax
        import jax.numpy as jnp

        from profile_headline import build_run_block, compile_once

        run_block, call_args, (T, n_inner) = build_run_block()
        print("compiling (AOT, once)...", flush=True)
        compiled, ca = compile_once(run_block, call_args)
        hlo = compiled.as_text()
        with open(hlo_path, "w") as f:
            f.write(hlo)

        # Steady state (value-forced) + a fresh trace of THIS executable, so
        # the joined fusion names always match the compiled program.
        float(compiled(*call_args, jnp.zeros(())))
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for _ in range(6):
            acc = compiled(*call_args, acc)
        float(acc)
        dt = time.perf_counter() - t0
        fps = T * n_inner * 6 / dt
        print(f"steady state: {fps:.1f} fps", flush=True)

        os.system(f"rm -rf {trace_dir}")
        jax.profiler.start_trace(trace_dir)
        acc = jnp.zeros(())
        for _ in range(2):
            acc = compiled(*call_args, acc)
        float(acc)
        jax.profiler.stop_trace()

    fusions = parse_hlo_fusions(hlo)
    print(f"parsed {len(fusions)} fusions/convs from HLO "
          f"({sum(1 for v in fusions.values() if v['flops'])} with convs)",
          flush=True)
    agg, cnt = load_device_durations(trace_dir)

    # Only leaf ops count toward device time: container events (the outer
    # jit and the scan's while) execute once per OUTER call (count 2 in
    # this trace) while every leaf inside the 5-step scan executes >= 10x.
    max_cnt = max(cnt.values()) if cnt else 10
    execs = 10 if max_cnt >= 10 else max_cnt
    leaf = {k: v for k, v in agg.items()
            if cnt[k] >= execs and not k.startswith("jit_")}
    total_us = sum(leaf.values())

    HBM_TBPS = 0.819  # v5e HBM bandwidth, TB/s

    rows = []
    for name, us in leaf.items():
        info = fusions.get(name)
        cat = classify(name, info)
        if info and info.get("convs") and all(c["resample"] for c in info["convs"]):
            # scale_and_translate lowers to huge-window dilated convs whose
            # nominal FLOP count is fictitious — report as resample, no MFU.
            cat = "resample"
            info = dict(info, flops=0)
        flops = info["flops"] if info else 0
        n_exec = cnt[name]
        tflops = (flops * n_exec) / (us * 1e-6) / 1e12 if us > 0 else 0.0
        bound = ""
        if info and info.get("convs") and flops:
            # Per-fusion roofline: min(MXU peak, HBM bandwidth x intensity).
            # Conv operand/result bytes only (BN/residual inputs of the
            # fusion are not counted, so the memory bound is OPTIMISTIC).
            b = sum(c["bytes"] for c in info["convs"]) or 1
            mem_bound = HBM_TBPS * 1e12 * (flops / b) / 1e12
            bound = min(PEAK_TFLOPS, mem_bound)
        rows.append((us, name, cat, flops * n_exec, tflops, bound,
                     info["convs"][:2] if info else []))
    rows.sort(reverse=True)

    by_cat = defaultdict(float)
    for us, name, cat, *_ in rows:
        by_cat[cat] += us

    lines = ["# PROFILE — headline program per-op device trace (TPU v5e)\n"]
    lines.append(
        f"Trace: {execs} executions of the 256-frame block "
        f"(2 outer calls x 5-step scan), device total "
        f"{total_us / 1e3:.1f} ms -> {total_us / execs / 1e3:.2f} ms/block "
        f"= {256 * execs / (total_us * 1e-6):.0f} fps.\n")
    flops_block = ca.get("flops", 0.0) if ca else 7.497e12  # measured 08-17
    lines.append(
        f"XLA cost analysis (counts the scan body ONCE): "
        f"{flops_block:.4g} flops -> {flops_block / (T * 2):.4g} flops/crop "
        f"(T={T} frames x 2 cams).  NOTE the published 'HRNet-W32 = 7.1 "
        f"GFLOPs' figure counts multiply-accumulates; in mul-add=2 terms "
        f"(the convention of the 197 TFLOP/s v5e bf16 peak) the model is "
        f"~14.2 GFLOP/crop, so round 2's '19% MFU' understated by 2x.\n")
    lines.append("## Time by category\n")
    lines.append("| category | ms (all execs) | % |")
    lines.append("|---|---|---|")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {cat} | {us / 1e3:.1f} | {100 * us / total_us:.1f} |")
    shape_agg = defaultdict(lambda: [0.0, 0, 0.0])  # us, flops, best tflops
    for us, name, cat, fl, tf, bound, convs in rows:
        if cat == "conv" and convs:
            key = (convs[0]["kernel"], convs[0]["out"][1:])
            shape_agg[key][0] += us
            shape_agg[key][1] += fl
            shape_agg[key][2] = max(shape_agg[key][2], tf)
    lines.append("\n## Time by conv shape (where the chip's time goes)\n")
    lines.append("| kernel | out (HWC) | ms | % | avg TFLOP/s | best instance |")
    lines.append("|---|---|---|---|---|---|")
    for (kern, out_hwc), (us, fl, best) in sorted(
            shape_agg.items(), key=lambda kv: -kv[1][0]):
        avg = fl / (us * 1e-6) / 1e12 if us else 0.0
        lines.append(f"| {list(kern)} | {list(out_hwc)} | {us / 1e3:.1f} "
                     f"| {100 * us / total_us:.1f} | {avg:.1f} | {best:.1f} |")

    lines.append("\n## Top ops\n")
    lines.append("| op | ms | % | cat | TFLOP/s | roofline TFLOP/s (min MXU, HBM) | conv (out / kernel) |")
    lines.append("|---|---|---|---|---|---|---|")
    for us, name, cat, fl, tf, bound, convs in rows[:45]:
        cs = "; ".join(
            f"{list(c['out'])}/{list(c['kernel'])}" for c in convs
        )
        bs = f"{bound:.0f}" if bound else ""
        tfs = f"{tf:.1f}" if fl else ""
        lines.append(f"| `{name}` | {us / 1e3:.2f} | {100 * us / total_us:.1f} "
                     f"| {cat} | {tfs} | {bs} | {cs} |")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "PROFILE.md")
    # Keep hand-written appendix sections (e.g. the Swin trace) across
    # regenerations of the HRNet tables.
    appendix = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        marker = "<!-- appendix -->"
        if marker in prev:
            appendix = "\n" + prev[prev.index(marker):]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n" + appendix)
    print("wrote PROFILE.md")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat}: {us / 1e3:.1f} ms ({100 * us / total_us:.1f}%)")


if __name__ == "__main__":
    main()
