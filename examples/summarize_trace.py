"""Generic per-op device-time summary for any jax.profiler trace dir.

`analyze_profile.py` joins the HEADLINE (HRNet conv) trace with its HLO
for per-conv rooflines; this script is the model-agnostic half — for the
Swin / RTMPose pipelines, where the hot ops are dots (window attention,
MLP) rather than convs, a category + top-op table is what locates the
time.  Run after `profile_headline.py --family swin`:

    python examples/summarize_trace.py /tmp/swin_trace
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyze_profile import load_device_durations  # noqa: E402


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "pallas" in n:
        return "pallas/custom"
    if "conv" in n:
        return "conv"
    if "dot" in n or "gemm" in n or "einsum" in n:
        return "dot"
    if any(k in n for k in ("softmax", "exponential", "divide")):
        return "softmax-ish"
    if any(k in n for k in ("transpose", "copy", "reshape", "bitcast",
                            "concatenate", "slice", "pad", "roll",
                            "dynamic-update")):
        return "layout"
    if "reduce" in n:
        return "reduce"
    if "while" in n or "scan" in n:
        return "control"
    return "elementwise/other"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/swin_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    agg, cnt = load_device_durations(trace_dir)
    total = sum(agg.values())
    by_cat = {}
    for name, us in agg.items():
        by_cat[classify(name)] = by_cat.get(classify(name), 0.0) + us
    print(f"device total: {total / 1e3:.1f} ms\n")
    print("| category | ms | % |")
    print("|---|---|---|")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"| {cat} | {us / 1e3:.1f} | {100 * us / total:.1f} |")
    print(f"\n| op (top {top_n}) | ms | % | n | cat |")
    print("|---|---|---|---|---|")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"| `{name}` | {us / 1e3:.2f} | {100 * us / total:.1f} "
              f"| {cnt[name]} | {classify(name)} |")


if __name__ == "__main__":
    main()
