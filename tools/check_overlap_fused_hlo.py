"""Comm/compute overlap evidence for the FUSED distributed solver
(VERDICT round-2 item 3).

Compiles ``dist_fused.solve_fused`` on an 8-virtual-device CPU mesh with
``overlap=False`` and ``overlap=True`` and inspects the CG while-loop body
in the optimized HLO.  The CPU backend lowers ``ppermute`` synchronously,
so the async window itself is TPU-only; what this checks is the *schedule
structure*: the number of compute ops scheduled between the halo
collective-permute and its first consumer.  With ``overlap=False`` the
(single) fused kernel consumes the halo immediately; with ``overlap=True``
the entire interior kernel call is data-independent of the halo and sits
in between — exactly the window an async-collective backend (TPU ICI)
uses to hide the transfer (the reference's pre/post-ghost range overlap,
``poisson_operator.h:339-364``).

Writes the evidence to tools/OVERLAP_FUSED_HLO.txt.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from mf_data_locality_tpu.parallel import dist_fused  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "OVERLAP_FUSED_HLO.txt")

COMPUTE = re.compile(r"= .*(fusion|dot\(|while\(|convolution|custom-call)")


def loop_body(hlo: str) -> list[str]:
    """The CG while-loop body: the computation with both a
    collective-permute and an all-reduce (the 7-scalar psum)."""
    comps: dict[str, list[str]] = {}
    name = None
    for line in hlo.splitlines():
        if line.startswith(("%", "ENTRY")) and "{" in line:
            name = line.split()[0].lstrip("%")
            comps[name] = []
        elif name is not None:
            comps[name].append(line)
    cands = [(n, ls) for n, ls in comps.items()
             if any("collective-permute" in l for l in ls)
             and any("all-reduce" in l for l in ls)]
    if not cands:
        raise SystemExit("no while-body with permute+allreduce found")
    # the solver body is the largest such computation
    return max(cands, key=lambda c: len(c[1]))[1]


def analyze(tag: str, overlap: bool, report: list[str]) -> int:
    # s=9 -> ncz = 2^(9//3) = 8 global z-cell layers, 4 per device:
    # 3 interior grid steps + 1 boundary step.  (With only 1 interior
    # step XLA canonicalizes the split and unsplit programs to literally
    # identical HLO — semantically reassuring, but no schedule evidence.)
    dp, mesh = dist_fused.build_dist_fused(9, 2, n_devices=2,
                                           dtype=jnp.float64)
    fn = jax.jit(lambda dp_=dp: dist_fused.solve_fused(
        dp_, mesh, overlap=overlap))
    hlo = fn.lower().compile().as_text()
    body = loop_body(hlo)

    # halo permutes: collective-permutes NOT fed (transitively, one hop)
    # by the kernel outputs — structurally, the ones defined before any
    # compute consumes them.  Identify each permute and its first consumer.
    windows = []
    for i, line in enumerate(body):
        m = re.match(r"\s*(%\S+) = .*collective-permute", line)
        if not m:
            continue
        name = m.group(1)
        consumer = next((j for j in range(i + 1, len(body))
                         if name + "," in body[j] or name + ")" in body[j]),
                        len(body))
        n_compute = sum(1 for j in range(i + 1, consumer)
                        if COMPUTE.search(body[j]))
        windows.append((name, i, consumer, n_compute))
    report.append(f"== overlap={overlap}: {len(windows)} collective-permutes "
                  f"in the CG loop body ({len(body)} instructions)")
    best = 0
    for name, i, c, n in windows:
        report.append(f"  {name}: issued at line {i}, first consumer at "
                      f"line {c}, {n} compute ops in between")
        best = max(best, n)
    return best


def main():
    report = [f"# fused-solver overlap HLO evidence "
              f"(8 virtual CPU devices), jax {jax.__version__}",
              "# p=2 s=9 D=2 (4 z-layers/device: 3 interior + 1 boundary)"]
    base = analyze("off", False, report)
    over = analyze("on", True, report)
    verdict = (
        f"VERDICT: overlap=True exposes {over} compute ops between the halo "
        f"permute and its first consumer (vs {base} for overlap=False) -> "
        "the interior kernel call is data-independent of the halo transfer, "
        "so an async-collective backend (TPU ICI) can hide it; with "
        "overlap=False the single fused kernel consumes the halo "
        "immediately." if over > base else
        f"VERDICT: NO structural improvement (overlap {over} vs base {base})")
    report.append(verdict)
    report.append("NOTE: the CPU backend lowers ppermute synchronously (no "
                  "-start/-done pair); the async window itself is only "
                  "observable on a real multi-chip TPU run.")
    with open(OUT, "w") as f:
        f.write("\n".join(report) + "\n")
    print("\n".join(report))


if __name__ == "__main__":
    main()
