"""Comm/compute overlap proof (VERDICT round-1 item 7).

Compiles the distributed matvec on an 8-virtual-device CPU mesh with
``overlap=True`` and ``overlap=False``, dumps the optimized HLO, and checks
whether the compress-direction ``collective-permute-start`` is issued with
real compute scheduled before the matching ``-done`` — i.e. whether XLA's
async-collective machinery can actually hide the ICI transfer behind the
interior apply (the TPU analog of ``cell_loop``'s unconditional overlap,
``poisson_operator.h:310,339``).

Writes the evidence (instruction windows around each start/done pair) to
tools/OVERLAP_HLO.txt.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mf_data_locality_tpu.parallel import distributed as dist  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "OVERLAP_HLO.txt")


def analyze(hlo: str, tag: str, report: list[str]) -> dict:
    """Structural overlap evidence from the optimized HLO.

    The CPU backend lowers ``ppermute`` to a *synchronous*
    ``collective-permute`` (no -start/-done pair), so the async window
    cannot be observed directly off-TPU.  What CAN be checked is the
    schedule structure: with ``overlap=True`` the compress-direction
    permute of the boundary partial must be issued BEFORE the interior
    apply's compute ops (data-independence exposed to the scheduler); with
    ``overlap=False`` it can only appear after all apply compute.  An
    async-collective backend (TPU) can hide a transfer exactly when it is
    scheduled ahead of independent compute.
    """
    lines = hlo.splitlines()
    # entry computation: after the last non-indented "ENTRY" marker
    entry = max((i for i, l in enumerate(lines) if l.startswith("ENTRY")),
                default=0)
    body = lines[entry:]
    perms = [i for i, l in enumerate(body) if "collective-permute" in l
             and "=" in l]
    compute = [i for i, l in enumerate(body)
               if re.search(r"= .*(fusion|dot\(|convolution)", l)]
    report.append(f"== {tag}: {len(perms)} collective-permute, "
                  f"{len(compute)} compute ops in entry schedule")
    if not perms or not compute:
        return {"compute_after_first_perm": 0}
    first = perms[0]
    after = [i for i in compute if i > first]
    report.append(f"  first permute at entry line {first}; "
                  f"{len(after)} compute ops scheduled after it")
    for i in after[:4]:
        report.append(f"      {body[i].strip()[:110]}")
    return {"compute_after_first_perm": len(after)}


def main() -> None:
    report = [f"# overlap HLO evidence (8 virtual CPU devices), "
              f"jax {jax.__version__}"]
    results = {}
    for overlap in (False, True):
        dp, mesh = dist.build_distributed(12, 1, n_devices=4,
                                          dtype=jnp.float32,
                                          backend="structured")
        fn = dist.dist_matvec_jit(dp, mesh, overlap=overlap)
        compiled = fn.lower(dp.op_stack, dp.b).compile()
        hlo = compiled.as_text()
        results[overlap] = analyze(hlo, f"overlap={overlap}", report)

    plain = results[False]["compute_after_first_perm"]
    over = results[True]["compute_after_first_perm"]
    ok = over > plain
    report.append("")
    report.append(
        f"VERDICT: overlap=True issues the compress permute with {over} "
        f"independent compute ops still scheduled after it (vs {plain} for "
        "overlap=False) -> the transfer is exposed early enough for an "
        "async-collective backend (TPU ICI) to hide it behind the interior "
        "apply." if ok else
        "VERDICT: overlap=True does NOT expose the permute earlier than "
        "the plain path — overlap not structurally effective.")
    report.append(
        "NOTE: the CPU backend lowers ppermute synchronously (no "
        "collective-permute-start/-done), so the async window itself is "
        "only observable on a real multi-chip TPU run.")
    with open(OUT, "w") as f:
        f.write("\n".join(report) + "\n")
    print("\n".join(report))


if __name__ == "__main__":
    main()
