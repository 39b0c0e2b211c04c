"""Round-5 part E2: jtj cofactor form — remaining twostage degrees.

PROBE_R5_COFACTOR (inner=50 rerun) measured the jtj candidate
(G = w adj(J^T J) rsqrt(det C), mathematically identical to the adjugate
chain, iteration-histories in class at both convergent points):

  p=2 dense    neutral (-3% min, +4% median)
  p=4 twostage LOSES  (+18% min, +8% median, 4/5 rounds)
  p=6 twostage WINS   (-10% min, -11% median, 4/5 rounds)
  p=9 twostage leans jtj (-16% min, -1.5% median split2m; -7%/-4% bf16)

Before encoding a per-degree dispatch, this probe A/Bs base-vs-jtj at the
UNMEASURED twostage degrees p=5, 7, 8, 10, 11 (split2m, ladder max) plus a
p=9 tiebreak, 6 interleaved rounds, inner=50 slopes.  Reports min AND
median per arm (the min-of-noisy-slopes estimator biases toward the
luckiest round; agreement between the two is the decision bar).

Run: setsid python tools/probe_r5_jtj2.py < /dev/null > tools/PROBE_R5_JTJ2.log 2>&1 &
Artifact: tools/PROBE_R5_JTJ2.txt
"""

from __future__ import annotations

import os
import statistics
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/root/repo/tools/PROBE_R5_JTJ2.txt"


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mf_data_locality_tpu.utils import timing
    from tools.probe_r5_dots import make_step

    bw = timing.measure_hbm_bandwidth()
    lat0 = timing.round_trip_latency()
    log(f"# jtj remaining twostage degrees  backend={jax.default_backend()}  "
        f"bw={bw/1e9:.0f} GB/s  latency={lat0*1e3:.1f} ms")

    pts = [("split2m", 5, 12), ("split2m", 7, 11), ("split2m", 8, 11),
           ("split2m", 9, 10), ("split2m", 10, 10), ("split2m", 11, 10)]
    FORMS = [("base", ()), ("jtj", ("jtj",))]
    arms = {}
    for prec, p, s in pts:
        try:
            built = {}
            for fname, abl in FORMS:
                step, st, factor, metric = make_step(p, s, prec, abl)
                built[fname] = (step, st)
            if metric != "onthefly":
                log(f"# point {prec} p={p} s={s}: resolves to {metric}, "
                    f"SKIPPED")
                continue
            arms[(prec, p, s)] = built
            log(f"# point {prec} p={p} s={s}: factor={factor} "
                f"metric={metric}")
        except Exception:
            log(f"# point {prec} p={p} s={s}: build FAILED")
            log(traceback.format_exc())

    samples = {}
    for rnd in range(6):
        for key, built in arms.items():
            prec, p, s = key
            row = []
            for fname, _ in FORMS:
                step, st = built[fname]
                t = timing.time_scan_fetch(step, st, inner=50, repeats=3)
                samples.setdefault(key, {}).setdefault(fname, []).append(t)
                row.append(f"{fname} {t*1e6:7.1f}")
            log(f"  round {rnd}  {prec:8s} p={p} s={s}  " + "  ".join(row))
    log("# per-arm min / median (jtj % vs base, same statistic):")
    for (prec, p, s), by in samples.items():
        b, j = by["base"], by["jtj"]
        bm, jm = min(b), min(j)
        bd, jd = statistics.median(b), statistics.median(j)
        log(f"  {prec:8s} p={p} s={s}: base min {bm*1e6:7.1f} med "
            f"{bd*1e6:7.1f}   jtj min {jm*1e6:7.1f} ({(jm/bm-1)*100:+5.1f}%) "
            f"med {jd*1e6:7.1f} ({(jd/bd-1)*100:+5.1f}%)")

    ok, cached, fresh = timing.latency_recheck()
    log(f"# latency recheck: {'ok' if ok else 'REJECTED (host not idle)'} "
        f"{cached*1e3:.1f} -> {fresh*1e3:.1f} ms")


if __name__ == "__main__":
    main()
