"""Measure the in-kernel texture cost curve on real TPU hardware.

Round-3 verdict: the in-kernel texture cap was set by a *linear-cost
argument* but only a 32^2 scene was ever timed on the chip.  This tool
times the whole curve — untextured, 32^2(+bump), 128^2, 256^2 — on the
megakernel AND the fused-plane XLA fallback, each case in its own
subprocess (a >~2 min single kernel execution trips the TPU worker
watchdog and wedges the process — the round-4 investigation found the
"planes fallback at full size" runs ~2.4 s/iter at 800x800 textured
and DIES at 50-spp calls; fresh processes keep one case's death from
poisoning the next).

Run on the chip:   python tools/tex_crossover.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import dataclasses as dc
import json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, {here!r})
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp
import pathtrace_tpu as pt
from pathtrace_tpu.ops.pallas import megakernel as mk

# lift the caps for the measurement itself: this tool is HOW the
# shipped caps get set, so it must be able to time past them
mk.KTEX_MAX_SIDE = 1 << 14
mk.KTEX_MAX_TEXELS = 1 << 30

side, bump, engine, spp = {side!r}, {bump!r}, {engine!r}, {spp!r}
if side == 0:
    scene = pt.load_scene(os.path.join({here!r}, "scenes", "cornell.txt"))
else:
    with open(os.path.join({here!r}, "scenes", "cornell_tex.txt")) as f:
        text = f.read()
    if side != 32:
        text = text.replace("tex/pattern32.png", f"tex/pattern{{side}}.png")
    if not bump:
        text = "\n".join(ln for ln in text.split("\n")
                         if not ln.startswith("BUMPTEX"))
    scene = pt.parse_scene(text, base_dir=os.path.join({here!r}, "scenes"))

if engine == "kernel":
    fn = lambda i, n: mk.pathtrace_batch_pallas(scene, i, n)
else:
    from pathtrace_tpu.render.plane_engine import pathtrace_batch_planes
    fn = lambda i, n: pathtrace_batch_planes(scene, i, n)

r, _ = fn(1, spp)
float(jnp.sum(r))
t0 = time.time()
r, _ = fn(1 + spp, spp)
s = float(jnp.sum(r))
print(json.dumps(dict(ms=(time.time() - t0) / spp * 1e3)))
"""


def run_case(side, bump, engine, spp, timeout=560):
    code = CHILD.format(here=HERE, side=side, bump=bump, engine=engine,
                        spp=spp)
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", code], capture_output=True,
            text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return None, "timeout"
    for line in out.stdout.splitlines()[::-1]:
        if line.startswith("{"):
            return json.loads(line)["ms"], None
    err = (out.stderr or "").strip().splitlines()
    return None, (err[-1][:120] if err else f"exit {out.returncode}")


def main() -> int:
    cases = [
        ("untextured", 0, False),
        ("32^2 albedo + 16^2 bump", 32, True),
        ("128^2 albedo", 128, False),
        ("128^2 albedo + 16^2 bump", 128, True),
        ("256^2 albedo", 256, False),
    ]
    rows = []
    for label, side, bump in cases:
        k_ms, k_err = run_case(side, bump, "kernel", 200)
        # planes: watchdog-safe spp (2.4 s/iter at 800^2 textured)
        p_ms, p_err = run_case(side, bump, "planes", 2)
        print(f"{label}: kernel "
              f"{f'{k_ms:.2f} ms' if k_ms else k_err} | planes "
              f"{f'{p_ms:.2f} ms' if p_ms else p_err}", flush=True)
        rows.append((label, k_ms or k_err, p_ms or p_err))

    print("\n| scene (cornell 800x800 d8) | megakernel ms/iter "
          "| planes ms/iter |")
    print("|---|---|---|")
    for label, k, p in rows:
        ks = f"{k:.2f}" if isinstance(k, float) else k
        ps = f"{p:.2f}" if isinstance(p, float) else p
        print(f"| {label} | {ks} | {ps} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
