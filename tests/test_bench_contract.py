"""The driver-contract surfaces: bench.py prints one valid JSON metric
line; __graft_entry__ compiles and dry-runs."""

import json
import os
import subprocess
import sys


def test_bench_smoke_json():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PRISIM_BENCH_NCHAN="32",
               PRISIM_BENCH_NSIDE="8", PRISIM_BENCH_REPEATS="1",
               PRISIM_BENCH_CPU_NSRC="64", PRISIM_BENCH_CPU_NCHAN="8",
               PRISIM_BENCH_DISABLE_PALLAS="1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=root, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["unit"] == "MAC/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    assert rec["detail"]["kernel"] in ("xla", "pallas", "banded")


def test_graft_entry_contract():
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (171, 128)
    g.dryrun_multichip(8)
