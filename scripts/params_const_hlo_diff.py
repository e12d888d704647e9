"""What does XLA fold when params are compile-time constants?

Lowers the headline LJ13 exact-trace solve twice — params as a runtime
argument (production form) vs as jit-closure constants (the r1/r2 bench
form, +2.8% steady-state) — and diffs the compiled executables'
`cost_analysis()` FLOP counts and HLO instruction histograms.  If the
constant form shows materially fewer runtime FLOPs, the folded subgraph
is weight-dependent stage-invariant work that could in principle be
hoisted per-solve in the argument form; if FLOPs match, the gain is
layout/fusion specialization that cannot be recovered generically.
"""
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ecnf_tpu.utils.host_trace import ensure_host_cpu_backend, host_tracing

ensure_host_cpu_backend()

import jax
import jax.numpy as jnp

from ecnf_tpu.cnf.build import build_cnf
from ecnf_tpu.cnf.sampling import SolveConfig, sample_and_log_prob_cnf

B = 48

cnf = build_cnf(
    n_frames=13, dim=3, sigma_min=0.01, base_scale=1.0, n_blocks_egnn=3,
    mlp_units=(128, 128, 128), n_invariant_feat_hidden=64,
    time_embedding_dim=8, n_features=1, compute_dtype="bfloat16",
)
cfg = SolveConfig(use_fixed_step_size=True, step_size=0.05,
                  structured_tangent=True, method="rk4")
with host_tracing():
    feats = jnp.zeros((B, 13), dtype=jnp.int32)
    params = cnf.init(jax.random.PRNGKey(0), jnp.zeros((2, 39)),
                      jnp.zeros(2), feats[:2])


def solve(p, key):
    return sample_and_log_prob_cnf(
        cnf, p, key, B, features=feats, approx=False, cfg=cfg
    )


def histogram(compiled):
    ops = Counter()
    for line in compiled.as_text().splitlines():
        line = line.strip()
        if "=" in line and not line.startswith(("HloModule", "ENTRY", "}", "ROOT")):
            rhs = line.split("=", 1)[1].strip()
            # op name is the token after the type, e.g. "f32[48,39]{1,0} dot(..."
            for tok in rhs.split():
                if "(" in tok:
                    ops[tok.split("(")[0].split(".")[0]] += 1
                    break
    return ops


results = {}
for form in ("arg", "const"):
    if form == "arg":
        fn = jax.jit(solve)
        with host_tracing():
            compiled = fn.lower(params, jax.random.PRNGKey(1)).compile()
    else:
        fn = jax.jit(lambda key: solve(params, key))
        with host_tracing():
            compiled = fn.lower(jax.random.PRNGKey(1)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    hist = histogram(compiled)
    results[form] = (ca, hist)
    print(f"[{form}] flops={ca.get('flops', float('nan')):.3e} "
          f"bytes accessed={ca.get('bytes accessed', float('nan')):.3e} "
          f"transcendentals={ca.get('transcendentals', 0):.2e}", flush=True)

ca_a, h_a = results["arg"]
ca_c, h_c = results["const"]
print(f"\nflops const/arg ratio: {ca_c.get('flops', 0) / max(ca_a.get('flops', 1), 1):.4f}")
print("\nHLO op-count diffs (const - arg), |diff| >= 2:")
for op in sorted(set(h_a) | set(h_c)):
    d = h_c.get(op, 0) - h_a.get(op, 0)
    if abs(d) >= 2:
        print(f"  {op:24s} arg={h_a.get(op, 0):5d} const={h_c.get(op, 0):5d} ({d:+d})")
