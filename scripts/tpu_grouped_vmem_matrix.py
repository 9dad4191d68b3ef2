#!/usr/bin/env python
"""Empirical compile-envelope matrix for pallas_ivf_probe_grouped.

The grouped kernel's scoped-VMEM footprint defied analytic modeling twice
(observed: IP/bin_m=10/w_pad=2528 compiles under 48 MB, while L2's epilogue
at the same bin_m needs 118-126 MB): this script .lower().compile()s the
kernel across (metric, w_pad, bin_m) and prints which combos fit, so the
dispatch guard in ivf.py is set from data instead of a size formula.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from usearch_tpu.enums import MetricKind
from usearch_tpu.ops.pallas_probe import pallas_ivf_probe_grouped

CAP2 = 65536
G = 128
P_TOTAL = 1024
K = 10

table = jnp.zeros((CAP2, 128), jnp.int8)
q_g = jnp.zeros((P_TOTAL, 128), jnp.int8)
q_aux = jnp.zeros((P_TOTAL, 8), jnp.float32)
meta = jnp.zeros((P_TOTAL // G, 8, G), jnp.int32)

for metric, aux_rows in ((MetricKind.IP, 1), (MetricKind.L2sq, 4)):
    t_aux = jnp.zeros((aux_rows, CAP2), jnp.float32)
    for w_pad in (1792, 2560, 4352):
        for bin_m in (4, 10):
            t0 = time.time()
            try:
                fn = jax.jit(
                    lambda qg, qa, tb, ta, mt: pallas_ivf_probe_grouped(
                        metric, qg, qa, tb, ta, mt, K, w_pad, G, bin_m
                    )
                )
                fn.lower(q_g, q_aux, table, t_aux, meta).compile()
                verdict = "OK"
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                i = msg.find("Scoped allocation with size")
                verdict = "FAIL " + (msg[i : i + 60] if i >= 0 else msg[:100])
            print(
                f"{metric.name:5s} w_pad={w_pad:5d} bin_m={bin_m:2d}: "
                f"{verdict}  ({time.time()-t0:.0f}s)",
                flush=True,
            )
