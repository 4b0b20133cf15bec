"""Probe: device TEA key-search throughput (fleet bruteforce rate).

The reference tries ~34 built-in + user keys per encrypted frame in a
Python loop (tetraear/core/decoder.py:576-833).  crypto/batch.py runs
the whole keys x frames product as one jitted program; this measures
the sustained rate in (key, frame) decrypt+score trials per second at
a fleet-scale batch, scan-chained with a dependent fetch (CLAUDE.md
rule 5b).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/crypto_probe.py
Env: PERF_KEYS (64), PERF_FRAMES (4096), PERF_LEN (16 bytes),
     PERF_STEPS (8), PERF_TIMEOUT_S (1200).
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "1200"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from tetraear_tpu.crypto import batch as cbatch

    k = int(os.environ.get("PERF_KEYS", "64"))
    b = int(os.environ.get("PERF_FRAMES", "4096"))
    length = int(os.environ.get("PERF_LEN", "16"))
    steps = int(os.environ.get("PERF_STEPS", "8"))
    rng = np.random.default_rng(0)

    results = {"keys": k, "frames": b, "len": length, "steps": steps}
    for alg, key_len in (("TEA1", 10), ("TEA2", 16)):
        kw = (cbatch._keys_to_words_tea1 if alg == "TEA1"
              else cbatch._keys_to_words_tea2)(
            rng.integers(0, 256, (k, key_len), dtype=np.uint8))
        v0, v1 = cbatch._payload_to_words(
            rng.integers(0, 256, (b, length), dtype=np.uint8))
        v0, v1, kwj = (jnp.asarray(v0), jnp.asarray(v1),
                       jnp.asarray(kw))

        def chain(v0, v1, kwj, n, _alg=alg):
            def body(carry, _):
                s, bk, bs, _p = cbatch._search_impl(
                    v0 + carry, v1, kwj, algorithm=_alg)
                return bk[0].astype(jnp.uint32), bs[0]
            c, tails = jax.lax.scan(body, jnp.uint32(0), None, length=n)
            return tails

        cj = jax.jit(chain, static_argnums=3)
        out = cj(v0, v1, kwj, steps)
        float(np.asarray(out)[-1])
        t0 = time.time()
        out = cj(v0, v1, kwj, steps)
        float(np.asarray(out)[-1])
        dt = (time.time() - t0) / steps
        trials = k * b / dt
        results[alg] = {
            "ms_per_batch": round(dt * 1e3, 2),
            "trials_per_s": round(trials),
            # an encrypted frame tried against the reference's ~34-key
            # ring: frames/s the fleet can clear
            "frames_per_s_at_34_keys": round(trials / 34),
        }
        print(f"{alg}: {dt * 1e3:.2f} ms per {k}x{b} batch = "
              f"{trials / 1e6:.1f}M trials/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
